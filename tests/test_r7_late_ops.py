"""Unit tests for the late round-7 operators: SQ8 coarse-scan + exact
re-rank ANN, held-out trigram stupid-backoff perplexity, and two-phase
threshold-pruned heavy hitters. Each is checked against a hand-computed
reference on a tiny constructed corpus (the sf0.01 oracle gate covers the
full-corpus path)."""

import math
import os

import pytest
import pyspark.sql.functions as F


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )


def _write_docs(spark, tmp_path, rows):
    """Materialize a documents.parquet the registry entries can load."""
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    return sf_dir


class TestSQ8Rerank:
    def test_full_coarse_equals_bruteforce(self, spark):
        """With coarse_k >= |corpus| the coarse cut drops nothing, so the
        exact re-rank must reproduce brute force bit-for-bit."""
        from paimon_presto_spark.operators.similarity import (
            brute_force_topk,
            sq8_rerank_topk,
        )

        import numpy as np

        rng = np.random.default_rng(11)
        rows = [
            (i, rng.standard_normal(8).round(4).tolist(), "x")
            for i in range(30)
        ]
        corpus = _vecs(spark, [r for r in rows if r[0] >= 3])
        queries = _vecs(spark, [r for r in rows if r[0] < 3])
        got = {
            (r["q_id"], r["rnk"]): (r["n_id"], r["cos_sim"])
            for r in sq8_rerank_topk(
                corpus, queries, k=5, coarse_k=100
            ).collect()
        }
        ref = {
            (r["q_id"], r["rnk"]): (r["n_id"], round(r["cos_sim"], 6))
            for r in brute_force_topk(corpus, queries, k=5).collect()
        }
        assert got == ref

    def test_codes_are_scale_free(self, spark):
        """Symmetric max-abs quantization encodes direction only: scaling
        a corpus vector by any positive constant changes neither int_dot
        nor the final ranking."""
        from paimon_presto_spark.operators.similarity import sq8_rerank_topk

        base = [
            (0, [1.0, 0.5, -0.25, 0.125], "q"),
            (10, [0.5, 1.0, 0.25, -0.125], "c"),
            (11, [1.0, 0.4, -0.3, 0.2], "c"),
        ]
        scaled = [
            (i, [x * (3.0 if i >= 10 else 1.0) for x in v], lb)
            for i, v, lb in base
        ]

        def run(rows):
            c = _vecs(spark, [r for r in rows if r[0] >= 10])
            q = _vecs(spark, [r for r in rows if r[0] < 10])
            return [
                (r["q_id"], r["n_id"], r["int_dot"], r["cos_sim"], r["rnk"])
                for r in sq8_rerank_topk(c, q, k=2, coarse_k=2)
                .orderBy("q_id", "rnk")
                .collect()
            ]

        assert run(base) == run(scaled)

    def test_zero_vector_dropped(self, spark):
        from paimon_presto_spark.operators.similarity import sq8_rerank_topk

        corpus = _vecs(
            spark,
            [(10, [0.0, 0.0], "c"), (11, [1.0, 0.5], "c")],
        )
        queries = _vecs(spark, [(0, [1.0, 0.0], "q")])
        out = sq8_rerank_topk(corpus, queries, k=5, coarse_k=5).collect()
        assert [r["n_id"] for r in out] == [11]

    def test_coarse_cut_uses_integer_dot(self, spark):
        """The coarse stage must cut strictly by int_dot: with coarse_k=1
        the candidate with the larger INTEGER code dot survives even when
        the other has the (slightly) larger true cosine."""
        from paimon_presto_spark.operators.similarity import sq8_rerank_topk

        # q codes = [127, 64]; n10 codes = [127, 63] (int_dot 16129+4032);
        # n11 = [127, 127] -> int_dot 16129 + 8128 wins coarse, though its
        # cosine vs q is lower than n10's.
        queries = _vecs(spark, [(0, [1.0, 0.5], "q")])
        corpus = _vecs(
            spark,
            [(10, [1.0, 0.496], "c"), (11, [1.0, 1.0], "c")],
        )
        out = sq8_rerank_topk(corpus, queries, k=1, coarse_k=1).collect()
        assert [r["n_id"] for r in out] == [11]


class TestTrigramBackoff:
    def test_backoff_arms_match_hand_computation(self, spark, tmp_path):
        """One eval doc exercising all three arms: seen trigram (MLE
        ratio), unseen trigram / seen bigram (0.4 discount), and unseen
        bigram (0.4^2 smoothed unigram base)."""
        from paimon_presto_spark.queries.curation import text_trigram_backoff

        sf_dir = _write_docs(
            spark,
            tmp_path,
            [
                (0, "a b c d", "en", "s", 7),  # train (even doc_id)
                (1, "a b c x b c d", "en", "s", 13),  # eval (odd, < 80)
            ],
        )
        out = text_trigram_backoff(spark, sf_dir).collect()
        assert len(out) == 1
        row = out[0]
        assert row["doc_id"] == 1 and row["n_trigrams"] == 5
        # train stats: trigrams {abc:1, bcd:1}; ctx12 {ab:1, bc:1};
        # bigrams {ab:1, bc:1, cd:1}; ctx1 {a:1, b:1, c:1}; unigrams all 1,
        # N=4, V=4.
        probs = [
            1.0 / 1.0,                      # (a,b,c) seen trigram
            0.4 * 0.4 * ((0 + 0.5) / 6.0),  # (b,c,x): 'cx' unseen bigram
            0.4 * 0.4 * ((1 + 0.5) / 6.0),  # (c,x,b): 'xb' unseen bigram
            0.4 * (1.0 / 1.0),              # (x,b,c): bigram 'bc' seen
            1.0 / 1.0,                      # (b,c,d) seen trigram
        ]
        # each ln passes through DECIMAL(28,10) before the sum
        lp = sum(round(math.log(p), 10) for p in probs)
        assert row["logprob_sum"] == pytest.approx(lp, abs=1e-9)
        assert row["perplexity"] == pytest.approx(
            math.exp(-lp / 5), abs=1e-5
        )

    def test_train_docs_never_scored(self, spark, tmp_path):
        from paimon_presto_spark.queries.curation import text_trigram_backoff

        sf_dir = _write_docs(
            spark,
            tmp_path,
            [
                (0, "a b c d e", "en", "s", 9),
                (2, "a b c", "en", "s", 5),
                (81, "a b c d", "en", "s", 7),  # odd but >= 80: excluded
                (3, "a b c", "en", "s", 5),
            ],
        )
        out = text_trigram_backoff(spark, sf_dir).collect()
        assert [r["doc_id"] for r in out] == [3]

    def test_scrambled_doc_scores_higher_perplexity(self, spark, tmp_path):
        """Word order counts: an eval doc matching training order beats
        the same tokens shuffled."""
        from paimon_presto_spark.queries.curation import text_trigram_backoff

        phrase = "the quick brown fox jumps over the lazy dog"
        sf_dir = _write_docs(
            spark,
            tmp_path,
            [
                (0, phrase, "en", "s", len(phrase)),
                (2, phrase, "en", "s", len(phrase)),
                (1, phrase, "en", "s", len(phrase)),
                (3, "dog the lazy fox brown jumps quick over the", "en",
                 "s", len(phrase)),
            ],
        )
        got = {
            r["doc_id"]: r["perplexity"]
            for r in text_trigram_backoff(spark, sf_dir).collect()
        }
        assert got[1] < got[3]


class TestHeavyHitters:
    def test_matches_naive_group_by(self, spark, tmp_path):
        """The pigeonhole prune + recount must equal the naive GROUP BY:
        tokens straddling the threshold (49/50/51 occurrences) land on
        the right side, and counts are exact across salt buckets."""
        from paimon_presto_spark.queries.curation import text_heavy_hitters

        # spread each token's occurrences over many doc_ids (= many salts)
        words = {"hot": 120, "warm": 51, "edge": 50, "cold": 49, "rare": 3}
        docs, i = [], 0
        for wd, n in words.items():
            for chunk in range(0, n, 7):
                text = " ".join([wd] * min(7, n - chunk))
                docs.append((i, text, "en", "s", len(text)))
                i += 1
        sf_dir = _write_docs(spark, tmp_path, docs)
        out = text_heavy_hitters(spark, sf_dir).collect()
        total = sum(words.values())
        got = {r["wd"]: (r["cnt"], r["share"]) for r in out}
        assert set(got) == {"hot", "warm", "edge"}
        for wd in got:
            assert got[wd][0] == words[wd]
            assert got[wd][1] == round(words[wd] / total, 6)
        # ordered by count desc
        assert [r["wd"] for r in out] == ["hot", "warm", "edge"]

    def test_relative_threshold_kicks_in(self, spark, tmp_path):
        """Above 100k tokens the threshold becomes N // 2000, not 50."""
        from paimon_presto_spark.queries.curation import text_heavy_hitters

        # 3000 filler docs (each a doc-unique token repeated 40x), one
        # 70-count token, one 55-count probe: N = 120125, so the relative
        # threshold N // 2000 = 60 governs — the probe (55 >= the fixed
        # floor of 50) must still be rejected, proving the 60 bound.
        docs = [
            (i, " ".join([f"w{i}"] * 40), "en", "s", 10) for i in range(3000)
        ]
        docs.append((3000, " ".join(["big"] * 70), "en", "s", 10))
        docs.append((3001, " ".join(["mid"] * 55), "en", "s", 10))
        sf_dir = _write_docs(spark, tmp_path, docs)
        out = text_heavy_hitters(spark, sf_dir).collect()
        # N = 3000*40 + 70 + 55 = 120125 -> threshold = 120125 // 2000 = 60
        assert [r["wd"] for r in out] == ["big"]
        assert out[0]["cnt"] == 70


class TestSessionWindowBoundary:
    def test_exact_gap_merges_strict_greater_splits(self, spark):
        """Pins the boundary rule streaming_batch_parity_session's oracle
        depends on: Spark's session_window MERGES events spaced exactly
        one gap apart and splits only when the delta is strictly
        greater."""

        def n_sessions(t2):
            df = spark.createDataFrame(
                [(1, 0), (1, t2)], "u int, t long"
            ).select("u", F.timestamp_seconds("t").alias("ts"))
            return len(
                df.groupBy(F.session_window("ts", "1800 seconds"), "u")
                .count()
                .collect()
            )

        assert n_sessions(1800) == 1  # delta == gap -> one session
        assert n_sessions(1801) == 2  # delta > gap -> split


class TestMultimodalEntries:
    def test_image_pipeline_matches_python_reference(self, spark, tmp_path):
        """Decode -> 4x4 nearest resize -> re-decode must reproduce the
        closed-form pixel formula through the real codec stack."""
        from paimon_presto_spark.queries.multimodal_entries import (
            multimodal_image_pipeline,
        )

        docs = [(i, "x", "en", "s", 1) for i in (0, 3, 7)]
        sf_dir = _write_docs(spark, tmp_path, docs)
        got = {
            r["doc_id"]: (
                r["width"], r["height"], r["n_bytes_in"],
                r["n_bytes_out"], r["r_sum"],
            )
            for r in multimodal_image_pipeline(spark, sf_dir).collect()
        }

        def ref(did):
            w, h = 8 + did % 5, 6 + did % 4
            rs = 0
            for y in range(4):
                sy = min(y * h // 4, h - 1)
                for x in range(4):
                    sx = min(x * w // 4, w - 1)
                    rs += (did * 31 + sy * 7 + sx * 13) % 256
            nbi = len(b"P6\n%d %d\n255\n" % (w, h)) + w * h * 3
            return (w, h, nbi, 59, rs)

        assert got == {i: ref(i) for i in (0, 3, 7)}

    def test_audio_features_match_python_reference(self, spark, tmp_path):
        from paimon_presto_spark.queries.multimodal_entries import (
            multimodal_audio_features,
        )

        docs = [(i, "x", "en", "s", 1) for i in (1, 5)]
        sf_dir = _write_docs(spark, tmp_path, docs)
        got = {
            r["doc_id"]: (
                r["sample_rate"], r["n_channels"], r["n_samples"],
                r["duration_ms"], r["rms"],
            )
            for r in multimodal_audio_features(spark, sf_dir).collect()
        }
        for did in (1, 5):
            n = 64 + did % 32
            vals = [((did * 37 + i * 11) % 2048) - 1024 for i in range(n)]
            rms = math.sqrt(sum(v * v for v in vals) / n)
            row = got[did]
            assert row[:4] == (8000, 1, n, int(n * 1000 / 8000))
            assert row[4] == pytest.approx(rms, abs=1e-6)

    def test_frame_sample_fanout_and_digest(self, spark, tmp_path):
        """1->N frame explode: max(1, dur//1000) frames per doc, each a
        16-byte payload slice at offset i % len."""
        import hashlib

        from paimon_presto_spark.queries.multimodal_entries import (
            multimodal_frame_sample,
        )

        text = "abcdefghijklmnopqrstuvwxyz0123456789"
        docs = [(0, text, "en", "s", 36), (6, text, "en", "s", 36)]
        sf_dir = _write_docs(spark, tmp_path, docs)
        out = multimodal_frame_sample(spark, sf_dir).collect()
        # doc 0: dur = 1750 -> 1 frame; doc 6: dur = 3500 -> 3 frames
        assert [(r["doc_id"], r["frame_idx"]) for r in out] == [
            (0, 0), (6, 0), (6, 1), (6, 2)
        ]
        for r in out:
            off = r["frame_idx"] % len(text)
            frame = text.encode()[off:][:16]
            assert r["frame_ts_ms"] == r["frame_idx"] * 1000
            assert r["frame_len"] == len(frame)
            assert r["frame_digest"] == hashlib.md5(frame).hexdigest()


class TestPageRank:
    def test_matches_python_power_iteration(self, spark, tmp_path):
        """3 unrolled iterations must equal a plain-Python power iteration
        with the same decimal squeeze, and total rank must stay ~1."""
        from paimon_presto_spark.queries.curation import (
            PR_ITERS,
            graph_pagerank_tokens,
        )

        docs = [
            (0, "a b a c", "en", "s", 7),
            (1, "b c b a", "en", "s", 7),
            (2, "c a", "en", "s", 3),
        ]
        sf_dir = _write_docs(spark, tmp_path, docs)
        got = {
            r["token"]: r["pagerank"]
            for r in graph_pagerank_tokens(spark, sf_dir).collect()
        }

        # edges: bigrams of all docs
        from collections import Counter

        edges = Counter()
        for _, text, *_ in docs:
            tk = text.split(" ")
            for i in range(len(tk) - 1):
                edges[(tk[i], tk[i + 1])] += 1
        out = Counter()
        for (w1, _), c in edges.items():
            out[w1] += c
        nodes = sorted({w for e in edges for w in e})
        n = len(nodes)

        def sq(x):
            return float(f"{x:.10f}")

        pr = {w: sq(1.0 / n) for w in nodes}
        for _ in range(PR_ITERS):
            dang = sq(sum(round(pr[w], 10) for w in nodes if w not in out))
            contrib = {}
            for (w1, w2), c in edges.items():
                contrib[w2] = contrib.get(w2, 0) + round(
                    pr[w1] * (c / out[w1]), 10
                )
            pr = {
                w: sq(0.15 / n + 0.85 * (sq(contrib.get(w, 0)) + dang / n))
                for w in nodes
            }
        assert got == {w: round(pr[w], 6) for w in nodes}
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-3)


class TestSQ8Stored:
    def test_stored_probe_equals_inline_rerank(self, spark, tmp_path):
        """Probing a persisted codes table + id-joined refine must equal
        the inline two-stage pipeline row for row."""
        import numpy as np

        from paimon_presto_spark.operators.similarity import (
            sq8_codes,
            sq8_probe_topk,
            sq8_rerank_topk,
        )

        rng = np.random.default_rng(23)
        rows = [
            (i, rng.standard_normal(8).round(4).tolist(), "x")
            for i in range(25)
        ]
        df = _vecs(spark, rows)
        corpus = df.filter("vec_id >= 3")
        queries = df.filter("vec_id < 3")
        path = str(tmp_path / "codes")
        sq8_codes(corpus).write.parquet(path)
        stored = sq8_probe_topk(
            spark.read.parquet(path), corpus, queries, k=4, coarse_k=8
        )
        inline = sq8_rerank_topk(corpus, queries, k=4, coarse_k=8)
        assert sorted(map(tuple, stored.collect()), key=lambda t: (t[0], t[4])) \
            == sorted(map(tuple, inline.collect()), key=lambda t: (t[0], t[4]))
