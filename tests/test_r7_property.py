"""Hypothesis property tests for the late round-7 operators: each is
pinned against a pure-Python reference implementing the exact same
arithmetic (including the decimal squeezes) on randomized small inputs,
so the equivalences hold by construction, not by fixture luck."""

import math
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["merge", "scan", "sort", "join", "shuffle", "spill", "page"]

_corpus = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8),
    min_size=1,
    max_size=6,
)


def _docs_df(spark, tmpdir, token_lists):
    sf_dir = str(tmpdir)
    rows = [
        (i, " ".join(ws), "en", "s", len(" ".join(ws)))
        for i, ws in enumerate(token_lists)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    return sf_dir


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus)
def test_heavy_hitters_equals_naive_group_by(spark, tmp_path_factory, corpus):
    """Pigeonhole prune + recount == naive GROUP BY ... HAVING, for any
    corpus (the fixed 50-count floor governs at these sizes, so inflate
    one word's count across the threshold in about half the examples)."""
    from paimon_presto_spark.queries.curation import (
        HH_MIN_COUNT,
        HH_SHARE_DIV,
        text_heavy_hitters,
    )

    # splice in a hot word often enough to cross the floor sometimes
    hot = [["merge"] * 13] * (len(corpus) % 7)
    docs = corpus + hot
    sf_dir = _docs_df(spark, tmp_path_factory.mktemp("hh"), docs)
    got = {
        r["wd"]: r["cnt"] for r in text_heavy_hitters(spark, sf_dir).collect()
    }
    from collections import Counter

    counts = Counter(w for ws in docs for w in ws if w != "")
    total = sum(counts.values())
    threshold = max(HH_MIN_COUNT, total // HH_SHARE_DIV)
    assert got == {w: c for w, c in counts.items() if c >= threshold}


def _trigram_reference(docs):
    """Pure-Python stupid-backoff reference with the entry's exact
    arithmetic: train = even doc_ids, score = odd < 80; per-trigram ln()
    rounded at DECIMAL(28,10)."""
    from collections import Counter

    train = [ws for i, ws in docs if i % 2 == 0]
    tc, bc, uc = Counter(), Counter(), Counter()
    for ws in train:
        uc.update(ws)
        bc.update(zip(ws, ws[1:]))
        tc.update(zip(ws, ws[1:], ws[2:]))
    c12 = Counter()
    for (w1, w2, _), c in tc.items():
        c12[(w1, w2)] += c
    c1 = Counter()
    for (w1, _), c in bc.items():
        c1[w1] += c
    n, v = sum(uc.values()), len(uc)
    out = {}
    for i, ws in docs:
        if i % 2 == 0 or i >= 80 or len(ws) < 3:
            continue
        lps = []
        for t in zip(ws, ws[1:], ws[2:]):
            if t in tc:
                p = tc[t] / c12[(t[0], t[1])]
            elif (t[1], t[2]) in bc:
                p = 0.4 * (bc[(t[1], t[2])] / c1[t[1]])
            else:
                p = 0.4 * 0.4 * ((uc.get(t[2], 0) + 0.5) / (n + 0.5 * v))
            lps.append(round(math.log(p), 10))
        out[i] = (len(lps), sum(lps))
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus)
def test_trigram_backoff_matches_reference(spark, tmp_path_factory, corpus):
    from paimon_presto_spark.queries.curation import text_trigram_backoff

    # ensure at least one trainable doc and one scorable doc
    docs = [["merge", "scan", "sort", "join"]] + corpus + [
        ["scan", "merge", "sort"]
    ]
    sf_dir = _docs_df(spark, tmp_path_factory.mktemp("tri"), docs)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["logprob_sum"])
        for r in text_trigram_backoff(spark, sf_dir).collect()
    }
    # parse EXACTLY like both engines: split("", " ") yields [""], so an
    # empty doc contributes one empty-string token to the trained model
    parsed = [(i, " ".join(ws).split(" ")) for i, ws in enumerate(docs)]
    ref = _trigram_reference(parsed)
    assert set(got) == set(ref)
    for i in ref:
        assert got[i][0] == ref[i][0]
        assert got[i][1] == pytest.approx(ref[i][1], abs=1e-8)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-40, max_value=40),
            min_size=4,
            max_size=4,
        ),
        min_size=4,
        max_size=12,
    )
)
def test_sq8_full_coarse_equals_bruteforce(spark, vecs):
    """With coarse_k >= |corpus| the SQ8 cut drops nothing, so the exact
    re-rank must equal brute force on arbitrary integer-grid vectors
    (zero vectors excluded on both paths)."""
    from paimon_presto_spark.operators.similarity import (
        brute_force_topk,
        sq8_rerank_topk,
    )

    rows = [
        (i, [float(x) for x in v], "x")
        for i, v in enumerate(vecs)
        if any(v)
    ]
    if len(rows) < 3:
        return
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    corpus, queries = df.filter("vec_id >= 2"), df.filter("vec_id < 2")
    if not corpus.take(1) or not queries.take(1):
        return
    got = {
        (r["q_id"], r["rnk"]): r["n_id"]
        for r in sq8_rerank_topk(corpus, queries, k=3, coarse_k=999).collect()
    }
    ref = {
        (r["q_id"], r["rnk"]): r["n_id"]
        for r in brute_force_topk(corpus, queries, k=3).collect()
    }
    assert got == ref
