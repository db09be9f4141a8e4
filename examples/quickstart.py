"""End-to-end tour of the engine, runnable standalone:

    python examples/quickstart.py

Creates a warehouse in a temp dir and walks the table format (DDL,
bucketed primary-key writes, merge-on-read, time travel, tags, system
tables, schema evolution, compaction, changelog reads), the Python
DataSource, TIME/VARCHAR type mapping, analytical queries over the
testdata, LSH embedding dedup, in-process image decoding, and an
LLM-data curation pass — printing a short proof line per step (streaming
lives in `tests/test_streaming.py`; it needs its own micro-batch
lifecycle).
Everything it calls is covered by `tests/`; this file is the narrative
version for a user switching from the reference connector.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from paimon_presto_spark.catalog import Catalog  # noqa: E402
from paimon_presto_spark.plans.predicate import P  # noqa: E402
from paimon_presto_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("quickstart")
    wh = tempfile.mkdtemp(prefix="paimon-quickstart-")
    try:
        catalog = Catalog(spark, wh)

        # -- DDL + primary-key table with buckets --------------------------
        catalog.create_database("demo", ignore_if_exists=True)
        t = catalog.create_table(
            "demo", "users", "uid int, name string, score int",
            primary_keys=["uid"], options={"bucket": "4"},
        )
        print("create_table ok:", catalog.list_tables("demo"))

        # -- upsert / delete / merge-on-read -------------------------------
        t.upsert(spark.createDataFrame(
            [(1, "ada", 10), (2, "bob", 20)], "uid int, name string, score int"))
        t.upsert(spark.createDataFrame(
            [(2, "bob", 25), (3, "eve", 30)], "uid int, name string, score int"))
        t.delete(spark.createDataFrame(
            [(1, "ada", 10)], "uid int, name string, score int"))
        merged = {r["uid"]: r["score"] for r in t.to_df().collect()}
        print("merge-on-read ok:", merged)
        assert merged == {2: 25, 3: 30}

        # -- time travel + tags ---------------------------------------------
        v1 = {r["uid"] for r in t.to_df(snapshot_id=1).collect()}
        print("time travel to snapshot 1 ok:", sorted(v1))
        t.create_tag("before-cleanup", snapshot_id=2)
        tagged = {r["uid"] for r in t.to_df(tag="before-cleanup").collect()}
        print("tag read ok:", sorted(tagged))

        # -- system tables ---------------------------------------------------
        snaps = catalog.read_table("demo", "users$snapshots")
        print("system table ok: $snapshots rows =", snaps.count())

        # -- schema evolution ------------------------------------------------
        catalog.add_column("demo", "users", "tier", "string")
        t = catalog.get_table("demo", "users")  # re-open at the new schema
        t.upsert(spark.createDataFrame(
            [(4, "kim", 40, "gold")], "uid int, name string, score int, tier string"))
        evolved = t.to_df().filter(F.col("uid") == 2).collect()[0]
        print("schema evolution ok: old rows null-padded ->", evolved["tier"])

        # -- compaction + changelog -----------------------------------------
        t.compact()
        chg = t.incremental_df(2, 3)
        print("incremental changelog ok: rows =", chg.count())

        # -- Python DataSource ----------------------------------------------
        from paimon_presto_spark.sources.datasource import PaimonDataSource

        spark.dataSource.register(PaimonDataSource)
        df = (
            spark.read.format("paimon").option("path", t.path).load()
        )
        print("datasource read ok:", sorted(r["uid"] for r in df.collect()))

        # -- CDC ordering: sequence.field + rowkind.field --------------------
        cdc = catalog.create_table(
            "demo", "cdc", "k int, v string, ver bigint, rk string",
            primary_keys=["k"],
            options={"sequence.field": "ver", "rowkind.field": "rk"},
        )
        ddl = "k int, v string, ver bigint, rk string"
        cdc.upsert(spark.createDataFrame([(1, "fresh", 10, "+I")], ddl))
        # one atomic CDC batch: a stale replay (+U ver=3 loses) and a
        # stale tombstone (-D ver=5 loses) — the fresh row survives both
        cdc.upsert(spark.createDataFrame(
            [(1, "stale", 3, "+U"), (1, None, 5, "-D"), (2, "b", 1, "+I")], ddl))
        state = {r["k"]: r["v"] for r in cdc.to_df().collect()}
        print("sequence/rowkind ok: out-of-order CDC kept", state)

        # -- MERGE INTO: one atomic conditional upsert/insert ----------------
        # k=1 updates (ver 30 beats stored 10); k=2's stale ver=0 fails the
        # condition and leaves the stored row untouched; k=3 inserts
        cdc.merge_into(
            spark.createDataFrame(
                [(1, "merged", 30, "+U"), (2, "stale", 0, "+U"),
                 (3, "new", 1, "+I")], ddl),
            matched_condition="ver > target.ver",
        )
        # column-level SET: only v changes, ver keeps its stored value
        cdc.merge_into(
            spark.createDataFrame([(3, None, None, "+U")], ddl),
            update_set={"v": "concat(target.v, '!')"},
            when_not_matched="ignore",
        )
        print("merge_into ok:", {r["k"]: r["v"] for r in cdc.to_df().collect()})

        # -- bloom file index: point lookups on unsorted columns -------------
        bt = catalog.create_table(
            "demo", "traces", "tid string, payload string",
            options={"file-index.bloom-filter.columns": "tid"},
        )
        for part in range(3):
            bt.append(spark.createDataFrame(
                [(f"trace-{part}-{i}", "x") for i in range(50)],
                "tid string, payload string").coalesce(1))
        sc = bt.scan(predicate=P.eq("tid", "trace-1-7"))
        hit = sc.to_df().count()
        print("bloom index ok:", hit, "row;",
              sc.last_plan["after_stats_skip"], "of",
              sc.last_plan["total_files"], "files read")

        # -- TIME + bounded VARCHAR type mapping -----------------------------
        tt = catalog.create_table("demo", "shifts", "sid int, start_t time, code varchar(4)")
        tt.append(spark.createDataFrame(
            [(1, 9 * 3600 * 1_000_000, "AM"), (2, 14 * 3600 * 1_000_000, "PM")],
            "sid int, start_t long, code string"))
        aft = tt.to_df().filter(F.col("start_t") > 12 * 3600 * 1_000_000).count()
        print("TIME column ok: micros-since-midnight, afternoon shifts =", aft)

        # -- analytical queries over testdata -------------------------------
        from paimon_presto_spark.queries import queries

        qs = queries()
        q1 = qs["q1_pricing_summary"](spark, SF_DIR)
        print("TPC-H q1 ok:", q1.count(), "groups")
        topk = qs["knn_ivf_probe"](spark, SF_DIR)
        print("IVF ANN ok:", topk.count(), "neighbor rows")
        # wider buckets (4 planes) than the registry entry's 8: the demo
        # corpus is tiny, so trade candidate volume for visible recall
        from paimon_presto_spark.operators.similarity import lsh_cosine_pairs

        emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        pairs = lsh_cosine_pairs(emb, 0.45, n_planes=4, dim=64)
        print("LSH embedding dedup ok:", pairs.count(), "near-dup pairs")
        # SemDeDup: cluster-fenced semantic dedup (pair search bounded per
        # cluster) and the Bloom-bitmap decontamination variant
        sem = qs["dedup_semantic_clusters"](spark, SF_DIR)
        n_drop = sem.filter(F.col("status") == "dropped").count()
        print("semdedup ok:", n_drop, "semantic dups dropped of", sem.count())
        bloom = qs["decontaminate_bloom"](spark, SF_DIR)
        print("bloom decontamination ok:",
              bloom.filter(F.col("flagged")).count(), "train docs flagged")
        # incremental dedup: a new batch against the existing corpus —
        # old docs are never re-paired against themselves
        inc = qs["dedup_minhash_incremental"](spark, SF_DIR)
        print("incremental dedup ok:", inc.count(), "pairs touch the increment")

        # -- multimodal: real in-process image decode ------------------------
        from paimon_presto_spark.operators.multimodal import (
            encode_ppm, extract_image_features)

        ppm = encode_ppm(4, 4, [bytes([40 * y] * 12) for y in range(4)])
        media = spark.createDataFrame(
            [(1, "image", bytearray(ppm), "image/x-ppm", None, None, None)],
            "media_id bigint, kind string, payload binary, mime string, "
            "width int, height int, duration_ms bigint")
        feat = extract_image_features(media).collect()[0]
        print("image decode ok: %dx%d mean_luma=%.2f" % (
            feat["width"], feat["height"], feat["mean_luma"]))

        # -- LLM-data curation ----------------------------------------------
        from paimon_presto_spark.operators.pipeline import curate_corpus

        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        kept, report = curate_corpus(docs)
        print("curation ok:", {r["stage"]: r["n_dropped"] for r in report.collect()},
              "kept =", kept.count())

        # -- avro tables: the reference's third declared file format --------
        av = catalog.create_table(
            "demo", "events_avro", "k bigint, v string",
            options={"file.format": "avro"})
        av.append(spark.range(0, 100).selectExpr(
            "id AS k", "concat('v', id) AS v"))
        print("avro table ok:", av.scan().to_df().count(),
              "rows through the pure-Python container codec")

        # -- curation entries: PII redaction + sequence packing -------------
        from paimon_presto_spark.queries import queries as _registry

        qs2 = _registry()
        pii = qs2["text_pii_redaction"](spark, SF_DIR)
        packed = qs2["pack_sequences_greedy"](spark, SF_DIR)
        print("pii redaction ok:", pii.count(), "sources;",
              "packing ok:", packed.count(), "bins")

        # -- external (jdbc/SQLite) metastore: pointers, not directories ----
        ms_uri = os.path.join(wh, "ext-catalog.sqlite")
        m1 = Catalog(spark, os.path.join(wh, "ext-wh"),
                     metastore="jdbc", uri=ms_uri)
        m1.create_database("shared")
        m1.create_table("shared", "t", "k int", primary_keys=["k"]).upsert(
            spark.createDataFrame([(1,), (2,)], "k int"))
        m2 = Catalog(spark, os.path.join(wh, "ext-wh"),
                     metastore="jdbc", uri=ms_uri)  # a second engine
        m2.rename_table("shared", "t", "t_gold")
        print("jdbc metastore ok:",
              m1.list_tables("shared"), "visible to both instances")

        # -- budgeted selection + phrase search -----------------------------
        sel = qs2["select_token_budget"](spark, SF_DIR)
        ph = qs2["text_phrase_search"](spark, SF_DIR)
        print("token-budget selection ok:", sel.count(), "sources;",
              "phrase search ok:",
              {r["phrase"]: r["n_matches"] for r in ph.collect()})

        # -- retrieval + model-based selection (round 6) --------------------
        bm = qs2["text_bm25_topk"](spark, SF_DIR).limit(3).collect()
        dsir = qs2["sample_dsir_importance"](spark, SF_DIR).limit(3).collect()
        lq = qs2["text_quality_logreg"](spark, SF_DIR)
        kept = lq.agg(F.sum("kept")).collect()[0][0]
        mat = qs2["knn_matryoshka_recall"](spark, SF_DIR)
        mean_recall = mat.agg(F.avg("recall")).collect()[0][0]
        print("bm25 top doc:", bm[0]["doc_id"],
              "| dsir top doc:", dsir[0]["doc_id"],
              "| logreg keeps:", kept,
              "| matryoshka mean recall@10:", round(mean_recall, 3))

        # -- containment dedup, bigram LM, stream/batch parity ---------------
        cont = qs2["dedup_ngram_containment"](spark, SF_DIR)
        ppl = qs2["text_bigram_perplexity"](spark, SF_DIR).limit(3).collect()
        par = qs2["streaming_batch_parity_dedup"](spark, SF_DIR).collect()[0]
        print("containment pairs:", cont.count(),
              "| bigram ppl(doc0):", ppl[0]["perplexity"],
              "| stream/batch parity kept:", par["n_kept"],
              "dropped:", par["n_dropped"])

        # -- round 7: weighted quantiles, stored ANN index, APSS, RRF -------
        wm = qs2["agg_weighted_median"](spark, SF_DIR).collect()
        wq = qs2["agg_weighted_quartiles"](spark, SF_DIR).limit(1).collect()[0]
        stored = qs2["knn_ivf_pq_stored"](spark, SF_DIR)
        apss = qs2["dedup_tfidf_cosine"](spark, SF_DIR)
        rrf = qs2["retrieval_rrf_fusion"](spark, SF_DIR).limit(1).collect()[0]
        print("weighted median per flag:",
              {r["l_returnflag"]: r["weighted_median"] for r in wm},
              "| IQR(A):", float(wq["iqr"]),
              "| stored-index ANN rows:", stored.count(),
              "| tf-idf cosine pairs:", apss.count(),
              "| rrf top hit:", rrf["n_id"], f"({rrf['n_lists']} lists)")

        # -- late round 7: SQ8 re-rank ANN, trigram LM, heavy hitters --------
        sq8 = qs2["knn_sq8_rerank"](spark, SF_DIR).limit(1).collect()[0]
        tri = qs2["text_trigram_backoff"](spark, SF_DIR).limit(1).collect()[0]
        hh = qs2["text_heavy_hitters"](spark, SF_DIR).limit(1).collect()[0]
        print("sq8 top hit:", sq8["n_id"], f"(int_dot {sq8['int_dot']})",
              "| trigram ppl(doc1):", tri["perplexity"],
              "| top heavy hitter:", hh["wd"], f"({hh['cnt']}x)")

        # -- multimodal: real decode/resize/WAV-parse under the hash gate ----
        img = qs2["multimodal_image_pipeline"](spark, SF_DIR).limit(1).collect()[0]
        aud = qs2["multimodal_audio_features"](spark, SF_DIR).limit(1).collect()[0]
        frm = qs2["multimodal_frame_sample"](spark, SF_DIR)
        print(f"image doc0: {img['width']}x{img['height']}",
              f"resized r_sum {img['r_sum']}",
              f"| audio doc0: {aud['n_samples']} samples rms {aud['rms']}",
              "| frames sampled:", frm.count())

        # -- iterative graph compute: token-transition PageRank --------------
        prk = qs2["graph_pagerank_tokens"](spark, SF_DIR).limit(1).collect()[0]
        print("top pagerank token:", prk["token"], f"({prk['pagerank']})")

        # -- zero-shuffle co-located bucket join ------------------------------
        from paimon_presto_spark.sources.colocated import colocated_join

        t_a = catalog.create_table(
            "demo", "co_orders",
            "o_orderkey bigint, o_totalprice double",
            primary_keys=["o_orderkey"], options={"bucket": "4"},
        )
        t_a.upsert(
            spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
            .select("o_orderkey", "o_totalprice")
        )
        t_b = catalog.create_table(
            "demo", "co_profile", "o_orderkey bigint, n_items bigint",
            primary_keys=["o_orderkey"], options={"bucket": "4"},
        )
        t_b.upsert(
            spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
            .groupBy(F.col("l_orderkey").alias("o_orderkey"))
            .agg(F.count(F.lit(1)).alias("n_items"))
        )
        cj = colocated_join(spark, t_a, t_b, left_on="o_orderkey")
        cj_plan = cj._jdf.queryExecution().executedPlan().toString()
        print("colocated join ok:", cj.count(), "rows;",
              "no join node in plan:", "Join" not in cj_plan,
              "| no exchange:", "Exchange" not in cj_plan)

        # -- point lookup through the colocated join: pushFilters pins the
        # bucket, so 1 of 4 splits is planned (fresh handle per query —
        # see tests/test_pushdown_reuse.py for why)
        k = t_a.to_df().agg(F.min("o_orderkey")).collect()[0][0]
        lookup = colocated_join(spark, t_a, t_b, left_on="o_orderkey").filter(
            F.col("o_orderkey") == k
        )
        print("colocated lookup ok:", lookup.count(), "row;",
              "splits planned:", lookup.rdd.getNumPartitions(), "of 4")

        # -- perceptual-hash image dedup: decode -> aHash -> banded
        # Hamming pairs -> clusters -> keep best by quality
        from paimon_presto_spark.queries.multimodal_entries import (
            dedup_image_phash,
        )

        clusters = dedup_image_phash(spark, SF_DIR).collect()
        print("image phash dedup ok:", len(clusters), "clusters;",
              "largest keeps doc",
              max(clusters, key=lambda r: r["cluster_size"])["kept_doc_id"])

        # -- and the video twin: PPM-stream demux -> per-frame aHash ->
        # temporal majority vote -> the SAME banded machinery (all four
        # perceptual modalities share hamming_banded_pairs)
        from paimon_presto_spark.queries.multimodal_entries import (
            dedup_video_fingerprint,
        )

        vclusters = dedup_video_fingerprint(spark, SF_DIR).collect()
        print("video fingerprint dedup ok:", len(vclusters), "clusters")

        print("quickstart complete.")
    finally:
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
