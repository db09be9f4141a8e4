"""End-to-end training-corpus curation: the composition of this package's
dedup / quality / decontamination operators into the standard LLM-data
pipeline shape (exact dedup → quality filter → near-dup clustering →
eval-set decontamination), with a per-stage accounting report.

Every stage is the already-scale-proven operator (SCALE.md): exact dedup
groups 16-byte content hashes, near-dup candidates come from LSH band
equi-joins resolved into transitive clusters, decontamination probes a
broadcast EVAL-shingle set (the eval corpus is the small side — the
opposite asymmetry from ``ngram_containment``, whose broadcast side is
the probe corpus's vocabulary). The pipeline only *composes* them: no
stage adds a new shuffle shape, document payloads move at most once per
stage (id-based semi/anti joins carry the decisions), and each stage's
survivor set is cached before the count so the report never re-runs
upstream stages. Decision sets are corpus-sized, so the semi/anti joins
carry no broadcast hint — AQE broadcasts them only when they measure
small at runtime.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from paimon_presto_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    minhash_lsh_pairs,
    shingle_hashes,
)
from paimon_presto_spark.operators.text import quality_metrics


def eval_contamination(
    corpus: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-corpus-document fraction of shingles found in the eval corpus:
    (id, n_shingles, n_overlap, containment).

    Scale asymmetry: the EVAL shingle vocabulary is broadcast (eval sets
    are thousands of docs, bounded by construction); the corpus side is
    scanned once with a map-side broadcast left join plus one per-doc
    count aggregation — no shuffle of corpus text. This is the mirror of
    ``ngram_containment`` (which broadcasts the probe corpus's vocabulary
    to keep a 100 TB *training* scan shuffle-free); use whichever side of
    the asymmetry is small.
    """
    eval_sh = (
        shingle_hashes(eval_docs, id_col, text_col, shingle_n, distinct=False)
        .select("h")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus_sh = shingle_hashes(corpus, id_col, text_col, shingle_n)
    return (
        corpus_sh.join(F.broadcast(eval_sh), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_overlap"),
        )
        .select(
            F.col("doc_id").alias(id_col),
            "n_shingles",
            "n_overlap",
            (F.col("n_overlap") / F.col("n_shingles")).alias("containment"),
        )
    )


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    max_punct_ratio: float = 0.3,
    shingle_n: int = 3,
    minhash_k: int = 16,
    lsh_bands: int = 4,
    jaccard_threshold: float = 0.5,
    eval_docs: DataFrame | None = None,
    max_containment: float = 0.8,
) -> tuple[DataFrame, DataFrame]:
    """Run the four-stage curation pipeline; returns ``(kept, report)``.

    ``kept``   — the surviving documents (same schema as ``docs``).
    ``report`` — one row per stage: (stage, stage_order, n_dropped).

    Keeper policy is minimum id — deterministic, and for near-dup
    clusters exact for transitive clusters via ``connected_components``
    (a~b, b~c collapses to ONE keeper even though a~c was never scored).
    """
    stages: list[tuple[str, int]] = []
    cur = docs.cache()
    n_cur = cur.count()

    def advance(stage: str, survivors: DataFrame) -> None:
        nonlocal cur, n_cur
        survivors = survivors.cache()
        n_next = survivors.count()
        stages.append((stage, n_cur - n_next))
        cur.unpersist()
        cur, n_cur = survivors, n_next

    # 1. Exact dedup: keep the min-id copy of every distinct text.
    keepers = exact_dedup(cur, id_col, text_col).select(
        F.col("keeper_doc_id").alias(id_col)
    )
    # Decision sets (keepers / survivors / drops) scale with |corpus|, so
    # they must NOT be broadcast-hinted: a forced broadcast collects a
    # corpus-sized table to the driver. They are id-only (narrow) tables;
    # AQE picks broadcast on its own when a set is actually small.
    advance("exact_dedup", cur.join(keepers, id_col, "left_semi"))

    # 2. Quality filter: token-count window + punctuation ceiling.
    qm = quality_metrics(cur, id_col, text_col)
    good = qm.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("punct_ratio") <= max_punct_ratio)
    ).select(id_col)
    advance("quality_filter", cur.join(good, id_col, "left_semi"))

    # 3. Near-dup clustering: LSH pairs → transitive components → keep the
    #    minimum id of each cluster (== drop every doc whose component
    #    label is not itself).
    pairs = minhash_lsh_pairs(
        cur,
        id_col=id_col,
        text_col=text_col,
        shingle_n=shingle_n,
        k=minhash_k,
        bands=lsh_bands,
        threshold=jaccard_threshold,
    )
    comps = connected_components(pairs)
    drops = comps.filter(F.col("doc_id") != F.col("component")).select(
        F.col("doc_id").alias(id_col)
    )
    advance("near_dup_clusters", cur.join(drops, id_col, "left_anti"))

    # 4. Optional decontamination: drop docs whose shingles are mostly
    #    contained in the eval corpus.
    if eval_docs is not None:
        contaminated = (
            eval_contamination(cur, eval_docs, id_col, text_col, shingle_n)
            .filter(F.col("containment") > max_containment)
            .select(id_col)
        )
        advance("decontaminate", cur.join(contaminated, id_col, "left_anti"))

    spark = docs.sparkSession
    report = spark.createDataFrame(
        [(name, i, int(n)) for i, (name, n) in enumerate(stages)],
        "stage string, stage_order int, n_dropped long",
    )
    return cur, report
