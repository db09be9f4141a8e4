"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
multimodal column processing. SURVEY §7 M4 — extensions beyond reference
parity, designed for 100 TB inputs (banded joins instead of all-pairs,
Arrow-batched UDFs only where built-ins can't express the math).
"""

from paimon_presto_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_containment,
    ngram_jaccard_pairs,
    simhash_signatures,
    simhash_pairs,
)
from paimon_presto_spark.operators.pipeline import curate_corpus, eval_contamination
from paimon_presto_spark.operators.similarity import (
    brute_force_topk,
    cosine_pairs,
    ivf_topk,
    kmeans_centroids,
    lsh_bucketed_topk,
)
from paimon_presto_spark.operators.text import language_id, quality_metrics

__all__ = [
    "exact_dedup",
    "minhash_lsh_pairs",
    "ngram_containment",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "simhash_pairs",
    "brute_force_topk",
    "cosine_pairs",
    "curate_corpus",
    "eval_contamination",
    "ivf_topk",
    "kmeans_centroids",
    "lsh_bucketed_topk",
    "language_id",
    "quality_metrics",
]
