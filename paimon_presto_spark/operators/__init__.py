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
from paimon_presto_spark.operators.multimodal import (
    extract_audio_features,
    extract_image_features,
    media_stats,
    resize_images,
    sample_frames,
)
from paimon_presto_spark.operators.pipeline import curate_corpus, eval_contamination
from paimon_presto_spark.operators.rangejoin import interval_join
from paimon_presto_spark.operators.similarity import (
    brute_force_topk,
    cosine_pairs,
    ivf_topk,
    kmeans_centroids,
    lsh_bucketed_topk,
    lsh_cosine_pairs,
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
    "extract_audio_features",
    "extract_image_features",
    "interval_join",
    "ivf_topk",
    "kmeans_centroids",
    "lsh_bucketed_topk",
    "lsh_cosine_pairs",
    "language_id",
    "media_stats",
    "quality_metrics",
    "resize_images",
    "sample_frames",
]
