"""Text analysis operators: quality metrics, language identification,
token statistics. All built-in-function compositions (codegen; the only
shuffle is the caller's, if any).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from paimon_presto_spark.functions.text import mean_token_length, punct_ratio, token_count

#: Minimal function-word profiles. Real pipelines plug fasttext-style models
#: in via a pandas UDF; this heuristic keeps the operator dependency-free
#: and fully deterministic (same shape as the reference-free cld heuristics).
STOPWORD_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "to", "and", "is", "in"),
    "es": ("el", "la", "de", "que", "y", "los", "es"),
    "fr": ("le", "la", "de", "et", "les", "des", "un"),
    "de": ("der", "die", "und", "das", "ist", "von", "ein"),
    "zh": ("的", "是", "不", "我", "了", "在", "有"),
}


def quality_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document quality features: token count, mean token length,
    punctuation ratio. The standard cheap pre-filter of LLM data pipelines;
    filter on the outputs (e.g. 15 ≤ n_tokens ≤ 4096, mean_token_len < 12).
    """
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        F.length(t).alias("n_chars"),
        mean_token_length(t).alias("mean_token_len"),
        punct_ratio(t).alias("punct_ratio"),
    )


def language_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic language ID: argmax of function-word hit density per
    language profile. Returns (id, predicted_lang, score).

    One explode + one groupBy; the per-language hit counters are a fixed
    set of conditional sums, so the aggregation state is constant-size —
    safe at any corpus size. Ties resolve to the lexicographically smallest
    language (deterministic).
    """
    tok = docs.select(F.col(id_col), F.explode(F.split(text_col, " ")).alias("tok"))
    aggs = [
        F.sum(F.when(F.col("tok").isin(*words), 1).otherwise(0)).alias(f"hits_{lang}")
        for lang, words in sorted(STOPWORD_PROFILES.items())
    ]
    per_doc = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"), *aggs)
    langs = sorted(STOPWORD_PROFILES)
    pairs = F.array(
        *[
            F.struct(
                (F.col(f"hits_{la}") / F.col("n_tokens")).alias("score"),
                F.lit(la).alias("lang"),
            )
            for la in langs
        ]
    )
    # fold keeps the FIRST maximum → smallest language code wins ties
    # (pairs is built in sorted-lang order)
    best = F.aggregate(
        pairs,
        F.struct(F.lit(-1.0).alias("score"), F.lit("").alias("lang")),
        lambda acc, x: F.when(x["score"] > acc["score"], x).otherwise(acc),
    )
    return per_doc.select(
        F.col(id_col),
        best["lang"].alias("predicted_lang"),
        best["score"].alias("score"),
    )


def token_histogram(docs: DataFrame, text_col: str = "text", top: int = 1000) -> DataFrame:
    """Corpus token frequency table (vocabulary building)."""
    return (
        docs.select(F.explode(F.split(text_col, " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("tok"))
        .limit(top)
    )


def posting_lists(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional inverted index: one (term, doc, pos) posting per word
    occurrence — the classic text-search layout. At 100 TB the postings
    are the shuffle payload (term + two integers, never the document),
    hash-partitioned by term so each term's posting list is co-located;
    downstream term lookups become partition-pruned equi-joins. Position
    is 1-based (matches SQL ``generate_subscripts``)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos0", "term"),
    ).select("term", "doc_id", (F.col("pos0") + 1).alias("pos"))


def phrase_match(postings: DataFrame, phrase: list[str]) -> DataFrame:
    """Documents containing the exact word sequence ``phrase``, with match
    counts: the m-way positional join over posting lists (term filters
    prune each side to one list; joins are equi on (doc_id, pos-offset) —
    the standard phrase-query plan of inverted-index engines). Returns
    (doc_id, n_matches)."""
    if not phrase:
        raise ValueError("phrase must have at least one word")
    cur = (
        postings.filter(F.col("term") == phrase[0])
        .select("doc_id", F.col("pos").alias("p0"))
    )
    for i, word in enumerate(phrase[1:], start=1):
        nxt = postings.filter(F.col("term") == word).select(
            F.col("doc_id").alias("d_i"), F.col("pos").alias("p_i")
        )
        cur = cur.join(
            nxt,
            (F.col("doc_id") == F.col("d_i"))
            & (F.col("p_i") == F.col("p0") + i),
        ).select("doc_id", "p0")
    return cur.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_matches"))
