"""Text-analysis primitives over string columns, JVM-side.

Tokenization is deliberately trivial (split on single space): the synthetic
``documents`` corpus is pre-normalized, and keeping the rule identical in
Spark and any SQL oracle makes the dedup pipelines bit-reproducible.
Swap :func:`tokens` for a locale-aware regexp at ingestion time if needed.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def shingle_array(toks: Column, n: int) -> Column:
    """Word n-gram shingles over an already-materialized token array.

    IMPORTANT for performance: pass a *column reference* to a projected
    token array (``df.withColumn("tk", F.split(...))``), not the split
    expression itself. Catalyst does not common-subexpression-eliminate
    inside higher-order-function lambdas, so an inlined ``split`` would be
    re-evaluated for every ``element_at`` — turning shingling O(len²) per
    document (measured 15× slower at sf0.1).

    Documents shorter than n words yield an empty array (Spark's
    ``sequence(1, 0)`` counts *down*, so the short case must be guarded).
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) >= n, grams).otherwise(empty)


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles straight from a text column (convenience form;
    for hot paths project the token array first and use
    :func:`shingle_array`)."""
    c = F.col(col) if isinstance(col, str) else col
    return shingle_array(F.split(c, " "), n)


#: GPT-2-style pre-tokenizer pattern, restricted to constructs Java regex
#: and RE2 (DuckDB) interpret identically: contraction suffixes, then
#: optionally-space-prefixed letter runs, digit runs, and symbol runs.
#: (The original GPT-2 pattern's trailing-whitespace lookahead is dropped —
#: RE2 has no lookahead; whitespace runs are simply not counted as tokens.)
BPE_TOKEN_PATTERN = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pre-tokenizer regex.

    The real BPE merge table is model-specific; its cost model for data
    budgeting is dominated by the pre-tokenizer split, which this
    reproduces engine-portably (Spark ``regexp_count`` ≡ DuckDB
    ``len(regexp_extract_all(...))``).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_TOKEN_PATTERN))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are non-alphanumeric, non-space."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, "[a-zA-Z0-9 ]", "")
    return F.length(stripped) / F.length(c)


def mean_token_length(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    no_space = F.regexp_replace(c, " ", "")
    return F.length(no_space) / token_count(c)
