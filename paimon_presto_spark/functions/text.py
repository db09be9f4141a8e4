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


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (order-preserving).

    Expressed with higher-order functions (``transform`` over a
    ``sequence``) so shingling stays inside whole-stage codegen. Documents
    shorter than n words yield an empty array (Spark's ``sequence(1, 0)``
    counts *down*, so the short case must be guarded explicitly).
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(c, " ")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) >= n, grams).otherwise(empty)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are non-alphanumeric, non-space."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, "[a-zA-Z0-9 ]", "")
    return F.length(stripped) / F.length(c)


def mean_token_length(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    no_space = F.regexp_replace(c, " ", "")
    return F.length(no_space) / token_count(c)
