"""Vector math over ``array<float/double>`` columns, JVM-side.

Built on ``zip_with`` + ``aggregate`` higher-order functions so the math
runs inside whole-stage codegen — no Python serialization per row. At 100 TB
this is the difference between an ANN sweep that saturates CPU and one that
drowns in pickling. (A vectorized pandas-UDF variant exists in
``operators/similarity.py`` for wide-batch BLAS paths.)
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns (sequential left-to-right sum)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
