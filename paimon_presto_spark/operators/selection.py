"""Budgeted corpus selection: take the best-scoring documents until a
global weight budget (token count) is exhausted.

The naive spelling — ``SUM(weight) OVER (ORDER BY score DESC)`` then
``WHERE cum <= budget`` — is correct but puts the ENTIRE corpus through
one unpartitioned window: a single task owns the running total, the
classic global-sort bottleneck at 100 TB. ``select_until_budget``
computes the same selection with bounded per-task work:

1. one tiny aggregation finds the score range; every row maps to one of
   ``n_buckets`` score-range buckets (map-side arithmetic, no shuffle);
2. per-bucket weight totals (one shuffle to ``n_buckets`` rows) prefix-
   sum on the DRIVER — the only serial step, O(n_buckets);
3. buckets strictly better than the cutoff bucket are selected whole
   (map-side filter); only the ONE cutoff bucket runs an exact
   running-total window, over ~corpus/n_buckets rows, offset by the
   driver's prefix.

Rows with equal scores share a bucket (the bucket is a function of the
score alone), so the bucket order refines the global (score DESC, id)
order and the composition equals the single-window answer exactly —
which is how the DuckDB oracle states it.

Same decomposition pattern as two-phase skew aggregation: turn one
global serial pass into (parallel partials) + (driver-size prefix) +
(one bounded exact pass).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def select_until_budget(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    budget: int,
    id_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Rows whose running ``weight_col`` total — accumulated in
    (``score_col`` DESC, ``id_col`` ASC) order, inclusive of the current
    row — stays within ``budget``. Weights must be integers (the budget
    comparison is exact, never float-accumulated)."""
    rng = df.agg(
        F.min(score_col).alias("mn"), F.max(score_col).alias("mx")
    ).collect()[0]
    mn, mx = rng["mn"], rng["mx"]
    if mn is None:
        return df.limit(0)
    span = (mx - mn) or 1.0
    # bucket 0 holds the BEST scores; equal scores always share a bucket
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.lit(mx) - F.col(score_col)) / F.lit(span) * n_buckets),
    ).cast("int")
    b = df.withColumn("__bkt", bucket)
    # NULL weights count as 0 (the row is selected whenever the budget is
    # not yet exhausted, and never advances the total) — uniformly, in
    # both the whole-bucket and edge-bucket paths. Note this is saner
    # than the raw SQL window spelling, where a NULL-weight PREFIX makes
    # the running total NULL and silently drops those rows.
    totals = {
        r["__bkt"]: r["w"] or 0
        for r in b.groupBy("__bkt")
        .agg(F.sum(weight_col).alias("w"))
        .collect()
    }
    prefix = 0
    cutoff_bucket, cutoff_offset = None, 0
    for i in sorted(totals):
        if prefix + totals[i] > budget:
            cutoff_bucket, cutoff_offset = i, prefix
            break
        prefix += totals[i]
    if cutoff_bucket is None:  # whole corpus fits the budget
        return b.drop("__bkt")
    whole = b.filter(F.col("__bkt") < cutoff_bucket).drop("__bkt")
    w = Window.orderBy(F.desc(score_col), F.asc(id_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    edge = (
        b.filter(F.col("__bkt") == cutoff_bucket)
        .withColumn(
            "__cum",
            F.sum(F.coalesce(F.col(weight_col), F.lit(0))).over(w)
            + F.lit(cutoff_offset),
        )
        .filter(F.col("__cum") <= budget)
        .drop("__bkt", "__cum")
    )
    return whole.unionByName(edge)
