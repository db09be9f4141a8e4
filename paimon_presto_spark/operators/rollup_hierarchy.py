"""Hypertable-style hierarchical time rollup: one pass over the raw
events builds the finest aggregate; every coarser granularity
re-aggregates the next-finer LEVEL, never the raw table — the
continuous-aggregate pattern of time-series stores, expressed as plain
DataFrame re-aggregation.

Scale math: raw |rows| are touched exactly once (the finest groupBy);
each coarser level costs O(|finer level|) = O(windows), which is
orders of magnitude below |rows|. This only works for algebraic
aggregates (count, sum — and decimal sums keep the re-aggregation
bit-exact); distinct counts need sketch merge (``hll_sketch_agg`` →
``hll_union``) and are deliberately not part of this operator's exact
contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from paimon_presto_spark.functions.numeric import DEC


def hierarchical_rollup(
    events: DataFrame,
    ts_col: str,
    value_col: str,
    granularities_s: list[int],
    ns_per_unit: int = 1_000_000_000,
) -> DataFrame:
    """Multi-granularity rollup of (count, exact-decimal sum) per window.

    ``granularities_s`` must be coarsening multiples (each divides the
    next, e.g. [300, 3600, 86400]); window_start is epoch seconds.
    Returns the union of all levels: (level_s, window_start, n_events,
    total_value) with total_value carried as DECIMAL until the caller
    converts — keeping level-to-level re-aggregation exact.
    """
    for fine, coarse in zip(granularities_s, granularities_s[1:]):
        if coarse % fine != 0:
            raise ValueError(
                f"granularity {coarse}s is not a multiple of {fine}s — "
                "coarser levels must re-aggregate whole fine windows"
            )

    g0 = granularities_s[0]
    # Integer DIV, not floor(double division): epoch nanos exceed 2^53, so
    # a double quotient would round window boundaries.
    level = (
        events.groupBy(
            F.expr(f"({ts_col} DIV {g0 * ns_per_unit}) * {g0}").alias("window_start")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast(DEC)).alias("total_value"),
        )
        .withColumn("level_s", F.lit(g0))
    )
    out = level
    for g in granularities_s[1:]:
        # Re-aggregate the previous LEVEL (not raw): counts and decimal
        # sums are algebraic, so this is exact.
        level = (
            level.groupBy(
                F.expr(f"(window_start DIV {g}) * {g}").alias("window_start")
            )
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("total_value").alias("total_value"),
            )
            .withColumn("level_s", F.lit(g))
        )
        out = out.unionByName(level)
    return out.select("level_s", "window_start", "n_events", "total_value")
