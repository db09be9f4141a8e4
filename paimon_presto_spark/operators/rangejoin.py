"""Bucketed interval (range) join: match point events into time intervals
without a nested-loop join — one of the operators the brief's "Spark
lacks it" list names (as-of join being the other; ``queries/events.py``).

A plain ``point BETWEEN start AND end`` join has no equi key, so Spark
falls back to BroadcastNestedLoopJoin — O(|left|·|right|) and a driver
OOM once neither side broadcasts. The standard scale rewrite buckets
time: points land in bucket floor(point/width); each interval explodes
into every bucket it overlaps; the join becomes an equi-join on bucket
id followed by the exact range filter. Each (point, interval) pair can
only meet in the point's own bucket, so the output needs NO dedup.

Cost model: |right| × (avg interval length / width) exploded rows — pick
``bucket_width`` near the typical interval length so the expansion is
O(1) per interval while bucket population stays bounded (the same
width-vs-selectivity trade as any spatial grid join).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str | Column,
    right_start: str | Column,
    right_end: str | Column,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``left`` whose ``left_point`` falls in ``[start, end)``
    of ``right`` rows. Point/bound columns are integer epochs (any unit,
    as long as all three and ``bucket_width`` agree).

    Returns the joined DataFrame with all columns of both sides (the
    internal bucket key is dropped). ``how`` is passed to the equi-join —
    'inner' for matches only.
    """
    p = F.col(left_point) if isinstance(left_point, str) else left_point
    s = F.col(right_start) if isinstance(right_start, str) else right_start
    e = F.col(right_end) if isinstance(right_end, str) else right_end

    lb = left.withColumn("__bucket", F.floor(p / bucket_width))
    # Guard empty intervals: Spark's sequence() counts DOWN when stop <
    # start, which would fabricate buckets for an end <= start interval.
    rb = right.filter(e > s).withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(s / bucket_width), F.floor((e - 1) / bucket_width))),
    )
    return (
        lb.join(rb, "__bucket", how)
        .filter((p >= s) & (p < e))
        .drop("__bucket")
    )
