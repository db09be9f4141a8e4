"""Bucketed interval (range) join: match point events into time intervals
without a nested-loop join — one of the operators the brief's "Spark
lacks it" list names (as-of join being the other; ``queries/events.py``).

A plain ``point BETWEEN start AND end`` join has no equi key, so Spark
falls back to BroadcastNestedLoopJoin — O(|left|·|right|) and a driver
OOM once neither side broadcasts. The standard scale rewrite buckets
time: points land in bucket floor(point/width); each interval explodes
into every bucket it overlaps; the join becomes an equi-join on bucket
id with the exact range predicate kept in the join condition. Each
(point, interval) pair can only meet in the point's own bucket, so the
output needs NO dedup.

Bucket ids are computed in 64-bit integer arithmetic (``pmod`` + ``div``),
never via ``floor(p / width)``: epoch-nanosecond values exceed 2^53, so
double division can misround a point near a bucket boundary into the
wrong bucket and silently drop its match (same reason
``events_hierarchical_rollup`` uses integer DIV).

Cost model: |right| × (avg interval length / width) exploded rows — pick
``bucket_width`` near the typical interval length so the expansion is
O(1) per interval while bucket population stays bounded (the same
width-vs-selectivity trade as any spatial grid join).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _floor_div(col: str, width: int) -> Column:
    """floor(col / width) in exact 64-bit integer arithmetic.

    SQL ``div`` truncates toward zero; subtracting the (always
    non-negative) ``pmod`` first makes the numerator an exact multiple of
    ``width``, so truncation equals floor — correct for negative epochs
    too, with no double-precision roundoff.
    """
    return F.expr(f"(({col}) - pmod({col}, {width})) div {width}")


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

    ``how`` may be ``'inner'`` or ``'left'``. The range predicate lives in
    the join condition itself (not a post-join filter), so a left row with
    no containing interval survives null-extended. ``'right'``/``'full'``
    are rejected: intervals are exploded into one row per overlapped
    bucket, so an unmatched interval would be null-extended once per
    bucket — silently wrong — and the explode cannot be undone post-join.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"interval_join supports how='inner'|'left', got {how!r}: exploded "
            "intervals would duplicate null-extended right rows under "
            "right/full outer joins"
        )
    bucket_width = int(bucket_width)
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    p = F.col(left_point) if isinstance(left_point, str) else left_point
    s = F.col(right_start) if isinstance(right_start, str) else right_start
    e = F.col(right_end) if isinstance(right_end, str) else right_end

    lb = left.withColumn("__p", p.cast("long")).withColumn(
        "__lbucket", _floor_div("__p", bucket_width)
    )
    # Guard empty intervals: Spark's sequence() counts DOWN when stop <
    # start, which would fabricate buckets for an end <= start interval.
    rb = (
        right.filter(e > s)
        .withColumn("__s", s.cast("long"))
        .withColumn("__e", e.cast("long"))
        .withColumn(
            "__rbucket",
            F.explode(
                F.sequence(
                    _floor_div("__s", bucket_width),
                    _floor_div("__e - 1", bucket_width),
                )
            ),
        )
    )
    cond = (
        (lb["__lbucket"] == rb["__rbucket"])
        & (lb["__p"] >= rb["__s"])
        & (lb["__p"] < rb["__e"])
    )
    return lb.join(rb, cond, how).drop("__p", "__lbucket", "__s", "__e", "__rbucket")
