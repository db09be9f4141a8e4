"""Skew-mitigation utilities for joins at 100 TB.

AQE's skew-join split (enabled in ``session.py``) handles sort-merge skew
at runtime, but two shapes still need manual help:

- a shuffled equi-join where a handful of hot keys dominate (salting:
  split each hot key's rows across N sub-partitions, replicate the other
  side N ways);
- a per-key aggregation with hot groups (two-phase: partial agg on
  (key, salt), final agg on key).

Both transforms are semantics-preserving by construction and pure
DataFrame programs. The salt is ``pmod(xxhash64(monotonic row id), n)`` —
deterministic per run, uniform across sub-partitions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys split across `n_salts`
    shuffle partitions and the right side replicated to match.

    Use when `left` is large with skewed join-key frequencies and `right`
    is too big to broadcast but much smaller than `left` (the classic
    fact-to-mid-size-dim case). Each right row is replicated `n_salts`
    times, so the shuffle grows by `n_salts x |right|` — choose the
    smallest salt count that flattens the hot partitions.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_left = left.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int"),
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    salted_right = right.withColumn(SALT_COL, salts)
    out = salted_left.join(salted_right, on + [SALT_COL], how)
    return out.drop(SALT_COL)


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 8,
) -> DataFrame:
    """Aggregation with a salt-keyed partial phase for hot groups.

    `aggs` maps output column -> a *re-aggregatable* expression builder is
    not needed: only SUM/COUNT/MIN/MAX compose as themselves, so this
    helper accepts those shapes — each value of `aggs` must be one of
    ``F.sum/count/min/max`` over input columns. Spark already performs
    partial aggregation map-side; the extra salt phase matters when a few
    groups are so hot that even their *reduce-side* partitions overflow a
    task — the salt splits each group across `n_salts` reducers first.
    """
    salted = df.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int"),
    )
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[c.alias(f"__p_{name}") for name, c in aggs.items()]
    )
    finals = []
    for name, c in aggs.items():
        fn = c._jc.toString().split("(")[0].lower()
        src = F.col(f"__p_{name}")
        if fn.startswith("count"):
            finals.append(F.sum(src).alias(name))
        elif fn.startswith("sum"):
            finals.append(F.sum(src).alias(name))
        elif fn.startswith("min"):
            finals.append(F.min(src).alias(name))
        elif fn.startswith("max"):
            finals.append(F.max(src).alias(name))
        else:
            raise ValueError(f"non-decomposable aggregate for {name!r}: {fn}")
    return partial.groupBy(*keys).agg(*finals)
