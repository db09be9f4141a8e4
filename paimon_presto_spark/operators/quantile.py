"""Scale-safe exact weighted quantiles (weighted median and friends).

The textbook SQL spelling — a running ``SUM(weight) OVER (PARTITION BY
group ORDER BY value)`` then the first row where the cumulative weight
crosses q x total — is correct but puts EVERY row of a group through one
window task: with a handful of groups (the common "median price weighted
by volume per flag" shape) each group is a single serial pass, the same
global-sort bottleneck ``operators/selection.py`` dismantles for
budgeted selection. This module generalizes that decomposition from
"prefix until a budget" to "prefix until a quantile threshold":

1. per-group stats (one aggregation) find each group's value range and
   population;
2. every row maps to a value-range bucket (map-side arithmetic — the
   bucket is a monotone function of the value, so bucket order refines
   value order);
3. per-(group, bucket) weight totals prefix-sum along the bucket axis —
   a window over at most ``n_buckets`` rows PER GROUP, never over rows —
   locating, for EACH requested quantile, the one bucket where its
   threshold is crossed and the exact cumulative weight entering it;
4. only those edge buckets run an exact per-row pass, bounded by
   ``target_edge_rows``; an oversized edge (skew, heavy value ties with
   distinct values) recurses the SAME decomposition into the bucket with
   the threshold rebased by the entering weight.

Everything stays distributed: group stats, bucket sums, and cutoff rows
are all DataFrames keyed by the group columns — no per-group driver
tables, so group cardinality is unbounded. The only driver actions are
one scalar per recursion level (the largest pending group's row count,
which decides whether to recurse) plus the top-level validity counts.
Multiple quantiles of the same (value, weight) pair share the persisted
input, the group stats, and the level-0 bucket sums — the corpus is
bucketed ONCE however many quantiles are requested; only the (small)
edge passes are per-quantile.

Exactness: weights accumulate as DECIMAL(28,10) and the crossing test is
``q_den * cum >= q_num * total`` in pure decimal/integer arithmetic — no
float ever enters the decision, so any rational quantile (median = 1/2,
quartiles = 1/4, 3/4, ...) is exact and reproducible, matching the
DuckDB oracle's window spelling bit-for-bit. The returned value is the
LOWER weighted quantile: the smallest value v such that the total weight
of rows with value <= v reaches q x total weight. With non-negative
weights that value is deterministic regardless of intra-tie row order
(cumulative weight is non-decreasing), which is why only the value — not
a winning row — is returned.

Reference surface: the percentile family of the host engine
(``PrestoDistributedQueryTest.java:139`` exercises approx_percentile;
weighted variants are the same contract with a weight column), re-built
here as the scale shape a 100 TB corpus needs for token-weighted stats.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from paimon_presto_spark.operators.selection import (
    TARGET_EDGE_ROWS,
    _MAX_DEPTH,
    _auto_buckets,
)

_DEC = "decimal(28,10)"

# The narrow (group, value, weight) projection is consumed by several
# passes (validity, totals, per-level stats / bucket sums / edge joins) —
# uncached, every pass replays the full input lineage. Same
# release-ledger pattern as operators/dedup.py's chunk caches: the result
# is lazy so the cache can't drop inside the operator; each new call
# evicts the previous one and release_quantile_caches() empties the
# ledger.
_QUANTILE_CACHES: list[DataFrame] = []

#: Broadcast group-keyed frames (stats/thresholds/cutoffs) below this
#: measured group count; above it, AQE decides (many groups shuffle fine).
_BROADCAST_GROUP_BOUND = 1_000_000


def release_quantile_caches() -> None:
    """Unpersist intermediates cached by earlier weighted-quantile calls.

    Safe anytime: an unpersisted lazy plan recomputes, never misanswers.
    """
    while _QUANTILE_CACHES:
        _QUANTILE_CACHES.pop().unpersist(False)


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: list[str],
    quantiles: list[tuple[int, int, str]],
    target_edge_rows: int = TARGET_EDGE_ROWS,
) -> DataFrame:
    """Exact lower weighted quantiles of ``value_col`` per group,
    weighting each row by ``weight_col``. ``quantiles`` is a list of
    ``(q_num, q_den, out_col)`` — e.g. ``[(1, 4, "q25"), (3, 4, "q75")]``
    — all computed in ONE shared decomposition over the input.

    Returns one row per group: ``(*group_cols, *out_cols,
    total_weight_dec)`` where each out column is the smallest value whose
    cumulative weight (ascending value order) satisfies
    ``q_den * cum >= q_num * total``, and ``total_weight_dec`` is the
    group's DECIMAL(28,10) weight total.

    Contract: ``0 < q_num <= q_den`` per quantile; weights must be
    non-negative (a negative weight breaks the monotone cumulative sum
    the crossing test rests on) — NULL weights count as 0; values must be
    non-NULL (a NULL value has no place in the value order). Violations
    raise with the offending counts.
    """
    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    names = [name for _, _, name in quantiles]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate quantile out_cols: {names}")
    reserved = set(group_cols) | {"total_weight_dec"}
    clashes = [n for n in names if n in reserved]
    if clashes:
        raise ValueError(
            f"quantile out_cols {clashes} collide with group columns or "
            f"the reserved 'total_weight_dec' output column"
        )
    for q_num, q_den, name in quantiles:
        if not 0 < q_num <= q_den:
            raise ValueError(
                f"quantile {name!r} must satisfy 0 < q_num <= q_den, "
                f"got {q_num}/{q_den}"
            )
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    from pyspark import StorageLevel

    w = F.coalesce(F.col(weight_col).cast(_DEC), F.lit(0).cast(_DEC))
    release_quantile_caches()
    base = df.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        w.alias("__w"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _QUANTILE_CACHES.append(base)
    # Level-0 group stats and the group weight totals share one
    # aggregation over one pass of the base (same groupBy key): totals,
    # the thresholds derived from them, and the validity counts all read
    # the persisted stats instead of re-scanning the corpus — the thr /
    # final-join consumers used to trigger one base pass EACH.
    stats0 = (
        base.groupBy(*group_cols)
        .agg(
            F.min("__v").alias("__mn"),
            F.max("__v").alias("__mx"),
            F.count(F.lit(1)).alias("__n"),
            F.sum("__w").alias("__tw"),
            F.sum(F.col("__v").isNull().cast("long")).alias("__vn"),
            F.sum((F.col("__w") < 0).cast("long")).alias("__wn"),
            F.sum(
                sum(
                    (F.col(g).isNull().cast("long") for g in group_cols),
                    F.lit(0),
                )
            ).alias("__gn"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _QUANTILE_CACHES.append(stats0)
    totals = stats0.select(
        *group_cols, F.col("__tw").alias("total_weight_dec")
    )
    # one threshold row per (group, quantile): crossing condition is
    # __den * cum >= __rhs, rebased down the recursion as
    # rhs' = rhs - den * (weight entering the edge bucket)
    thr = None
    for qid, (q_num, q_den, _) in enumerate(quantiles):
        t = totals.select(
            *group_cols,
            F.lit(qid).alias("__qid"),
            F.lit(q_den).alias("__den"),
            (F.lit(q_num) * F.col("total_weight_dec")).alias("__rhs"),
        )
        thr = t if thr is None else thr.unionByName(t)
    located = _locate_crossing(
        base,
        group_cols,
        thr,
        target_edge_rows,
        _depth=0,
        _n_quantiles=len(quantiles),
        _validate=(value_col, weight_col),
        _stats=stats0,
    )
    # Materialize the (tiny: groups x quantiles rows) crossing table ONCE.
    # Joined lazily per quantile below, its whole multi-level subtree —
    # done-unions, edge passes, threshold joins — would re-evaluate per
    # join side at the final action (Spark shares no subplans across join
    # inputs); persisted and eagerly counted, it runs once against the
    # build-time caches and every join side reads the cache. persist (not
    # localCheckpoint) keeps the decomposition visible in the final plan.
    located = located.persist(StorageLevel.MEMORY_AND_DISK)
    _QUANTILE_CACHES.append(located)
    located.count()
    out = totals
    for qid, (_, _, name) in enumerate(quantiles):
        out = out.join(
            located.filter(F.col("__qid") == qid).select(
                *group_cols, F.col("__v").alias(name)
            ),
            group_cols,
        )
    return out.select(*group_cols, *names, "total_weight_dec")


def weighted_quantile(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: list[str],
    q_num: int = 1,
    q_den: int = 2,
    out_col: str = "quantile_value",
    target_edge_rows: int = TARGET_EDGE_ROWS,
) -> DataFrame:
    """Single exact lower weighted q-quantile (q = ``q_num``/``q_den``)
    per group — ``weighted_quantiles`` with one entry."""
    return weighted_quantiles(
        df,
        value_col,
        weight_col,
        group_cols,
        [(q_num, q_den, out_col)],
        target_edge_rows=target_edge_rows,
    )


def weighted_median(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: list[str],
    out_col: str = "weighted_median",
    target_edge_rows: int = TARGET_EDGE_ROWS,
) -> DataFrame:
    """Lower weighted median per group — ``weighted_quantile`` at 1/2."""
    return weighted_quantile(
        df,
        value_col,
        weight_col,
        group_cols,
        q_num=1,
        q_den=2,
        out_col=out_col,
        target_edge_rows=target_edge_rows,
    )


def _locate_crossing(
    base: DataFrame,
    group_cols: list[str],
    thr: DataFrame,
    target_edge_rows: int,
    _depth: int,
    _n_quantiles: int = 1,
    _validate: tuple[str, str] | None = None,
    _stats: DataFrame | None = None,
) -> DataFrame:
    """One row per (group, __qid): the smallest ``__v`` where
    ``__den * cum(__w)`` (ascending-``__v`` cumulative weight within the
    group) reaches that quantile's ``__rhs`` threshold.

    ``base`` = (*group_cols, __v, __w) at level 0 — the row set is shared
    by every quantile, so stats and bucket sums are computed once per
    GROUP and fanned out to quantiles only at the threshold join. Deeper
    levels carry ``__qid`` in ``base`` (each quantile descended into its
    own edge bucket), making the compound (group, qid) the effective
    group. ``thr`` = (*group_cols, __qid, __den, __rhs) at every level.
    """
    from pyspark import StorageLevel

    per_qid = "__qid" in base.columns
    key = [*group_cols, "__qid"] if per_qid else list(group_cols)
    # Persisted (ledgered): the stats feed the scalar collect DURING the
    # build and the done/open splits again at the final collect — without
    # the persist each consumer replays the aggregation chain. The
    # level-0 caller passes its stats in (``_stats``): that aggregation
    # additionally carries the group weight totals and validity counts,
    # so one pass populates the base cache, the stats cache, the totals,
    # AND validates the contract — no standalone validity or totals scan.
    if _stats is not None:
        stats = _stats
    else:
        stats = base.groupBy(*key).agg(
            F.min("__v").alias("__mn"),
            F.max("__v").alias("__mx"),
            F.count(F.lit(1)).alias("__n"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _QUANTILE_CACHES.append(stats)
    # Groups that cannot subdivide are already answered: one distinct
    # value means the crossing value IS that value for every quantile
    # (cum only steps at value boundaries and rhs <= den * total by
    # contract).
    done_stats = stats.filter(F.col("__mx") <= F.col("__mn"))
    if per_qid:
        done = done_stats.select(*key, F.col("__mn").alias("__v"))
    else:
        done = done_stats.join(
            thr.select(*group_cols, "__qid"), group_cols
        ).select(*group_cols, "__qid", F.col("__mn").alias("__v"))
    # drop the totals + ALL validation columns (validation already raised
    # above) so none of them ride the broadcast into the per-row bucket join
    open_stats = stats.filter(F.col("__mx") > F.col("__mn")).drop(
        "__tw", "__vn", "__wn", "__gn"
    )
    scalar_aggs = [
        F.max(F.when(F.col("__mx") > F.col("__mn"), F.col("__n"))).alias(
            "mx_n"
        ),
        F.sum((F.col("__mx") > F.col("__mn")).cast("long")).alias("n_groups"),
    ]
    if _validate is not None:
        scalar_aggs += [
            F.sum("__vn").alias("vn"),
            F.sum("__wn").alias("wn"),
            F.sum("__gn").alias("gn"),
        ]
    scalar_aggs += [F.count(F.lit(1)).alias("n_all")]
    scalars = stats.select(*scalar_aggs).collect()[0]
    if _validate is not None and (
        scalars["vn"] or scalars["wn"] or scalars["gn"]
    ):
        value_col, weight_col = _validate
        raise ValueError(
            f"weighted_quantiles: {scalars['vn']} NULL {value_col!r} "
            f"values / {scalars['wn']} negative {weight_col!r} weights / "
            f"{scalars['gn']} NULL group-key cells; filter or impute "
            f"them first (NULL values have no rank; negative weights "
            f"break the monotone cumulative sum; NULL group keys would "
            f"silently drop through the internal equi-joins)"
        )
    if not scalars["n_groups"]:
        return done

    # Group-keyed frames (stats, thresholds, cutoffs) are group-count-
    # sized. With FEW groups a plain equi-join would shuffle the entire
    # row set into |groups| partitions — 3 serial tasks for a 3-flag
    # median, the very bottleneck this decomposition removes — so they
    # broadcast whenever the measured size is driver-safe; past the bound
    # the hint is withheld and AQE chooses (many groups also means the
    # shuffle parallelizes fine). The gate measures ALL stats rows x
    # quantiles — thr carries one row per (group, quantile) over every
    # group including single-valued 'done' ones, so gating on the open
    # subset alone could force-broadcast a frame as large as the corpus'
    # group count.
    def bc(small: DataFrame) -> DataFrame:
        return (
            F.broadcast(small)
            if scalars["n_all"] * _n_quantiles <= _BROADCAST_GROUP_BOUND
            else small
        )

    if scalars["mx_n"] <= target_edge_rows or _depth >= _MAX_DEPTH:
        return done.unionByName(
            _exact_crossing(base, group_cols, key, thr, open_stats, bc)
        )
    nb = _auto_buckets(scalars["mx_n"], target_edge_rows)
    # monotone value->bucket map per group (IEEE sub/div/mul by positive
    # constants are weakly monotone, so bucket order refines value order;
    # ties can only MERGE buckets, never reorder) — same rule as
    # selection.py's score buckets
    rows = base.join(bc(open_stats), key).withColumn(
        "__bkt",
        F.least(
            F.lit(nb - 1),
            F.floor(
                (F.col("__v").cast("double") - F.col("__mn").cast("double"))
                / (F.col("__mx").cast("double") - F.col("__mn").cast("double"))
                * nb
            ),
        ).cast("int"),
    )
    # Persisted (ledgered): one pass over the cached base produces every
    # bucket's weight AND row count; the max row count (one tiny collect)
    # bounds EVERY possible edge bucket, so when it fits the exact pass
    # runs immediately — no per-level stats round over the edge rows.
    per_bucket = (
        rows.groupBy(*key, "__bkt")
        .agg(F.sum("__w").alias("__bw"), F.count(F.lit(1)).alias("__bn"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _QUANTILE_CACHES.append(per_bucket)
    mx_bn = per_bucket.select(F.max("__bn")).collect()[0][0]
    # prefix-sum along the bucket axis: a window over <= nb rows per
    # group — bounded per task whatever the corpus size
    wb = (
        Window.partitionBy(*key)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_b = per_bucket.withColumn("__cumw", F.sum("__bw").over(wb))
    cut = (
        cum_b.join(bc(thr), key if per_qid else group_cols)
        .filter(F.col("__den") * F.col("__cumw") >= F.col("__rhs"))
        .groupBy(*group_cols, "__qid")
        .agg(
            F.min_by(
                F.struct("__bkt", "__cumw", "__bw", "__den", "__rhs"),
                "__bkt",
            ).alias("c")
        )
        .select(
            *group_cols,
            "__qid",
            F.col("c.__bkt").alias("__bkt"),
            F.col("c.__den").alias("__den"),
            # threshold rebased by the weight entering the edge bucket
            (
                F.col("c.__rhs")
                - F.col("c.__den") * (F.col("c.__cumw") - F.col("c.__bw"))
            ).alias("__rhs"),
        )
    )
    # the edge join fans rows out per quantile (a row duplicates only
    # when two quantiles' edges land in the same bucket); at level 0 rows
    # carry no __qid, so the join key is (group, bucket) and __qid
    # arrives from cut's projection
    edge_key = (
        [*group_cols, "__qid", "__bkt"] if per_qid else [*group_cols, "__bkt"]
    )
    edge = rows.join(
        bc(cut.select(*group_cols, "__qid", "__bkt")), edge_key
    ).select(*group_cols, "__qid", "__v", "__w")
    thr2 = cut.select(*group_cols, "__qid", "__den", "__rhs")
    if mx_bn <= target_edge_rows or _depth + 1 >= _MAX_DEPTH:
        # every bucket (hence every edge) is already bounded — run the
        # exact pass directly, no deeper stats round, no extra persist
        return done.unionByName(
            _exact_crossing(
                edge, group_cols, [*group_cols, "__qid"], thr2, None, bc
            )
        )
    edge = edge.persist(StorageLevel.MEMORY_AND_DISK)
    # Ledgered: the next level's stats collect materializes the edge
    # during the build; unpersisted, the final collect would replay the
    # bucket pass and both joins that produced it.
    _QUANTILE_CACHES.append(edge)
    deeper = _locate_crossing(
        edge, group_cols, thr2, target_edge_rows, _depth + 1,
        _n_quantiles=1,  # deeper stats rows are (group, qid) pairs already
    )
    return done.unionByName(deeper)


def _exact_crossing(
    base: DataFrame,
    group_cols: list[str],
    key: list[str],
    thr: DataFrame,
    open_stats: DataFrame | None,
    bc,
) -> DataFrame:
    """Exact per-row pass for the groups in ``open_stats``: a running-sum
    window partitioned by the group key — each group is one task, which
    is exactly why callers bound its input to ``target_edge_rows``
    first. Returns (*group_cols, __qid, __v)."""
    per_qid = "__qid" in base.columns
    pending = (
        base
        if open_stats is None  # caller already restricted the rows
        else base.join(bc(open_stats.select(*key)), key)
    )
    wv = (
        Window.partitionBy(*key)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pending.withColumn("__cum", F.sum("__w").over(wv))
    return (
        cum.join(bc(thr), key if per_qid else group_cols)
        .filter(F.col("__den") * F.col("__cum") >= F.col("__rhs"))
        .groupBy(*group_cols, "__qid")
        .agg(F.min("__v").alias("__v"))
    )
