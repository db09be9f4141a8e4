"""Budgeted corpus selection: take the best-scoring documents until a
global weight budget (token count) is exhausted.

The naive spelling — ``SUM(weight) OVER (ORDER BY score DESC)`` then
``WHERE cum <= budget`` — is correct but puts the ENTIRE corpus through
one unpartitioned window: a single task owns the running total, the
classic global-sort bottleneck at 100 TB. ``select_until_budget``
computes the same selection with bounded per-task work:

1. one tiny aggregation finds the score range and row count; every row
   maps to one of ``n_buckets`` score-range buckets (map-side
   arithmetic, no shuffle). ``n_buckets`` is sized from the corpus —
   ``max(64, ceil(rows / target_edge_rows))`` — so the EXPECTED cutoff
   bucket stays one healthy task no matter the corpus size (round 4
   hard-coded 64 buckets, which put ~1.5 TB through the single edge
   window at 100 TB);
2. per-bucket weight totals (one shuffle to ``n_buckets`` rows) prefix-
   sum on the DRIVER — the only serial step, O(n_buckets);
3. buckets strictly better than the cutoff bucket are selected whole
   (map-side filter); only the ONE cutoff bucket runs an exact
   running-total window, offset by the driver's prefix. If skew or
   score ties leave that bucket larger than ``target_edge_rows``, the
   SAME decomposition recurses into it (finer score sub-ranges; pure
   score ties sub-range on the numeric id instead, which refines the
   (score DESC, id ASC) tiebreak order) until the exact pass is
   bounded.

Rows with equal scores share a bucket (the bucket is a function of the
score alone — and, one recursion level deeper, of the id that breaks
their tie), so the bucket order refines the global (score DESC, id)
order and the composition equals the single-window answer exactly —
which is how the DuckDB oracle states it.

Same decomposition pattern as two-phase skew aggregation: turn one
global serial pass into (parallel partials) + (driver-size prefix) +
(one bounded exact pass).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import NumericType

from paimon_presto_spark.functions.hashing import md5_long, single_partition_key
from paimon_presto_spark.functions.numeric import decimal_squeeze

#: Upper bound on the rows the exact edge window may own in one task.
#: ~2M (id, score, weight) rows is tens of MB — comfortably one task.
TARGET_EDGE_ROWS = 2_000_000

#: Recursion backstop: each level divides the edge bucket by >=64, so
#: real corpora terminate in 1-2 levels; 8 covers any adversarial skew.
_MAX_DEPTH = 8


def _auto_buckets(n_rows: int, target_edge_rows: int) -> int:
    """Bucket-count rule: enough buckets that the EXPECTED bucket holds
    at most ``target_edge_rows`` rows, never fewer than 64. The driver
    prefix-sum stays O(buckets) — 50k entries for 1e11 rows."""
    return max(64, math.ceil(n_rows / max(1, target_edge_rows)))


def select_until_budget(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    budget: int,
    id_col: str,
    n_buckets: int | None = None,
    target_edge_rows: int = TARGET_EDGE_ROWS,
    _depth: int = 0,
) -> DataFrame:
    """Rows whose running ``weight_col`` total — accumulated in
    (``score_col`` DESC, ``id_col`` ASC) order, inclusive of the current
    row — stays within ``budget``. Weights must be integers (the budget
    comparison is exact, never float-accumulated).

    ``n_buckets=None`` (the default) sizes the bucket count from the
    corpus via ``_auto_buckets``; pass an explicit value only to pin a
    test shape.
    """
    id_numeric = isinstance(df.schema[id_col].dataType, NumericType)
    aggs = [
        F.min(score_col).alias("mn"),
        F.max(score_col).alias("mx"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(score_col).isNull().cast("long")).alias("score_nulls"),
        F.sum(F.col(id_col).isNull().cast("long")).alias("id_nulls"),
    ]
    if id_numeric:
        aggs += [F.min(id_col).alias("imn"), F.max(id_col).alias("imx")]
    stats = df.agg(*aggs).collect()[0]
    if stats["n"] == 0:
        return df.limit(0)
    # NULL scores have no place in the (score DESC, id ASC) selection
    # order, and NULL ids break the tie-break; both would otherwise
    # surface as an opaque TypeError (None comparisons) or a NULL __bkt
    # key deep inside the decomposition. Fail with an actionable message.
    if stats["score_nulls"] or stats["id_nulls"]:
        raise ValueError(
            f"select_until_budget: NULL values in "
            f"{score_col!r} ({stats['score_nulls']}) / "
            f"{id_col!r} ({stats['id_nulls']}); filter or impute them "
            f"before selection (a NULL score has no rank and a NULL id "
            f"cannot break ties)"
        )
    mn, mx = stats["mn"], stats["mx"]
    nb = n_buckets if n_buckets is not None else _auto_buckets(
        stats["n"], target_edge_rows
    )
    # Pick the bucket key. Score sub-ranges whenever scores still spread;
    # a pure score tie (every row identical) sub-ranges on the id that
    # breaks the tie instead — floor of a monotone map, so buckets always
    # refine the (score DESC, id ASC) selection order. Double rounding on
    # huge int64 ids can only MERGE adjacent buckets, never reorder them.
    divisible = True
    if mx > mn:
        span = mx - mn
        bucket = F.least(
            F.lit(nb - 1),
            F.floor((F.lit(mx) - F.col(score_col)) / F.lit(span) * nb),
        ).cast("int")
    elif id_numeric and stats["imx"] > stats["imn"]:
        ispan = stats["imx"] - stats["imn"]
        bucket = F.least(
            F.lit(nb - 1),
            F.floor(
                (F.col(id_col) - F.lit(stats["imn"]))
                / F.lit(float(ispan)) * nb
            ),
        ).cast("int")
    else:
        # One score, indivisible id (single row, or non-numeric ids):
        # nothing to decompose — the exact pass takes the whole input.
        bucket = F.lit(0)
        divisible = False
    b = df.withColumn("__bkt", bucket)
    # NULL weights count as 0 (the row is selected whenever the budget is
    # not yet exhausted, and never advances the total) — uniformly, in
    # both the whole-bucket and edge-bucket paths. Note this is saner
    # than the raw SQL window spelling, where a NULL-weight PREFIX makes
    # the running total NULL and silently drops those rows.
    per_bucket = {
        r["__bkt"]: (r["w"] or 0, r["c"])
        for r in b.groupBy("__bkt")
        .agg(F.sum(weight_col).alias("w"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    prefix = 0
    cutoff_bucket, cutoff_offset, cutoff_rows = None, 0, 0
    for i in sorted(per_bucket):
        w, c = per_bucket[i]
        if prefix + w > budget:
            cutoff_bucket, cutoff_offset, cutoff_rows = i, prefix, c
            break
        prefix += w
    if cutoff_bucket is None:  # whole corpus fits the budget
        return b.drop("__bkt")
    whole = b.filter(F.col("__bkt") < cutoff_bucket).drop("__bkt")
    edge_in = b.filter(F.col("__bkt") == cutoff_bucket).drop("__bkt")
    if divisible and cutoff_rows > target_edge_rows and _depth < _MAX_DEPTH:
        # The cutoff bucket is still oversized (skewed scores / ties):
        # recurse the identical decomposition with the residual budget.
        edge = select_until_budget(
            edge_in,
            score_col,
            weight_col,
            budget - cutoff_offset,
            id_col,
            n_buckets=None,
            target_edge_rows=target_edge_rows,
            _depth=_depth + 1,
        )
    else:
        # Exact pass over a bounded bucket. The constant partition key
        # keeps WindowExec's partition spec non-empty (silencing the
        # "No Partition Defined" warning) without changing execution:
        # this stage is intentionally one task over <= target_edge_rows.
        # (F.lit(0) does NOT work here: Catalyst folds it away and the
        # warning returns — hence the non-foldable hash(id) % 1 key.)
        w = (
            Window.partitionBy(single_partition_key(id_col))
            .orderBy(F.desc(score_col), F.asc(id_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        edge = (
            edge_in.withColumn(
                "__cum",
                F.sum(F.coalesce(F.col(weight_col), F.lit(0))).over(w)
                + F.lit(cutoff_offset),
            )
            .filter(F.col("__cum") <= budget)
            .drop("__cum")
        )
    return whole.unionByName(edge)


def _priority_expr(weight_col: str, id_col: str):
    """The shared priority expression: w / u with u = (md5(id)+1)/2^60.

    Single-sourced on purpose — this exact IEEE expression tree (int->
    double casts and two divisions, no transcendentals) is what the
    DuckDB oracles replay bit-for-bit; both sampling variants and both
    oracle SQL spellings must track the same formula.
    """
    u = (md5_long(F.col(id_col).cast("string")) + 1).cast("double") / F.lit(
        float(1 << 60)
    )
    return F.col(weight_col).cast("double") / u


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via priority sampling
    (Duffield–Lund–Thorup, "Priority sampling for estimation of arbitrary
    subset sums", JACM 2007): each row gets priority w / u with
    u ~ Uniform(0, 1], and the k highest-priority rows form the sample —
    heavier rows are proportionally likelier, no row appears twice, and
    (with the (k+1)-th priority as threshold) the sample supports
    unbiased subset-sum estimation.

    Determinism contract: u is hash-derived, not random —
    u = (md5(id)[60 bits] + 1) / 2^60, so the sample is reproducible
    across engines, runs, and cluster sizes, and a DuckDB oracle can
    replay it exactly. Priorities use only IEEE correctly-rounded ops
    (int→double casts and two divisions; no transcendentals), so
    cross-engine priority ORDER is bit-stable — the property the hash
    gate rests on. (Efraimidis–Spirakis keys u^(1/w) would need pow(),
    whose libm rounding differs across engines.)

    100 TB shape: the priority is a pure map over the scan; the top-k is
    ``ORDER BY … LIMIT k`` which Spark executes as TakeOrderedAndProject
    — per-partition heaps of size k, then a driver merge of the
    per-partition winners. No global sort, no shuffle of the corpus.

    Rows with NULL or non-positive weight are excluded (they have zero
    inclusion probability by definition). Returns the sampled rows with
    ``priority`` and ``rnk`` (1 = highest priority) columns appended.
    """
    top = (
        df.filter(F.col(weight_col) > 0)
        .withColumn("priority", _priority_expr(weight_col, id_col))
        .orderBy(F.desc("priority"), F.asc(id_col))
        .limit(k)
    )
    # rank over the k winners only (constant partition key: this window
    # is intentionally one tiny task over k rows)
    w = Window.partitionBy(single_partition_key(id_col)).orderBy(
        F.desc("priority"), F.asc(id_col)
    )
    return top.withColumn("rnk", F.row_number().over(w))


def dsir_importance_weights(
    docs: DataFrame,
    is_target,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): score every document by how target-like its hashed
    unigram distribution is. Returns (doc_id, n_tokens, weight_dec) where
    ``weight_dec`` = Σ_tokens ln(p_target(bucket) / p_raw(bucket)) as a
    DECIMAL(28,10) — higher = more target-like; resample the corpus
    proportionally (e.g. feed the weights to ``priority_sample``).

    ``is_target`` is a boolean Column marking the in-domain rows (the
    small high-quality corpus whose distribution we want to match);
    ``p_target`` / ``p_raw`` are add-one-smoothed hashed-unigram models
    over ``n_buckets`` md5-derived buckets (the paper's hashed n-gram
    features at n=1; md5 keeps the bucketing engine-portable).

    Scale shape at 100 TB: tokens map to integer buckets in the scan
    (text never shuffles — only (doc, bucket, count) triples); both
    feature models are ONE map-side-combined aggregation down to
    ``n_buckets`` rows, broadcast back as the log-ratio table; the
    per-document weight is a decimal SUM keyed by doc. Two corpus scans,
    one bounded broadcast, no UDFs, nothing quadratic.

    Determinism: bucket counts and totals are exact integers; the two
    smoothed probabilities and their ratio are correctly-rounded double
    divisions written in the oracle's exact shape; ln() is squeezed
    through DECIMAL(28,10); per-token contributions aggregate as
    (count × log-ratio) products summed in DECIMAL, so partial-agg order
    cannot matter.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        is_target.alias("__tgt"),
        F.explode(F.split(F.col(text_col), " ")).alias("wd"),
    ).filter(F.col("wd") != "")
    bucketed = toks.select(
        "doc_id", "__tgt", (md5_long("wd") % n_buckets).alias("bkt")
    )
    per_doc = bucketed.groupBy("doc_id", "bkt").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    model = bucketed.groupBy("bkt").agg(
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )
    totals = model.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    logratio = (
        model.crossJoin(F.broadcast(totals))
        .withColumn(
            "lr",
            decimal_squeeze(
                F.log(
                    (
                        (F.col("ct") + F.lit(1.0))
                        / (F.col("tt") + F.lit(float(n_buckets)))
                    )
                    / (
                        (F.col("cr") + F.lit(1.0))
                        / (F.col("tr") + F.lit(float(n_buckets)))
                    )
                )
            ),
        )
        .select("bkt", "lr")
    )
    return (
        per_doc.join(F.broadcast(logratio), "bkt")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(
                (F.col("cnt").cast("double") * F.col("lr")).cast(
                    "decimal(28,10)"
                )
            ).alias("weight_dec"),
        )
    )


def priority_sample_per_group(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Weighted sampling without replacement, ``k`` rows PER GROUP — the
    per-domain variant of ``priority_sample`` (same Duffield–Lund–Thorup
    priorities, same hash-derived determinism contract): how a mixing
    pipeline downsamples each source to a quota while keeping heavy
    documents proportionally likelier WITHIN their source.

    100 TB shape: the priority is a pure map; the per-group top-k is a
    rank window that Spark executes with WindowGroupLimit pushdown —
    per-partition top-k heaps per group BEFORE the shuffle, so the
    exchange carries at most k rows per (partition, group), never the
    corpus. No driver state, group cardinality unbounded.

    Rows with NULL or non-positive weight are excluded (zero inclusion
    probability). Returns the sampled rows with ``priority`` and ``rnk``
    (1 = highest priority within the group) appended.
    """
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("priority"), F.asc(id_col)
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("priority", _priority_expr(weight_col, id_col))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
