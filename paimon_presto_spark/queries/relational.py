"""Relational query surface: TPC-H-shaped queries + per-operator coverage.

Maps SURVEY.md §2.2 (the host-engine surface the reference is tested to
serve via ``PrestoDistributedQueryTest`` /
``AbstractTestDistributedQueries``) onto idiomatic Spark DataFrame
programs. Each query carries a DuckDB oracle; determinism conventions are
documented in ``queries/__init__``.

Scale notes (these run against 100 TB fact tables in production):
- ``nation``/``region`` (and other genuinely small dims) are explicitly
  ``broadcast()`` so fact-table scans never shuffle for them.
- Aggregations are expressed as single groupBy/agg passes → Catalyst emits
  partial (map-side) + final hash aggregation automatically.
- Top-k uses ``orderBy().limit()`` → ``TakeOrderedAndProject`` (no global
  sort materialization).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from paimon_presto_spark.functions.hashing import md5_long
from paimon_presto_spark.functions.numeric import DEC
from paimon_presto_spark.queries import register
from paimon_presto_spark.sources.testdata import load_table


def dsum(c: Column, alias: str) -> Column:
    """Order-independent, engine-independent SUM over doubles.

    Each addend is cast to DECIMAL(28,10) so the summation is exact integer
    arithmetic (no float reassociation under partial aggregation). The final
    decimal→double conversion goes **through a string**: both Spark
    (Double.parseDouble) and DuckDB (fast_float) parse decimal strings with
    correct rounding, whereas their native decimal→double converters differ
    by 1 ulp once the scaled integer exceeds 2^53.
    """
    return F.sum(c.cast(DEC)).cast("string").cast("double").alias(alias)


def davg(c: Column, alias: str) -> Column:
    """Order-independent AVG over doubles (same exact-decimal path)."""
    return (F.sum(c.cast(DEC)).cast("string").cast("double") / F.count(c)).alias(alias)


def o_dsum(expr: str, alias: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)"
        f" AS {alias}"
    )


def o_davg(expr: str, alias: str) -> str:
    return (
        f"(CAST(CAST(SUM(CAST({expr} AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)"
        f" / COUNT({expr})) AS {alias}"
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped analytical queries
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {o_dsum('l_quantity', 'sum_qty')},
               {o_dsum('l_extendedprice', 'sum_base_price')},
               {o_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
               {o_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
               {o_davg('l_quantity', 'avg_qty')},
               {o_davg('l_extendedprice', 'avg_price')},
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("aggregation", "groupby", "filter"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: scan-heavy group-by with derived measures.

    SURVEY §2.2 Aggregations (SUM/AVG/COUNT over Paimon tables,
    ``TestPrestoITCase.java:395``, ``PrestoDistributedQueryTest.java:329``).
    Single shuffle on (returnflag, linestatus); partial aggregation makes the
    map side do almost all work — at 100 TB the shuffle moves only
    |groups| × |tasks| rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_extendedprice"), "avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
        SELECT l.l_orderkey,
               {o_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
               CAST(o.o_orderdate AS DATE) AS o_orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    tags=("join", "aggregation", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + group + top-k by revenue.

    SURVEY §2.2 Joins (``testComplexQuery``
    ``PrestoDistributedQueryTest.java:279``). The customer filter shrinks the
    build side before the join; top-k compiles to TakeOrderedAndProject.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1998-03-15 00:00:00'")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.expr("TIMESTAMP_NTZ '1998-03-15 00:00:00'")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("o_orderdate"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_revenue",
    oracle=f"""
        SELECT n.n_name,
               {o_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n_name
    """,
    tags=("join", "broadcast", "aggregation"),
)
def q5_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: six-table join with explicit broadcast of tiny dims.

    SURVEY §2.2 Joins (join chains ``PrestoDistributedQueryTest.java:979``).
    ``nation``/``region``/``supplier`` are broadcast — the 100 TB fact side
    shuffles once, on the orders/lineitem equi-key.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q6_revenue_forecast",
    oracle=f"""
        SELECT {o_dsum('l_extendedprice * l_discount', 'revenue')},
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    tags=("filter", "aggregation", "pushdown"),
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter+aggregate — the predicate-pushdown showcase.

    SURVEY §2.2 Filters (``testFilter`` ``TestPrestoITCase.java:399-402``;
    pushdown A7/A8 ``PrestoFilterConverter.java:71-186``). All four
    predicates reach the parquet scan (row-group stats skipping), mirroring
    the reference's file-skipping-before-split-generation behavior.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q10_returned_items",
    oracle=f"""
        SELECT c.c_custkey, c.c_name,
               {o_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
               n.n_name
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    tags=("join", "aggregation", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue ranking (join + group + top-k)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_orders",
    oracle=f"""
        SELECT c.c_custkey, o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS o_orderdate,
               {o_dsum('t.sum_qty', 'total_qty')}
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN (
            SELECT l_orderkey,
                   {o_dsum('l_quantity', 'sum_qty')}
            FROM lineitem
            GROUP BY l_orderkey
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) > 150
        ) t ON o.o_orderkey = t.l_orderkey
        GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate
        ORDER BY total_qty DESC, o_orderkey
        LIMIT 20
    """,
    tags=("join", "aggregation", "having", "subquery"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: HAVING-filtered aggregate subquery joined back to orders.

    SURVEY §2.2 Aggregations/HAVING (``PrestoDistributedQueryTest.java:559-583``).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), "sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(dsum(F.col("sum_qty"), "total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q12_priority_shipmode",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_count,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_count
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("aggregation", "case"),
)
def q12_priority_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped conditional aggregation (CASE WHEN inside SUM).

    SURVEY §2.2 CASE/IF (``PrestoDistributedQueryTest.java:249-263``).
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("finished_count"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("open_count"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Aggregation-operator coverage
# ---------------------------------------------------------------------------


@register(
    "agg_distinct",
    oracle="""
        SELECT COUNT(DISTINCT o_custkey) AS n_customers,
               COUNT(DISTINCT o_orderpriority) AS n_priorities,
               COUNT(*) AS n_orders
        FROM orders
    """,
    tags=("aggregation", "distinct"),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — SURVEY §2.2 (``PrestoDistributedQueryTest.java:414-459``)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "select_distinct_segments",
    oracle="""
        SELECT DISTINCT c_mktsegment, c_nationkey
        FROM customer
        WHERE c_nationkey < 5
    """,
    tags=("distinct", "filter"),
)
def select_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT over multiple fields (``:414-459``)."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_nationkey") < 5).select("c_mktsegment", "c_nationkey").distinct()


@register(
    "agg_stats_variance",
    oracle="""
        SELECT l_returnflag,
               ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
               ROUND(STDDEV_POP(l_quantity), 6) AS sdp_qty,
               ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,
               ROUND(VAR_POP(l_quantity), 6) AS varp_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("aggregation", "statistics"),
)
def agg_stats_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance family — SURVEY §2.2 (``:1044-1053,1229-1238``).

    Rounded to 6 dp: both engines use numerically stable single-pass
    algorithms whose results agree far below 1e-6 at these magnitudes.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.stddev_pop("l_quantity"), 6).alias("sdp_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            F.round(F.var_pop("l_quantity"), 6).alias("varp_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_minmax_by",
    oracle="""
        SELECT o_orderpriority,
               MAX_BY(o_orderkey, o_totalprice) AS priciest_order,
               MIN_BY(o_orderkey, o_totalprice) AS cheapest_order,
               ROUND(MAX(o_totalprice), 2) AS max_price
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("aggregation",),
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by — SURVEY §2.2 (``PrestoDistributedQueryTest.java:704-768``)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_minmax_by_n",
    oracle="""
        WITH ranked AS (
            SELECT o_orderpriority, o_orderkey,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey DESC
                   ) AS rn
            FROM orders
        )
        SELECT o_orderpriority,
               STRING_AGG(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn) AS top3
        FROM ranked WHERE rn <= 3
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("aggregation", "topk"),
)
def agg_minmax_by_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by(x, y, N) — the N-variant returning the top-N x by y
    (SURVEY §2.2 ``PrestoDistributedQueryTest.java:704-768``).

    Expressed as window top-k + ordered collect rather than a full
    collect+sort per group: Catalyst's WindowGroupLimit pushes the rank
    filter into each partition, so every executor keeps only 3 rows per
    group — the shape that survives groups with billions of rows. Ties
    broken on the value for cross-engine determinism.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "o_orderkey"))),
                    lambda s: s["o_orderkey"].cast("string"),
                ),
                ",",
            ).alias("top3")
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_checksum",
    oracle="""
        SELECT o_orderpriority,
               CAST(SUM(CAST('0x' || substr(
                       md5(CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus),
                       1, 15) AS BIGINT)
                   % 2147483648) AS BIGINT) AS checksum,
               COUNT(*) AS n
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("aggregation", "hashing"),
)
def agg_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content checksum per group — Presto's ``checksum``
    aggregate shape (SURVEY §2.2 "checksum/arbitrary-style aggregates").

    Sum of portable md5-derived hashes (``functions/hashing.py``) reduced
    mod 2^31 so partial sums stay in int64 headroom: commutative, so the
    result is independent of row order and partitioning — usable to compare
    two 100 TB corpora copies without sorting either.
    """
    o = load_table(spark, sf_dir, "orders")
    content = F.concat_ws(
        "|", F.col("o_orderkey").cast("string"), F.col("o_orderstatus")
    )
    term = F.pmod(md5_long(content), F.lit(2_147_483_648))
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.sum(term).alias("checksum"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_percentiles",
    oracle="""
        SELECT l_returnflag,
               ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS median_qty,
               ROUND(QUANTILE_CONT(l_quantity, 0.9), 6) AS p90_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("aggregation", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation).

    SURVEY §2.2 approx_percentile (``:139``) — the *approximate* variant
    (``percentile_approx``) is exercised in ``bench.py``/tests where
    cross-engine bit-equality is not required; the oracle-checked query uses
    exact percentiles, which both engines define identically.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
            F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_rollup",
    oracle=f"""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               GROUPING(l_returnflag) AS g_flag,
               GROUPING(l_linestatus) AS g_status,
               {o_dsum('l_quantity', 'sum_qty')},
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus
    """,
    tags=("aggregation", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING markers — SURVEY §2.2 (``testRollupOverUnion :919``)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_flag"),
            F.grouping("l_linestatus").cast("long").alias("g_status"),
            dsum(F.col("l_quantity"), "sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "g_flag",
            "g_status",
            "sum_qty",
            "n_rows",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "having_nation_counts",
    oracle="""
        SELECT c_nationkey, COUNT(*) AS n_customers
        FROM customer
        GROUP BY c_nationkey
        HAVING COUNT(*) > 3
        ORDER BY c_nationkey
    """,
    tags=("aggregation", "having"),
)
def having_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING — SURVEY §2.2 (``PrestoDistributedQueryTest.java:559-583``)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .filter(F.col("n_customers") > 3)
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "window_topn_per_nation",
    oracle="""
        SELECT c_nationkey, c_custkey, ROUND(c_acctbal, 2) AS acctbal, rnk
        FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey
                   ) AS rnk
            FROM customer
        )
        WHERE rnk <= 3
        ORDER BY c_nationkey, rnk
    """,
    tags=("window", "topk"),
)
def window_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per partition via row_number — SURVEY §2.2 Windows
    (``PrestoDistributedQueryTest.java:944-973,1124-1153``). Catalyst
    rewrites rank<=k into per-partition top-k (WindowGroupLimit), so no
    partition is fully sorted at scale.
    """
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "c_nationkey",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            "rnk",
        )
        .orderBy("c_nationkey", "rnk")
    )


@register(
    "window_running_total",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_spend
        FROM orders
        WHERE o_custkey < 100
    """,
    tags=("window", "frame"),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window frame (ROWS UNBOUNDED PRECEDING) — SURVEY §2.2
    Windows frame specs. Decimal accumulator keeps the prefix sums exact and
    engine-independent."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "window_lag_delta",
    oracle="""
        SELECT o_custkey, o_orderkey,
               ROUND(o_totalprice - LAG(o_totalprice, 1, o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ), 2) AS price_delta,
               RANK() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS order_seq
        FROM orders
        WHERE o_custkey < 50
    """,
    tags=("window", "lag", "rank"),
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + rank in one window — SURVEY §2.2 Windows (``testCustomRank :344``)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # lag default = the row's own price → first row's delta is 0.0, not
    # NULL (NULL doubles floatify asymmetrically under pandas hashing).
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.col("o_totalprice")
            - F.lag("o_totalprice", 1, None).over(w).alias("prev"),
            2,
        ).alias("price_delta"),
        F.rank().over(w).alias("order_seq"),
    ).withColumn("price_delta", F.coalesce("price_delta", F.lit(0.0)))


# ---------------------------------------------------------------------------
# Joins beyond equi-inner: semi / anti / scalar subquery
# ---------------------------------------------------------------------------


@register(
    "join_semi_exists",
    oracle="""
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 50000
        )
        ORDER BY c_custkey
        LIMIT 100
    """,
    tags=("join", "semi", "subquery"),
)
def join_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join — SURVEY §2.2 (``:284-328`` correlated EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .limit(100)
    )


@register(
    "join_anti_not_exists",
    oracle="""
        SELECT c.c_custkey, c.c_nationkey
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
        )
        ORDER BY c_custkey
    """,
    tags=("join", "anti", "subquery"),
)
def join_anti_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join — SURVEY §2.2 (``:984-993``)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_nationkey")
        .orderBy("c_custkey")
    )


@register(
    "join_scalar_subquery",
    oracle="""
        WITH stats AS (
            SELECT (CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE)
                    / COUNT(o_totalprice)) AS avg_price
            FROM orders
        )
        SELECT o.o_orderkey, ROUND(o.o_totalprice, 2) AS totalprice
        FROM orders o, stats
        WHERE o.o_totalprice > 1.5 * stats.avg_price
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 50
    """,
    tags=("join", "subquery", "scalar"),
)
def join_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (orders above 2× average price).

    SURVEY §2.2 scalar subqueries (``:509-518``). The scalar side is a
    1-row broadcast — no shuffle of the fact table.
    """
    o = load_table(spark, sf_dir, "orders")
    stats = o.agg(davg(F.col("o_totalprice"), "avg_price"))
    return (
        o.crossJoin(F.broadcast(stats))
        .filter(F.col("o_totalprice") > 1.5 * F.col("avg_price"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "setop_union_all",
    oracle="""
        SELECT nationkey, COUNT(*) AS n
        FROM (
            SELECT c_nationkey AS nationkey FROM customer
            UNION ALL
            SELECT s_nationkey AS nationkey FROM supplier
        )
        GROUP BY nationkey
        ORDER BY nationkey
    """,
    tags=("setop", "union"),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + aggregation over it — SURVEY §2.2 (``:1174-1223``)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n")).orderBy("nationkey")


@register(
    "setop_intersect",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
        ORDER BY nationkey
    """,
    tags=("setop", "intersect"),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — SURVEY §2.2 (``:609-618``)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@register(
    "setop_except",
    oracle="""
        SELECT n_nationkey AS nationkey FROM nation
        EXCEPT
        SELECT c_nationkey FROM customer WHERE c_nationkey < 20
        ORDER BY nationkey
    """,
    tags=("setop", "except"),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — SURVEY §2.2 (``:489-498``)."""
    n = load_table(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 20)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    return n.subtract(c).orderBy("nationkey")


# ---------------------------------------------------------------------------
# Lateral / unnest, CASE, filters, scalar functions, sort/limit/sample
# ---------------------------------------------------------------------------


@register(
    "unnest_word_counts",
    oracle="""
        SELECT word, COUNT(*) AS n
        FROM (
            SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word
            FROM documents
        )
        GROUP BY word
        ORDER BY n DESC, word
        LIMIT 50
    """,
    tags=("unnest", "aggregation"),
)
def unnest_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST/explode — SURVEY §2.2 (``testUnnest :1224``)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(50)
    )


@register(
    "case_when_bucketize",
    oracle="""
        SELECT CASE WHEN p_size < 10 THEN 'small'
                    WHEN p_size < 30 THEN 'medium'
                    ELSE 'large' END AS size_class,
               COUNT(*) AS n_parts,
               CAST(MIN(p_size) AS BIGINT) AS min_size,
               CAST(MAX(p_size) AS BIGINT) AS max_size
        FROM part
        GROUP BY 1
        ORDER BY size_class
    """,
    tags=("case", "aggregation"),
)
def case_when_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing — SURVEY §2.2 (``:249-263``)."""
    p = load_table(spark, sf_dir, "part")
    size_class = (
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "medium")
        .otherwise("large")
    )
    return (
        p.groupBy(size_class.alias("size_class"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_size").cast("long").alias("min_size"),
            F.max("p_size").cast("long").alias("max_size"),
        )
        .orderBy("size_class")
    )


@register(
    "filter_in_like",
    oracle="""
        SELECT p_partkey, p_brand, p_type
        FROM part
        WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
          AND p_type LIKE '%O%'
          AND p_size >= 5
        ORDER BY p_partkey
    """,
    tags=("filter", "in", "like"),
)
def filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + LIKE + range conjunction — SURVEY §2.2 (``:589,644,274``);
    pushed-predicate set mirrors A8 (``PrestoFilterConverterTest.java:48-126``)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
            & F.col("p_type").like("%O%")
            & (F.col("p_size") >= 5)
        )
        .select("p_partkey", "p_brand", "p_type")
        .orderBy("p_partkey")
    )


@register(
    "null_safe_comparison",
    oracle="""
        SELECT o_orderstatus,
               CAST(SUM(CASE WHEN o_orderpriority IS DISTINCT FROM '1-URGENT'
                        THEN 1 ELSE 0 END) AS BIGINT) AS non_urgent,
               CAST(SUM(CASE WHEN o_orderpriority IS NOT DISTINCT FROM '1-URGENT'
                        THEN 1 ELSE 0 END) AS BIGINT) AS urgent
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("filter", "nullsafe"),
)
def null_safe_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] DISTINCT FROM — SURVEY §2.2 (``:419``); Spark `<=>`."""
    o = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").eqNullSafe(F.lit("1-URGENT"))
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("non_urgent"),
            F.sum(F.when(urgent, 1).otherwise(0)).alias("urgent"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "datetime_functions",
    oracle="""
        SELECT STRFTIME(o_orderdate, '%Y-%m') AS order_month,
               COUNT(*) AS n_orders,
               CAST(MIN(o_orderdate + INTERVAL 30 DAY) AS DATE) AS earliest_due
        FROM orders
        WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
        GROUP BY 1
        ORDER BY order_month
    """,
    tags=("datetime", "functions"),
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """format_datetime/date_add/extract — SURVEY §2.2 scalar datetime family
    (``TestPrestoITCase.java:451-456,497-515``)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.year("o_orderdate") == 1997)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(F.date_add(F.col("o_orderdate").cast("date"), 30)).alias("earliest_due"),
        )
        .orderBy("order_month")
    )


@register(
    "string_functions",
    oracle="""
        SELECT UPPER(c_mktsegment) AS segment,
               COUNT(*) AS n,
               MIN(LENGTH(c_name)) AS min_name_len,
               MAX(SUBSTR(c_name, 10, 9)) AS max_name_suffix,
               MIN(CONCAT(c_mktsegment, '-', CAST(c_nationkey AS VARCHAR))) AS min_tag
        FROM customer
        GROUP BY 1
        ORDER BY segment
    """,
    tags=("string", "functions"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/length/substr/concat — SURVEY §2.2 scalar string family
    (``TestPrestoITCase.java:644,696`` uses upper in prune tests)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy(F.upper("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.length("c_name")).alias("min_name_len"),
            F.max(F.substring("c_name", 10, 9)).alias("max_name_suffix"),
            F.min(
                F.concat(F.col("c_mktsegment"), F.lit("-"), F.col("c_nationkey").cast("string"))
            ).alias("min_tag"),
        )
        .orderBy("segment")
    )


@register(
    "limit_offset_sort",
    oracle="""
        SELECT n_nationkey, n_name, n_regionkey
        FROM nation
        ORDER BY n_regionkey DESC, n_name
        LIMIT 10 OFFSET 5
    """,
    tags=("sort", "limit", "offset"),
)
def limit_offset_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT + OFFSET — SURVEY §2.2 (``:649-678,804``)."""
    n = load_table(spark, sf_dir, "nation")
    return n.orderBy(F.desc("n_regionkey"), F.asc("n_name")).offset(5).limit(10)


@register(
    "key_based_sampling",
    oracle=f"""
        SELECT COUNT(*) AS n_rows,
               COUNT(DISTINCT l_orderkey) AS n_orders,
               {o_dsum('l_extendedprice', 'sampled_price')}
        FROM lineitem
        WHERE l_orderkey % 97 = 0
    """,
    tags=("sampling",),
)
def key_based_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic key-based sampling — SURVEY §2.2 (``:629-638``).

    (Bernoulli TABLESAMPLE is inherently seed-dependent; see
    ``sample_bernoulli`` for the rows-only-checked variant.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 97 == 0).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum(F.col("l_extendedprice"), "sampled_price"),
    )


@register(
    "sample_bernoulli",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS corpus_rows,
               CAST(1 AS BIGINT) AS frac_in_band,
               CAST(0 AS BIGINT) AS out_of_corpus,
               CAST(1 AS BIGINT) AS seed_deterministic
        FROM lineitem
    """,
    tags=("sampling", "invariant-oracle"),
)
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE BERNOULLI — SURVEY §2.2 (``:1109-1118``), gated by an
    INVARIANT oracle (the ``assign_unique_id`` pattern): the sampled row
    SET is engine-seed-dependent, so no SQL oracle can hash-match it —
    but the properties that make a Bernoulli sampler correct are
    deterministic and executable on both engines:

    - ``corpus_rows`` — corpus count, genuinely recomputed by both sides;
    - ``out_of_corpus`` — sampled keys anti-joined back against the
      corpus (a sampler may only ever SELECT rows, never invent them):
      must be 0;
    - ``frac_in_band`` — |sample_fraction − 0.1| < 0.03: ~8σ at the
      smallest test scale (sf0.001, ~6k rows, σ≈0.004), and the fixed
      seed makes the realized fraction a constant per Spark version, so
      this can never flake — it only fails if the sampler's rate is
      actually broken;
    - ``seed_deterministic`` — two INDEPENDENT loads sampled with the
      same seed must agree exactly (count + identity-sum over the
      sampled keys): the reproducibility contract a fixed-seed sample
      pipeline rests on.

    The three scalar aggregates and the anti-join count combine via
    single-row crossJoins (the repo's declared bounded-BNLJ class —
    1-row scalars, never data-sized).
    """
    li = load_table(spark, sf_dir, "lineitem")
    s1 = li.sample(fraction=0.1, seed=42)
    # determinism probe: a FRESH load (fresh DataSource handle, fresh
    # logical plan) sampled with the same seed must reproduce s1 exactly
    s2 = load_table(spark, sf_dir, "lineitem").sample(fraction=0.1, seed=42)
    ident = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("long")
    a1 = s1.agg(
        F.count(F.lit(1)).alias("n1"), F.sum(ident).alias("h1")
    )
    a2 = s2.agg(
        F.count(F.lit(1)).alias("n2"), F.sum(ident).alias("h2")
    )
    corpus = li.agg(F.count(F.lit(1)).alias("corpus_rows"))
    keys = ["l_orderkey", "l_linenumber"]
    ooc = (
        s1.select(*keys)
        .join(li.select(*keys), keys, "left_anti")
        .agg(F.count(F.lit(1)).alias("out_of_corpus"))
    )
    return (
        a1.crossJoin(a2)
        .crossJoin(corpus)
        .crossJoin(ooc)
        .select(
            F.col("corpus_rows").cast("long").alias("corpus_rows"),
            F.when(
                F.abs(
                    F.col("n1").cast("double") / F.col("corpus_rows") - 0.1
                )
                < 0.03,
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("frac_in_band"),
            F.col("out_of_corpus").cast("long").alias("out_of_corpus"),
            F.when(
                (F.col("n1") == F.col("n2"))
                & F.col("h1").eqNullSafe(F.col("h2")),
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("seed_deterministic"),
        )
    )
