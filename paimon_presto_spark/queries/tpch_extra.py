"""TPC-H-shaped queries Q4..Q22, adapted to the testdata star schema.

The driver's tables are a trimmed TPC-H (TESTDATA.md): no ``partsupp``, and
``lineitem``/``orders`` lack the commit/receipt dates, ship modes and
comments. Queries whose canonical form needs a missing column are adapted to
an equivalent operator shape on the available columns (noted per query) —
the point is covering the reference's host-engine surface (SURVEY §2.2:
correlated/uncorrelated subqueries, outer joins, disjunctive pushdown,
ratio aggregates), which these shapes exercise identically.

Scale notes: every query keeps the canonical TPC-H plan shape — filters
reach the scans, small dimensions broadcast, aggregations stay
partial+final, top-k compiles to TakeOrderedAndProject.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from paimon_presto_spark.queries import register
from paimon_presto_spark.queries.relational import DEC, davg, dsum, o_davg, o_dsum
from paimon_presto_spark.sources.testdata import load_table


@register(
    "q4_order_priority",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("join", "semi", "exists", "aggregation"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (adapted: late-ship EXISTS uses l_shipdate > o_orderdate —
    the schema has no l_commitdate/l_receiptdate).

    SURVEY §2.2 Joins: correlated EXISTS ⇒ LEFT SEMI after decorrelation
    (``PrestoDistributedQueryTest.java:284-328``). The semi-join shuffles on
    l_orderkey only; priorities aggregate after.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1996-07-01 00:00:00'"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               YEAR(l.l_shipdate) AS l_year,
               {o_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                               AND TIMESTAMP '1997-12-31 00:00:00'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "broadcast", "aggregation"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: nation-pair shipping volumes by year.

    SURVEY §2.2 Joins (join chains ``PrestoDistributedQueryTest.java:979``).
    Both nation dims broadcast; the disjunctive nation-pair predicate is
    applied post-join on broadcast columns (no extra shuffle).
    """
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"),
            F.expr("TIMESTAMP_NTZ '1997-12-31 00:00:00'"),
        )
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        F.broadcast(s).join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle=f"""
        WITH all_nations AS (
            SELECT YEAR(o.o_orderdate) AS o_year,
                   CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,10)) AS volume,
                   n1.n_name AS supp_nation
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
            JOIN region r   ON n2.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                    AND TIMESTAMP '1997-12-31 00:00:00'
        )
        SELECT o_year,
               CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                                  THEN volume ELSE 0 END) AS VARCHAR) AS DOUBLE)
               / CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE) AS mkt_share
        FROM all_nations
        GROUP BY o_year
        ORDER BY o_year
    """,
    tags=("join", "aggregation", "conditional"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share inside a region per year.

    SURVEY §2.2 Aggregations + CASE (``:249-263``): conditional-sum ratio.
    Both sums run in exact decimal; the ratio divides in double — identical
    operations in both engines, so the result hash-matches.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"),
            F.expr("TIMESTAMP_NTZ '1997-12-31 00:00:00'"),
        )
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")))
    r = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .join(r, F.col("c_rk") == F.col("r_regionkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            (
                F.sum(nation_vol.cast(DEC)).cast("string").cast("double")
                / F.sum(vol.cast(DEC)).cast("string").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle=f"""
        SELECT n.n_name AS nation, YEAR(o.o_orderdate) AS o_year,
               {o_dsum('l.l_extendedprice * (1 - l.l_discount)', 'profit')}
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
    tags=("join", "aggregation", "like"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted: profit = discounted revenue; the schema has no
    partsupp/ps_supplycost to subtract).

    SURVEY §2.2 Joins + LIKE pushdown (``:274``). The part filter prunes the
    build side before the fact join; nation broadcast.
    """
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    o = load_table(spark, sf_dir, "orders")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        p.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT OUTER JOIN orders o
              ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "outer", "aggregation"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (adapted: the join-side filter excludes a priority class —
    no o_comment column to regex).

    SURVEY §2.2 Joins: LEFT OUTER with a join-side-only predicate, then a
    two-level aggregation (count-of-counts). COUNT(col) counts non-null
    join matches — the outer-join null semantics the suite exercises.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q14_promo_revenue",
    oracle="""
        SELECT 100.00
               * CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                      THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,10))
                      ELSE 0 END) AS VARCHAR) AS DOUBLE)
               / CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                    AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
               AS promo_revenue
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("join", "aggregation", "conditional"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue percentage for one month.

    SURVEY §2.2 CASE/conditional aggregation (``:249-263``). part is
    broadcast; the month filter reaches the lineitem scan.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1997-03-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1997-04-01 00:00:00'"))
    )
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo.cast(DEC)).cast("string").cast("double")
                / F.sum(rev.cast(DEC)).cast("string").cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {o_dsum('l_extendedprice * (1 - l_discount)', 'total_revenue')}
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
    """,
    tags=("join", "scalar-subquery", "aggregation"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the maximum quarterly revenue.

    SURVEY §2.2 scalar subqueries (``:984-993``): the MAX-over-aggregate is
    a broadcast one-row join against the revenue CTE (computed once, reused
    for both the max and the equality filter via cache).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1997-04-01 00:00:00'"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
        .cache()
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(
            F.broadcast(max_rev),
            F.col("total_revenue") == F.col("max_revenue"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_parts_supplier",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("join", "distinct", "aggregation", "in"),
)
def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted: supplier-per-part relation comes from lineitem —
    the schema has no partsupp).

    SURVEY §2.2 DISTINCT aggregation (``:414-459``) + IN-list and <>
    pushdown. COUNT(DISTINCT) expands to a two-phase aggregate.
    """
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity",
    oracle="""
        SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,10)))
                    AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN (
            SELECT l_partkey,
                   0.5 * ((CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,10)))
                           AS VARCHAR) AS DOUBLE)) / COUNT(l_quantity)) AS half_avg
            FROM lineitem GROUP BY l_partkey
        ) a ON a.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3' AND l.l_quantity < a.half_avg
    """,
    tags=("join", "correlated-subquery", "aggregation"),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue of below-half-average-quantity orders.

    SURVEY §2.2 correlated scalar subqueries (``:984-993``) — expressed the
    way Catalyst decorrelates them: a per-part average aggregate joined back
    on the correlation key. The half-average goes through the exact-decimal
    path so the comparison boundary is engine-identical.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    )
    avg_q = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.5) * davg(F.col("l_quantity"), "dummy")).alias("half_avg")
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_q, F.col("a_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("string").cast("double") / 7.0)
            .alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_filter",
    oracle=f"""
        SELECT {o_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
               COUNT(*) AS n_rows
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 21)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 30)
           OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity BETWEEN 20 AND 40)
    """,
    tags=("join", "disjunctive", "pushdown", "aggregation"),
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (adapted: brand/size/quantity branches; no shipmode or
    container columns).

    SURVEY §2.2 OR-of-ranges predicates (A8: OR of ranges is part of the
    pushed predicate set, ``PrestoFilterConverter.java:100-152``). Catalyst
    splits the single-table conjuncts out of the OR and pushes them to both
    scans; the residual disjunction evaluates post-join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
        WITH avg_bal AS (
            SELECT (CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,10)))
                    AS VARCHAR) AS DOUBLE)) / COUNT(c_acctbal) AS v
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c.c_nationkey % 10 AS cntrycode, COUNT(*) AS numcust,
               CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,10)))
                    AS VARCHAR) AS DOUBLE) AS totacctbal
        FROM customer c, avg_bal
        WHERE c.c_acctbal > avg_bal.v
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
          )
        GROUP BY cntrycode
        ORDER BY cntrycode
    """,
    tags=("join", "anti", "scalar-subquery", "aggregation"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted: country code = c_nationkey % 10 — no c_phone in
    this schema; the anti-join excludes customers with URGENT orders so the
    result is non-empty on the synthetic data, where every customer has
    placed at least one order).

    SURVEY §2.2: uncorrelated scalar subquery (average balance) + NOT
    EXISTS anti-join (``:284-328,509-518``). The scalar is a one-row
    broadcast; the anti-join shuffles on custkey.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(davg(F.col("c_acctbal"), "v"))
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("v"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 10).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("string").cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
        WITH supply AS (
            SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                   MIN(l_extendedprice / l_quantity) AS ps_supplycost
            FROM lineitem GROUP BY 1, 2
        ), supply_eu AS (
            SELECT ps.*, s.s_acctbal, s.s_name, n.n_name
            FROM supply ps
            JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            JOIN region r   ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'EUROPE'
        )
        SELECT se.s_acctbal, se.s_name, se.n_name, p.p_partkey, p.p_name,
               se.ps_supplycost
        FROM part p
        JOIN supply_eu se ON p.p_partkey = se.ps_partkey
        WHERE p.p_type = 'PROMO' AND p.p_size < 16
          AND se.ps_supplycost = (
            SELECT MIN(se2.ps_supplycost) FROM supply_eu se2
            WHERE se2.ps_partkey = p.p_partkey
          )
        ORDER BY se.s_acctbal DESC, se.n_name, se.s_name, p.p_partkey
        LIMIT 100
    """,
    tags=("join", "scalar-subquery", "correlated", "topk"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted: no ``partsupp`` in this schema, so the supply
    relation is derived — distinct (part, supplier) pairs from lineitem with
    unit price MIN(l_extendedprice / l_quantity) as the supply cost).

    SURVEY §2.2 correlated scalar subqueries (``PrestoDistributedQueryTest
    .java:984-993``), expressed as Catalyst decorrelates them: the
    region-filtered supply relation is computed once, its per-part MIN joined
    back on the correlation key. At scale the supply aggregation shuffles on
    (partkey, suppkey) once and is reused for both sides; part and the
    dimension chain broadcast.
    """
    # The part filter is the most selective predicate — broadcast-semi-join
    # it into the lineitem scan BEFORE the supply aggregation, so the big
    # (partkey, suppkey) shuffle moves only qualifying parts' rows. The
    # correlated MIN is per-part, so pre-filtering parts is equivalence-
    # preserving (the subquery correlates on the same partkey).
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_type") == "PROMO") & (F.col("p_size") < 16)
        )
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        p.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    supply = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    eu_supp = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    supply_eu = supply.join(
        F.broadcast(eu_supp), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    # one row per qualifying part — always broadcastable
    min_cost = F.broadcast(
        supply_eu.groupBy(F.col("ps_partkey").alias("m_partkey")).agg(
            F.min("ps_supplycost").alias("min_cost")
        )
    )
    return (
        supply_eu.join(p, F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            min_cost,
            (F.col("m_partkey") == F.col("ps_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "ps_supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_stock",
    oracle="""
        WITH nat_supply AS (
            SELECT l.l_partkey,
                   CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * CAST(l.l_quantity AS DECIMAL(18,0)) AS val
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = 'NATION_7'
        ), total AS (
            SELECT CAST(CAST(SUM(val) AS VARCHAR) AS DOUBLE) AS t FROM nat_supply
        )
        SELECT l_partkey,
               CAST(CAST(SUM(val) AS VARCHAR) AS DOUBLE) AS value
        FROM nat_supply, total
        GROUP BY l_partkey, total.t
        HAVING CAST(CAST(SUM(val) AS VARCHAR) AS DOUBLE) > total.t * 0.001
        ORDER BY value DESC, l_partkey
    """,
    tags=("aggregation", "having", "scalar-subquery"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted: lineitem value per part for one nation's
    suppliers; the canonical ps_supplycost*ps_availqty becomes
    l_extendedprice*l_quantity).

    SURVEY §2.2 HAVING over an uncorrelated scalar subquery
    (``PrestoDistributedQueryTest.java:559-583`` HAVING; ``:984-993``
    scalar subqueries). The per-part aggregation shuffles on partkey once;
    the grand total is a one-row broadcast joined into the HAVING filter.
    Threshold compare runs in string-normalized doubles on both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    )
    nat_supply = (
        li.join(F.broadcast(s.join(n, s.s_nationkey == n.n_nationkey)
                            .select("s_suppkey")),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_partkey",
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_quantity").cast("decimal(18,0)")
            ).alias("val"),
        )
    )
    total = nat_supply.agg(
        F.sum("val").cast("string").cast("double").alias("t")
    )
    return (
        nat_supply.groupBy("l_partkey")
        .agg(F.sum("val").cast("string").cast("double").alias("value"))
        .join(F.broadcast(total))
        .filter(F.col("value") > F.col("t") * 0.001)
        .select("l_partkey", "value")
        .orderBy(F.desc("value"), "l_partkey")
    )


@register(
    "q20_excess_stock",
    oracle="""
        WITH part_total AS (
            SELECT l_partkey,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,10)))
                        AS VARCHAR) AS DOUBLE) AS total_qty
            FROM lineitem GROUP BY l_partkey
        ), recent AS (
            SELECT l_suppkey, l_partkey,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,10)))
                        AS VARCHAR) AS DOUBLE) AS recent_qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_suppkey, l_partkey
        )
        SELECT s.s_name, s.s_acctbal
        FROM supplier s
        WHERE s.s_suppkey IN (
            SELECT r.l_suppkey
            FROM recent r
            JOIN part_total t ON r.l_partkey = t.l_partkey
            WHERE r.l_partkey IN
                  (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
              AND r.recent_qty * 5.0 > t.total_qty
        )
        ORDER BY s.s_name
    """,
    tags=("join", "semi", "subquery", "aggregation"),
)
def q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted: no partsupp/availqty — a supplier has "excess
    stock" in a part if its 1997+ shipped quantity exceeds 20% of that
    part's all-time total).

    SURVEY §2.2 nested IN subqueries with a correlated aggregate
    (``PrestoDistributedQueryTest.java:589,984-993``), decorrelated the way
    Catalyst does: both aggregates group-shuffle on partkey, the part-name
    IN list is a broadcast semi-join, and the final supplier membership is a
    LEFT SEMI on suppkey. No row explosion anywhere — every join is
    key-equi on pre-aggregated inputs.
    """
    li = load_table(spark, sf_dir, "lineitem")
    widget_parts = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    part_total = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("string").cast("double")
        .alias("total_qty")
    )
    recent = (
        li.filter(F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("string").cast("double")
            .alias("recent_qty")
        )
    )
    excess = (
        recent.join(widget_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(part_total, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("recent_qty") * 5.0 > F.col("total_qty"))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q21_suppliers_kept_waiting",
    oracle="""
        WITH lo AS (
            SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
        ), late AS (
            SELECT * FROM lo WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        SELECT s.s_name, COUNT(*) AS numwait
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN late l1  ON s.s_suppkey = l1.l_suppkey
        WHERE n.n_name = 'NATION_4'
          AND EXISTS (SELECT 1 FROM lo l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 100
    """,
    tags=("join", "semi", "anti", "exists", "aggregation", "topk"),
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted: "late" = shipped more than 60 days after the
    order date — the schema has no commit/receipt dates): suppliers who were
    the SOLE late supplier on a finished multi-supplier order.

    SURVEY §2.2 correlated EXISTS + NOT EXISTS with non-equi correlation
    (``PrestoDistributedQueryTest.java:284-328,509-518``). The naive plan is
    a semi-join + anti-join pair that scans lineitem⋈orders three times; the
    EXISTS ("some other supplier on the order") and NOT EXISTS ("no other
    LATE supplier") are both per-order supplier counts, so a single pass
    computes them: aggregate late/total per (orderkey, suppkey), window over
    the order to count suppliers and late suppliers, keep suppliers that are
    the sole late supplier on a multi-supplier order. One lineitem scan, no
    self-joins; every shuffle is an aggregation with map-side combine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("is_late"),
    )
    per_supp = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(F.col("is_late").cast("long")).alias("late_rows")
    )
    w = Window.partitionBy("l_orderkey")
    waiting = (
        per_supp.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_late_supp",
            F.sum((F.col("late_rows") > 0).cast("int")).over(w),
        )
        .filter(
            (F.col("late_rows") > 0)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1)
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    )
    nat_supp = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey).select("s_suppkey", "s_name")
    )
    return (
        waiting.join(nat_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_rows").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
