"""Additional Tier-B operator coverage: rank-variant windows, filtered /
boolean aggregates, advanced string functions, array higher-order and
set-operation functions, map constructors/introspection, conditional
scalars (coalesce/nullif/greatest/least), width_bucket histograms,
datetime truncation, and FULL OUTER join.

These round out SURVEY §2.2 families whose earlier entries covered only
the most common member (e.g. ``row_number`` but not ``ntile``/
``percent_rank``; LEFT but not FULL OUTER). Determinism rules from
``queries/__init__`` apply: integer SUMs are CAST to BIGINT in the
oracles, doubles that are exact rationals (percent_rank) are compared
raw, and no result column is an array or nullable int.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from paimon_presto_spark.queries import register
from paimon_presto_spark.queries.relational import DEC
from paimon_presto_spark.sources.testdata import load_table


@register(
    "window_rank_variants",
    oracle="""
        SELECT s_nationkey, s_suppkey,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk,
               NTILE(4) OVER w AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume
        FROM supplier
        WHERE s_nationkey < 5
        WINDOW w AS (PARTITION BY s_nationkey
                     ORDER BY s_acctbal DESC, s_suppkey)
        ORDER BY s_nationkey, rnk, s_suppkey
    """,
    tags=("window", "rank", "ntile", "percent-rank"),
)
def window_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/ntile/percent_rank/cume_dist — SURVEY §2.2 Windows
    (rank family, ``PrestoDistributedQueryTest.java:344,944-973``).

    percent_rank and cume_dist are exact small-integer ratios, so the
    double division is bit-identical across engines. One window
    partitioning serves all five functions — a single shuffle.
    """
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return (
        s.select(
            "s_nationkey",
            "s_suppkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .orderBy("s_nationkey", "rnk", "s_suppkey")
    )


@register(
    "agg_filtered_bool",
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
               BOOL_AND(o_totalprice > 0) AS all_positive,
               BOOL_OR(o_orderpriority = '1-URGENT') AS any_urgent,
               COUNT(DISTINCT o_orderpriority)
                   FILTER (WHERE o_custkey % 2 = 0) AS n_prio_even
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("aggregation", "count-if", "bool-and", "filter-clause"),
)
def agg_filtered_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if / bool_and / bool_or / FILTER'd aggregates — Presto's
    conditional-aggregate family (SURVEY §2.2 aggregations). Expressed
    with Spark's same-named built-ins; the filtered distinct count uses
    ``count_distinct`` over a NULL-masked column (NULLs are ignored by
    aggregates in both engines).
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
            F.count_distinct(
                F.when(F.col("o_custkey") % 2 == 0, F.col("o_orderpriority"))
            ).alias("n_prio_even"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "string_advanced_functions",
    oracle="""
        SELECT p_brand,
               COUNT(*) AS n,
               MIN(SPLIT_PART(p_name, ' ', 1)) AS first_word,
               MAX(STRPOS(p_name, 'a')) AS max_a_pos,
               MIN(LEVENSHTEIN(p_brand, 'Brand#0')) AS min_edit,
               MAX(REGEXP_EXTRACT(p_name, '([0-9]+)', 1)) AS max_digits,
               MIN(TRANSLATE(p_brand, '#', '-')) AS dashed,
               MAX(LPAD(CAST(p_size AS VARCHAR), 3, '0')) AS max_size_padded
        FROM part
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    tags=("string", "functions", "regexp", "levenshtein"),
)
def string_advanced_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split_part/strpos/levenshtein/regexp_extract/translate/lpad —
    SURVEY §2.2 scalar string family beyond the upper/substr basics.
    All JVM built-ins, codegen'd; identical semantics in DuckDB.
    """
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))).alias(
                "first_word"
            ),
            F.max(F.instr(F.col("p_name"), "a")).alias("max_a_pos"),
            F.min(F.levenshtein(F.col("p_brand"), F.lit("Brand#0"))).alias(
                "min_edit"
            ),
            F.max(F.regexp_extract(F.col("p_name"), "([0-9]+)", 1)).alias(
                "max_digits"
            ),
            F.min(F.translate(F.col("p_brand"), "#", "-")).alias("dashed"),
            F.max(F.lpad(F.col("p_size").cast("string"), 3, "0")).alias(
                "max_size_padded"
            ),
        )
        .orderBy("p_brand")
    )


@register(
    "array_lambda_functions",
    oracle="""
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                        w -> LEN(w) > 5))) AS BIGINT)
                   AS long_words,
               CAST(SUM(LIST_AGGREGATE(LIST_TRANSFORM(STRING_SPLIT(text, ' '),
                                                      w -> LEN(w)), 'sum'))
                    AS BIGINT) AS total_chars,
               CAST(SUM(CASE WHEN LENGTH(LIST_FILTER(STRING_SPLIT(text, ' '),
                                                     w -> w = 'the')) > 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_the
        FROM documents
        GROUP BY source
        ORDER BY source
    """,
    tags=("array", "lambda", "higher-order-functions"),
)
def array_lambda_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/filter/aggregate/exists) —
    SURVEY §2.2 arrays family. The lambdas run inside whole-stage codegen
    (no Python), which is what makes per-document token math viable at
    100 TB: a narrow map over each partition, no explode, no shuffle
    until the final small aggregation.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    long_words = F.size(F.filter(words, lambda w: F.length(w) > 5))
    total_chars = F.aggregate(
        F.transform(words, lambda w: F.length(w)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    has_the = F.exists(words, lambda w: w == "the").cast("int")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(long_words).alias("long_words"),
            F.sum(total_chars).alias("total_chars"),
            F.sum(has_the).alias("docs_with_the"),
        )
        .orderBy("source")
    )


@register(
    "datetime_trunc_extras",
    oracle="""
        SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
               CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
               CAST(MIN(ISODOW(o_orderdate) - 1) AS BIGINT) AS min_weekday,
               COUNT(*) AS n,
               CAST(MAX(DATEDIFF('day', CAST(o_orderdate AS DATE),
                                 DATE '1998-12-31')) AS BIGINT) AS max_days_left
        FROM orders
        WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
        GROUP BY 1, 2
        ORDER BY month_start
    """,
    tags=("datetime", "trunc", "functions"),
)
def datetime_trunc_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc/last_day/weekday/datediff — SURVEY §2.2 datetime family
    beyond format/add. ISO weekday (Monday=0) is the convention both
    engines can express exactly (Spark ``weekday``, DuckDB ``isodow-1``).
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.year("o_orderdate") == 1996)
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias(
                "month_start"
            ),
            F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        )
        .agg(
            F.min(F.weekday(F.col("o_orderdate").cast("date"))).cast("long").alias(
                "min_weekday"
            ),
            F.count(F.lit(1)).alias("n"),
            F.max(
                F.datediff(F.lit("1998-12-31").cast("date"),
                           F.col("o_orderdate").cast("date"))
            ).cast("long").alias("max_days_left"),
        )
        .orderBy("month_start")
    )


@register(
    "join_full_outer",
    oracle="""
        WITH c AS (
            SELECT c_nationkey AS nk, COUNT(*) AS n_cust
            FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
        ),
        s AS (
            SELECT s_nationkey AS nk, COUNT(*) AS n_supp
            FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey
        )
        SELECT COALESCE(c.nk, s.nk) AS nationkey,
               COALESCE(c.n_cust, 0) AS n_cust,
               COALESCE(s.n_supp, 0) AS n_supp
        FROM c FULL OUTER JOIN s ON c.nk = s.nk
        ORDER BY nationkey
    """,
    tags=("join", "full-outer"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — SURVEY §2.2 join family (outer joins beyond the
    LEFT OUTER of q13). The selective filters make each side miss some
    nations, so both null-padding directions are exercised; COALESCE
    keeps every result column non-null (determinism rules). Aggregating
    before the join keeps the shuffled sides |nations|-sized.
    """
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, c.nk_c == s.nk_s, "full_outer")
        .select(
            F.coalesce("nk_c", "nk_s").cast("int").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@register(
    "bitwise_functions",
    oracle="""
        SELECT o_orderstatus,
               CAST(BIT_AND(o_orderkey) AS BIGINT) AS key_and,
               CAST(BIT_OR(o_orderkey) AS BIGINT) AS key_or,
               CAST(BIT_XOR(o_orderkey) AS BIGINT) AS key_xor,
               CAST(MIN(o_orderkey & 255) AS BIGINT) AS min_low_byte,
               CAST(MAX((o_orderkey << 1) | 1) AS BIGINT) AS max_shifted
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("bitwise", "aggregation", "functions"),
)
def bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bit_and/bit_or/bit_xor) + shift/mask scalars —
    SURVEY §2.2 math/arith family; integer-exact on both engines."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bit_and("o_orderkey").alias("key_and"),
            F.bit_or("o_orderkey").alias("key_or"),
            F.bit_xor("o_orderkey").alias("key_xor"),
            F.min(F.col("o_orderkey").bitwiseAND(255)).alias("min_low_byte"),
            F.max(F.shiftleft(F.col("o_orderkey"), 1).bitwiseOR(1)).alias(
                "max_shifted"
            ),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_corr_manual",
    oracle="""
        WITH comp AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS VARCHAR)
                        AS DOUBLE) AS sx,
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10)))
                        AS VARCHAR) AS DOUBLE) AS sy,
                   CAST(CAST(SUM(CAST(l_quantity * l_extendedprice
                                      AS DECIMAL(28,10))) AS VARCHAR)
                        AS DOUBLE) AS sxy,
                   CAST(CAST(SUM(CAST(l_quantity * l_quantity
                                      AS DECIMAL(28,10))) AS VARCHAR)
                        AS DOUBLE) AS sxx,
                   CAST(CAST(SUM(CAST(l_extendedprice * l_extendedprice
                                      AS DECIMAL(28,10))) AS VARCHAR)
                        AS DOUBLE) AS syy
            FROM lineitem
            GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               (n * sxy - sx * sy)
                   / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_qty_price,
               (n * sxy - sx * sy) / (n * n) AS covar_pop_scaled
        FROM comp
        ORDER BY l_returnflag
    """,
    tags=("aggregation", "statistics", "correlation"),
)
def agg_corr_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / covariance — SURVEY §2.2 stats family. Native corr()
    accumulates floating point in engine-specific order, so both engines
    compute it from EXACT decimal component sums (n, Σx, Σy, Σxy, Σx²,
    Σy²) and apply the same closed formula in double arithmetic —
    bit-identical results, still one partial-aggregated pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")

    def ds(c):
        return F.sum(c.cast("decimal(28,10)")).cast("string").cast("double")

    comp = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        ds(x).alias("sx"),
        ds(y).alias("sy"),
        ds(x * y).alias("sxy"),
        ds(x * x).alias("sxx"),
        ds(y * y).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return comp.select(
        "l_returnflag",
        "n",
        ((n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))).alias(
            "corr_qty_price"
        ),
        ((n * sxy - sx * sy) / (n * n)).alias("covar_pop_scaled"),
    ).orderBy("l_returnflag")


@register(
    "array_setops_functions",
    oracle="""
        SELECT n_nationkey,
               ARRAY_TO_STRING(LIST_SORT(LIST_INTERSECT(a, b)), ',') AS inter,
               ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST_CONCAT(a, b))), ',')
                   AS uni,
               ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(a, x -> NOT LIST_CONTAINS(b, x))), ',')
                   AS exc,
               ARRAY_TO_STRING(FLATTEN([a, b]), ',') AS flat,
               CAST(LEN(a) AS INT) AS n_a
        FROM (
            SELECT n_nationkey,
                   GENERATE_SERIES(1, n_nationkey % 5 + 3) AS a,
                   GENERATE_SERIES(2, 10, 2) AS b
            FROM nation
        )
        ORDER BY n_nationkey
    """,
    tags=("array", "set-ops", "sequence", "flatten"),
)
def array_setops_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_intersect/union/except + flatten + sequence — SURVEY §2.2
    arrays/maps-ctor family (Presto array set functions,
    ``PrestoDistributedQueryTest.java`` array coverage). Sorted-joined
    string results keep the driver's pandas canonicalization happy (array
    result columns are banned); per-element order is pinned by the sort,
    so engine-internal set-op ordering differences can't flake the hash."""
    n = load_table(spark, sf_dir, "nation")
    a = F.sequence(F.lit(1), F.col("n_nationkey") % 5 + 3)
    b = F.sequence(F.lit(2), F.lit(10), F.lit(2))

    def s(col):
        return F.array_join(F.array_sort(col).cast("array<string>"), ",")

    return (
        n.select(
            "n_nationkey",
            s(F.array_intersect(a, b)).alias("inter"),
            s(F.array_union(a, b)).alias("uni"),
            s(F.array_except(a, b)).alias("exc"),
            F.array_join(F.flatten(F.array(a, b)).cast("array<string>"), ",").alias(
                "flat"
            ),
            F.size(a).alias("n_a"),
        )
        .orderBy("n_nationkey")
    )


@register(
    "map_functions",
    oracle="""
        SELECT n_regionkey,
               ARRAY_TO_STRING(LIST_SORT(MAP_KEYS(m)), ',') AS keys_sorted,
               CAST(LIST_SUM(MAP_VALUES(m)) AS BIGINT) AS vals_sum,
               CAST(CARDINALITY(m) AS INT) AS n_entries,
               CAST(m['first'][1] AS BIGINT) AS first_val
        FROM (
            SELECT n_regionkey,
                   MAP(['first', 'last', 'span'],
                       [CAST(MIN(n_nationkey) AS BIGINT),
                        CAST(MAX(n_nationkey) AS BIGINT),
                        CAST(MAX(n_nationkey) - MIN(n_nationkey) AS BIGINT)]) AS m
            FROM nation
            GROUP BY n_regionkey
        )
        ORDER BY n_regionkey
    """,
    tags=("map", "functions", "constructors"),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_from_arrays + map_keys/map_values/cardinality/element_at —
    SURVEY §2.2 maps family (map subscript
    ``TestPrestoITCase.java:705-725``; here the construction and
    introspection functions around it). Values are aggregated per region
    so the map is built relationally, not from literals."""
    n = load_table(spark, sf_dir, "nation")
    agg = n.groupBy("n_regionkey").agg(
        F.min("n_nationkey").cast("long").alias("mn"),
        F.max("n_nationkey").cast("long").alias("mx"),
    )
    m = F.map_from_arrays(
        F.array(F.lit("first"), F.lit("last"), F.lit("span")),
        F.array(F.col("mn"), F.col("mx"), F.col("mx") - F.col("mn")),
    )
    withm = agg.select("n_regionkey", m.alias("m"))
    return (
        withm.select(
            "n_regionkey",
            F.array_join(F.array_sort(F.map_keys("m")), ",").alias("keys_sorted"),
            F.aggregate(
                F.map_values("m"), F.lit(0).cast("long"), lambda acc, v: acc + v
            ).alias("vals_sum"),
            F.size("m").alias("n_entries"),
            F.element_at("m", F.lit("first")).alias("first_val"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "conditional_scalar_functions",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN NULLIF(o_custkey % 3, 0) IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS nullif_zeros,
               CAST(SUM(COALESCE(NULLIF(o_custkey % 3, 0), -1)) AS BIGINT)
                   AS coalesced_sum,
               CAST(MAX(GREATEST(o_custkey, o_orderkey % 1000)) AS BIGINT)
                   AS max_greatest,
               CAST(MIN(LEAST(o_custkey, o_orderkey % 1000)) AS BIGINT)
                   AS min_least,
               CAST(SUM(IF(o_totalprice > 100000, 1, 0)) AS BIGINT) AS n_big
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("functions", "conditional", "coalesce", "nullif"),
)
def conditional_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE/NULLIF/GREATEST/LEAST/IF — SURVEY §2.2 CASE/IF family's
    conditional-scalar siblings (Presto conditional expressions). All
    integer arithmetic, so the cross-engine hash is exact."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.nullif(F.col("o_custkey") % 3, F.lit(0)).isNull().cast("int")
            ).cast("long").alias("nullif_zeros"),
            F.sum(
                F.coalesce(F.nullif(F.col("o_custkey") % 3, F.lit(0)), F.lit(-1))
            ).cast("long").alias("coalesced_sum"),
            F.max(F.greatest(F.col("o_custkey"), F.col("o_orderkey") % 1000))
            .cast("long").alias("max_greatest"),
            F.min(F.least(F.col("o_custkey"), F.col("o_orderkey") % 1000))
            .cast("long").alias("min_least"),
            F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0))
            .cast("long").alias("n_big"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "width_bucket_histogram",
    oracle="""
        SELECT CASE WHEN c_acctbal < 0 THEN 0
                    WHEN c_acctbal >= 10000 THEN 11
                    ELSE CAST(FLOOR(c_acctbal / 1000) AS BIGINT) + 1 END AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(c_custkey) AS BIGINT) AS min_key
        FROM customer
        GROUP BY 1
        ORDER BY bucket
    """,
    tags=("functions", "width-bucket", "histogram"),
)
def width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """width_bucket histogram — SURVEY §2.2 math family (Presto
    ``width_bucket``; DuckDB lacks it, so the oracle carries the exact
    same bucket arithmetic spelled out: below-range -> 0, above-range ->
    n+1, else floor-division + 1 — decimal inputs keep the division
    exact)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy(
            F.width_bucket(F.col("c_acctbal"), F.lit(0), F.lit(10000), F.lit(10))
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_custkey").cast("long").alias("min_key"),
        )
        .orderBy("bucket")
    )


@register(
    "timeseries_gap_fill",
    oracle="""
        WITH days AS (
            SELECT UNNEST(GENERATE_SERIES(DATE '1995-01-01', DATE '1995-01-31',
                                          INTERVAL 1 DAY))::DATE AS day
        ),
        daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders
            WHERE o_orderdate >= DATE '1995-01-01'
              AND o_orderdate < DATE '1995-02-01'
            GROUP BY 1
        )
        SELECT d.day,
               CAST(COALESCE(daily.n_orders, 0) AS BIGINT) AS n_orders,
               CASE WHEN daily.n_orders IS NULL THEN 1 ELSE 0 END AS is_gap
        FROM days d LEFT JOIN daily ON daily.day = d.day
        ORDER BY d.day
    """,
    tags=("datetime", "sequence", "gap-fill", "timeseries"),
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-filling: a generated date spine LEFT-joined against
    daily order counts, gaps filled with 0 — the standard time-series
    densification pattern (sequence -> explode -> broadcast-able spine
    join; the spine is bounded by the date range, never by data size, so
    at 100 TB the join broadcasts the spine and the fact scan stays one
    pass)."""
    o = load_table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-01-31").cast("date"),
            )
        ).alias("day")
    )
    daily = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-02-01").cast("timestamp"))
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.col("n_orders").isNull().cast("int").alias("is_gap"),
        )
        .orderBy("day")
    )


@register(
    "agg_exact_percentiles",
    oracle="""
        SELECT l_returnflag,
               ROUND(QUANTILE_CONT(CAST(l_quantity AS DOUBLE), 0.25), 6) AS p25,
               ROUND(QUANTILE_CONT(CAST(l_quantity AS DOUBLE), 0.5), 6) AS p50,
               ROUND(QUANTILE_CONT(CAST(l_quantity AS DOUBLE), 0.75), 6) AS p75,
               ROUND(QUANTILE_CONT(CAST(l_extendedprice AS DOUBLE), 0.9), 6) AS price_p90
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("aggregation", "percentile", "exact"),
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentile_cont (linear interpolation), next to
    ``agg_percentiles``'s approx_percentile — SURVEY §2.2 percentile
    family. Spark's ``percentile`` and DuckDB's ``quantile_cont`` share
    the (n-1)p interpolation rule, so values hash-match; inputs are
    exact decimals so interpolated midpoints are exact in double."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile(q, F.lit(0.25)), 6).alias("p25"),
            F.round(F.percentile(q, F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile(q, F.lit(0.75)), 6).alias("p75"),
            F.round(
                F.percentile(F.col("l_extendedprice").cast("double"), F.lit(0.9)), 6
            ).alias("price_p90"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "unnest_with_ordinality",
    oracle="""
        SELECT doc_id, t.u.p AS pos, t.u.w AS word
        FROM (
            SELECT doc_id,
                   LIST_TRANSFORM(STRING_SPLIT(text, ' '),
                                  (x, i) -> {'p': i, 'w': x}) AS pw
            FROM documents
            WHERE doc_id < 5
        ) s, UNNEST(s.pw) AS t(u)
        ORDER BY doc_id, pos
    """,
    tags=("unnest", "ordinality", "lateral"),
)
def unnest_with_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST WITH ORDINALITY (Presto's ordinality column) — Spark's
    ``posexplode`` (0-based, +1 to match SQL's 1-based ordinality). The
    DuckDB oracle emulates ordinality with an indexed list lambda since
    it lacks WITH ORDINALITY."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    return (
        d.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word")
        )
        .select("doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "word")
        .orderBy("doc_id", "pos")
    )


@register(
    "agg_histogram_map",
    oracle="""
        WITH per AS (
            SELECT o_orderstatus AS s, o_orderpriority AS p,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM orders GROUP BY 1, 2
        )
        SELECT s AS o_orderstatus,
               STRING_AGG(p || ':' || CAST(c AS VARCHAR), ',' ORDER BY p) AS hist,
               CAST(COUNT(*) AS INT) AS n_buckets,
               CAST(SUM(c) AS BIGINT) AS n_rows
        FROM per GROUP BY s ORDER BY o_orderstatus
    """,
    tags=("aggregation", "histogram", "map-agg"),
)
def agg_histogram_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Presto's ``histogram``/``map_agg`` family: a per-group value→count
    map, built as a genuine MapType aggregate (map_from_entries over
    sorted collected entries) and rendered to a deterministic string for
    the hash gate (map result columns are banned by the driver's pandas
    canonicalization). Two-phase aggregate — the same shape Presto's
    histogram() executes."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("c")
    )
    entries = F.array_sort(F.collect_list(F.struct("o_orderpriority", "c")))
    withmap = per.groupBy("o_orderstatus").agg(
        entries.alias("__e"), F.sum("c").cast("long").alias("n_rows")
    ).withColumn("__m", F.map_from_entries("__e"))
    return (
        withmap.select(
            "o_orderstatus",
            F.array_join(
                F.transform(
                    "__e",
                    lambda s: F.concat(
                        s["o_orderpriority"], F.lit(":"), s["c"].cast("string")
                    ),
                ),
                ",",
            ).alias("hist"),
            F.size("__m").alias("n_buckets"),
            "n_rows",
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Skew mitigation (operators/skew.py) — oracle-gated semantics preservation
# ---------------------------------------------------------------------------


@register(
    "join_salted_skew",
    oracle="""
        SELECT s.s_nationkey AS nationkey,
               COUNT(*) AS n_items,
               CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                  AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
                   AS revenue
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY s.s_nationkey
        ORDER BY nationkey
    """,
    tags=("join", "skew", "salting"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``operators/skew.salted_join`` gated against the PLAIN join's SQL:
    the salt splits each hot left key across n_salts reducers and
    replicates the right side to match, so the result set — and therefore
    this aggregate over it — must be IDENTICAL to the unsalted join.
    That invariance is exactly what the oracle certifies (the salt column
    itself is nondeterministic; the join result is salt-invariant).

    100 TB shape: the fact side never broadcasts and no single reducer
    owns a whole hot key; the price is n_salts× replication of the
    mid-size dimension (still far below the fact's volume).
    """
    from paimon_presto_spark.operators.skew import salted_join
    from paimon_presto_spark.queries.relational import dsum

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_extendedprice", "l_discount"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    return (
        salted_join(li, sup, ["suppkey"], n_salts=8)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
        .orderBy("nationkey")
    )


@register(
    "agg_two_phase_skew",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,10)))
                         AS VARCHAR) AS DOUBLE) AS sum_qty,
               MAX(l_extendedprice) AS max_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("aggregation", "skew", "salting"),
)
def agg_two_phase_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``operators/skew.two_phase_agg`` gated against the PLAIN GROUP BY:
    the salt-keyed partial phase splits each hot group across n_salts
    reducers, and because every aggregate here is decomposable (count→sum,
    sum→sum, max→max — with SUM running in exact decimal so reassociation
    cannot change the value), the two-phase result must equal the
    one-phase SQL. The salt itself is nondeterministic; the result is
    salt-invariant, which is the property the oracle certifies.
    """
    from paimon_presto_spark.operators.skew import two_phase_agg
    from paimon_presto_spark.queries.relational import DEC

    li = load_table(spark, sf_dir, "lineitem")
    out = two_phase_agg(
        li,
        ["l_returnflag"],
        {
            "n_rows": F.count(F.lit(1)),
            "sum_qty": F.sum(F.col("l_quantity").cast(DEC)),
            "max_price": F.max("l_extendedprice"),
        },
        n_salts=8,
    )
    return out.select(
        "l_returnflag",
        "n_rows",
        F.col("sum_qty").cast("string").cast("double").alias("sum_qty"),
        "max_price",
    ).orderBy("l_returnflag")


@register(
    "window_value_navigation",
    oracle="""
        SELECT o_orderkey, o_custkey,
               FIRST_VALUE(o_orderkey) OVER w AS first_order,
               LAST_VALUE(o_orderkey) OVER wf AS last_order,
               COALESCE(NTH_VALUE(o_orderkey, 2) OVER wf, -1) AS second_order,
               LEAD(o_orderkey, 1, -1) OVER w AS next_order
        FROM orders
        WHERE o_custkey < 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING)
        ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    tags=("window", "navigation", "first-value", "nth-value", "lead"),
)
def window_value_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-navigation window functions — first_value / last_value /
    nth_value / lead-with-default (SURVEY §2.2 Windows family; rank
    variants and frames have their own entries). last_value and nth_value
    run over the FULL partition frame (the default running frame would
    make last_value degenerate to the current row — the classic trap).
    nth_value is NULL for 1-order customers, so it is COALESCEd to -1 to
    keep the result column a non-nullable BIGINT (pandas hashing rule).
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(wf).alias("last_order"),
            F.coalesce(
                F.nth_value("o_orderkey", 2).over(wf), F.lit(-1)
            ).alias("second_order"),
            F.lead("o_orderkey", 1, -1).over(w).alias("next_order"),
        )
        .orderBy("o_custkey", "first_order", "o_orderkey")
    )


@register(
    "relational_pivot_unpivot",
    oracle="""
        WITH grid AS (SELECT DISTINCT o_orderpriority FROM orders),
             st(o_orderstatus) AS (VALUES ('F'), ('O'), ('P'))
        SELECT g.o_orderpriority, st.o_orderstatus,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
               COALESCE(CAST(CAST(SUM(CAST(o.o_totalprice
                   AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE), 0.0)
                   AS total_price
        FROM grid g
        CROSS JOIN st
        LEFT JOIN orders o
               ON o.o_orderpriority = g.o_orderpriority
              AND o.o_orderstatus = st.o_orderstatus
        GROUP BY g.o_orderpriority, st.o_orderstatus
        ORDER BY g.o_orderpriority, st.o_orderstatus
    """,
    tags=("relational", "pivot", "unpivot", "stack", "aggregation"),
)
def relational_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT → UNPIVOT roundtrip — the reshaping surface
    (``DataFrame.pivot`` / ``stack``; Presto spells the same reshape
    with CASE aggregates + ``map_agg``): order counts and decimal price
    totals pivot into one wide column set per order status, then
    ``stack`` unpivots the wide frame back to long, and the roundtrip
    must equal the oracle's direct grouped aggregation over the full
    (priority x status) grid — absent combinations must surface as
    0-count rows, not vanish (the COALESCE both engines apply).

    Pivot with EXPLICIT values is the scale-correct spelling: Spark
    skips the extra distinct-values job and the plan is one hash
    aggregation producing all pivot columns in a single pass — at any
    corpus size the reshape costs exactly one shuffle on the group key.
    """
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("string")
            .cast("double").alias("tp"),
        )
    )
    stack = F.expr(
        "stack(3, 'F', F_n, F_tp, 'O', O_n, O_tp, 'P', P_n, P_tp) "
        "AS (o_orderstatus, n_raw, tp_raw)"
    )
    return (
        wide.select("o_orderpriority", stack)
        .select(
            "o_orderpriority",
            "o_orderstatus",
            F.coalesce(F.col("n_raw"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("tp_raw"), F.lit(0.0)).alias("total_price"),
        )
        .orderBy("o_orderpriority", "o_orderstatus")
    )


@register(
    "relational_recursive_cte",
    oracle="""
        WITH RECURSIVE walk(custkey, node, depth) AS (
            SELECT c_custkey, c_custkey, 0 FROM customer
            UNION ALL
            SELECT custkey, CAST(FLOOR(node / 10) AS BIGINT), depth + 1
            FROM walk WHERE node >= 10
        )
        SELECT w.node AS root_key,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(MAX(w.depth) AS INT) AS max_depth,
               CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,10)))
                    AS VARCHAR) AS DOUBLE) AS total_acctbal
        FROM walk w
        JOIN customer c ON c.c_custkey = w.custkey
        WHERE w.node < 10
        GROUP BY w.node
        ORDER BY root_key
    """,
    tags=("relational", "recursive-cte", "hierarchy", "iteration"),
)
def relational_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE hierarchy walk — the iterative-SQL surface
    (Spark 4's recursive CTE; Trino spells the identical query with
    ``WITH RECURSIVE``). Every customer key walks its implicit decimal
    forest (``parent(k) = floor(k / 10)``) up to a single-digit root,
    then a per-root rollup reports subtree size, maximum walk depth, and
    the exact-decimal account-balance total. The recursion terminates by
    the ``node >= 10`` guard, never by the engine's depth limit.

    Scale shape: each recursion level is a narrow projection + filter
    over the previous level's frame — NO shuffle and no join inside the
    loop — and the level count is log10(max key) (6 levels at 150M keys,
    8 at 15B), so the iteration depth grows logarithmically while each
    level's row count SHRINKS by 10x (only rows with node >= 10
    recurse). The single shuffle is the terminal groupBy on the root
    key; the join back to ``customer`` is keyed on the primary key the
    anchor read, so AQE plans it as a shuffle join on already-hashed
    keys. Nothing in the loop is driver-side: Spark's UnionLoop executes
    the recursion as iterative plan expansion inside the DAG scheduler.
    """
    cust = load_table(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("rcte_customer_v")
    return spark.sql(
        """
        WITH RECURSIVE walk(custkey, node, depth) AS (
            SELECT c_custkey, c_custkey, 0 FROM rcte_customer_v
            UNION ALL
            SELECT custkey, CAST(FLOOR(node / 10) AS BIGINT), depth + 1
            FROM walk WHERE node >= 10
        )
        SELECT w.node AS root_key,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(MAX(w.depth) AS INT) AS max_depth,
               CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,10)))
                    AS STRING) AS DOUBLE) AS total_acctbal
        FROM walk w
        JOIN rcte_customer_v c ON c.c_custkey = w.custkey
        WHERE w.node < 10
        GROUP BY w.node
        ORDER BY root_key
        """
    )
