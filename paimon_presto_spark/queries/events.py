"""Event-stream analytics over the ``events`` table (batch semantics).

The reference connector has no streaming path (SURVEY §1.2) — these
operators are the batch-queryable core of our Structured Streaming
extension (``paimon_presto_spark/streaming``): tumbling windows,
gap-based sessionization, as-of joins, and JSON property extraction.
Each is SQL-expressible, so every entry has a DuckDB oracle.

``events.ts`` arrives as parquet TIMESTAMP of either nanosecond or
microsecond unit depending on the testdata generation; the loader
(``sources/testdata.load_table``) normalizes both to a BIGINT of
epoch-nanoseconds, and all time arithmetic here is integer math on nanos —
deterministic across engines by construction. The DuckDB oracles read the
same column as a timestamp and convert with ``epoch_ns``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from paimon_presto_spark.queries import register
from paimon_presto_spark.queries.relational import dsum, davg, o_dsum, o_davg
from paimon_presto_spark.sources.testdata import load_table

NS_PER_S = 1_000_000_000
WINDOW_S = 300
SESSION_GAP_S = 1800


@register(
    "events_tumbling_window",
    oracle=f"""
        SELECT (epoch_ns(ts) // {WINDOW_S * NS_PER_S}) * {WINDOW_S} AS window_start,
               event_type,
               COUNT(*) AS n_events,
               {o_dsum('value', 'total_value')},
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type
    """,
    tags=("events", "window-agg", "streaming-batch"),
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling-window rollup (batch twin of the streaming agg).

    ``window_start`` is epoch seconds via integer division — the exact
    bucketing ``F.window`` performs, without engine-local timestamp reprs.
    """
    ev = load_table(spark, sf_dir, "events")
    # Integer floor-div via expr to avoid any float rounding at bucket edges.
    bucket = F.expr(f"(ts DIV {WINDOW_S * NS_PER_S}) * {WINDOW_S}")
    return (
        ev.groupBy(bucket.alias("window_start"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "events_sessionization",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
                   LAG(epoch_ns(ts)) OVER w AS prev_ns
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
        ), flagged AS (
            SELECT user_id, event_id, ts_ns,
                   CASE WHEN prev_ns IS NULL
                             OR ts_ns - prev_ns > {SESSION_GAP_S * NS_PER_S}
                        THEN 1 ELSE 0 END AS new_session
            FROM seq
        ), sessions AS (
            SELECT user_id, ts_ns,
                   CAST(SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts_ns, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_seq
            FROM flagged
        )
        SELECT user_id, session_seq,
               COUNT(*) AS n_events,
               (MAX(ts_ns) - MIN(ts_ns)) // {NS_PER_S} AS duration_s
        FROM sessions
        GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
    """,
    tags=("events", "sessionization", "window"),
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity splits a session).

    Classic lag → flag → prefix-sum construction; in Structured Streaming
    the same semantics come from ``session_window``/
    ``applyInPandasWithState`` (``streaming/windows.py``). All integer
    nanosecond arithmetic.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("ts_ns"),
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) > SESSION_GAP_S * NS_PER_S),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.select(
        "user_id",
        "ts_ns",
        "event_id",
        F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts_ns", "event_id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ).alias("session_seq"),
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            ((F.max("ts_ns") - F.min("ts_ns")) / NS_PER_S).cast("long").alias("duration_s"),
        )
        .orderBy("user_id", "session_seq")
    )


@register(
    "events_asof_join",
    oracle=f"""
        WITH seq AS (
            SELECT event_id, user_id, event_type, epoch_ns(ts) AS ts_ns,
                   LAST_VALUE(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END
                              IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS last_view_ns
            FROM events
        )
        SELECT event_id, user_id,
               ts_ns // {NS_PER_S} AS purchase_s,
               CASE WHEN last_view_ns IS NULL THEN -1
                    ELSE (ts_ns - last_view_ns) // {NS_PER_S} END AS view_to_buy_s
        FROM seq
        WHERE event_type = 'purchase'
        ORDER BY event_id
    """,
    tags=("events", "asof-join", "window"),
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest prior (or same-instant)
    'view' of the same user.

    Spark lacks a native as-of join; the idiomatic scalable form is a single
    partitioned window pass with ``last(..., ignorenulls)`` — no
    range-condition join explosion (SURVEY §7 custom-operator case (a):
    composition of existing ops).
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    enriched = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").alias("ts_ns"),
        F.last(view_ts, ignorenulls=True).over(w).alias("last_view_ns"),
    )
    return (
        enriched.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.expr(f"ts_ns DIV {NS_PER_S}").alias("purchase_s"),
            # NULL-free sentinel (-1 = "no prior view"): nullable int columns
            # floatify under pandas-based result hashing, breaking equality.
            F.coalesce(
                F.expr(f"(ts_ns - last_view_ns) DIV {NS_PER_S}"), F.lit(-1)
            ).alias("view_to_buy_s"),
        )
        .orderBy("event_id")
    )


@register(
    "events_json_props",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
               COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_distinct_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("events", "json", "functions"),
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction — SURVEY §2.2 JSON ops family."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            F.max(k).alias("max_k"),
            F.countDistinct(k).alias("n_distinct_k"),
        )
        .orderBy("event_type")
    )


OUTAGE_WINDOW_S = 60


@register(
    "events_interval_join",
    oracle=f"""
        WITH w AS (
            SELECT event_id AS outage_id,
                   epoch_ns(ts) AS ws,
                   epoch_ns(ts) + {OUTAGE_WINDOW_S * NS_PER_S} AS we
            FROM events WHERE event_type = 'error'
        ),
        e AS (
            SELECT event_id, user_id, epoch_ns(ts) AS tns
            FROM events WHERE event_type <> 'error'
        )
        SELECT w.outage_id,
               COUNT(*) AS n_events,
               COUNT(DISTINCT e.user_id) AS n_users,
               MIN(e.event_id) AS first_event
        FROM w JOIN e ON e.tns >= w.ws AND e.tns < w.we
        GROUP BY w.outage_id
        ORDER BY w.outage_id
    """,
    tags=("events", "range-join", "interval-join"),
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join via time bucketing — the second custom
    operator Spark lacks natively (next to the as-of join): every 'error'
    event opens a 60 s outage window; count the non-error events (and
    distinct users) falling inside each. ``operators/rangejoin`` turns
    the non-equi containment join into an equi-join on time buckets — no
    BroadcastNestedLoopJoin at any scale (SURVEY §7 custom-operator case
    (a): composition of existing ops).
    """
    from paimon_presto_spark.operators.rangejoin import interval_join

    ev = load_table(spark, sf_dir, "events")
    windows = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("outage_id"),
        F.col("ts").alias("ws"),
        (F.col("ts") + OUTAGE_WINDOW_S * NS_PER_S).alias("we"),
    )
    points = ev.filter(F.col("event_type") != "error").select(
        F.col("event_id").alias("p_event_id"), "user_id", F.col("ts").alias("tns")
    )
    joined = interval_join(
        points, windows, "tns", "ws", "we", bucket_width=OUTAGE_WINDOW_S * NS_PER_S
    )
    return (
        joined.groupBy("outage_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("p_event_id").alias("first_event"),
        )
        .orderBy("outage_id")
    )


@register(
    "events_interval_join_outer",
    oracle=f"""
        WITH w AS (
            SELECT event_id AS outage_id,
                   epoch_ns(ts) AS ws,
                   epoch_ns(ts) + {OUTAGE_WINDOW_S * NS_PER_S} AS we
            FROM events WHERE event_type = 'error'
        ),
        e AS (
            SELECT event_id, epoch_ns(ts) AS tns
            FROM events WHERE event_type <> 'error'
        ),
        per AS (
            SELECT e.event_id, COUNT(w.outage_id) AS n_windows
            FROM e LEFT JOIN w ON e.tns >= w.ws AND e.tns < w.we
            GROUP BY e.event_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(CASE WHEN n_windows > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_covered,
               CAST(SUM(CASE WHEN n_windows = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_uncovered,
               CAST(SUM(n_windows) AS BIGINT) AS n_pairs
        FROM per
    """,
    tags=("events", "range-join", "interval-join", "outer-join"),
)
def events_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT interval join: unmatched points survive null-extended because
    ``operators/rangejoin`` keeps the range predicate in the join
    condition itself (a post-join filter would silently drop them — the
    round-3 advisor finding). Coverage summary: how many non-error events
    fall inside / outside any outage window, and total (point, window)
    pairs — each checked against DuckDB's native non-equi LEFT JOIN."""
    from paimon_presto_spark.operators.rangejoin import interval_join

    ev = load_table(spark, sf_dir, "events")
    windows = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("outage_id"),
        F.col("ts").alias("ws"),
        (F.col("ts") + OUTAGE_WINDOW_S * NS_PER_S).alias("we"),
    )
    points = ev.filter(F.col("event_type") != "error").select(
        F.col("event_id").alias("p_event_id"), F.col("ts").alias("tns")
    )
    j = interval_join(
        points, windows, "tns", "ws", "we",
        bucket_width=OUTAGE_WINDOW_S * NS_PER_S, how="left",
    )
    per = j.groupBy("p_event_id").agg(F.count("outage_id").alias("n_windows"))
    return per.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum((F.col("n_windows") > 0).cast("int")).cast("bigint").alias("n_covered"),
        F.sum((F.col("n_windows") == 0).cast("int")).cast("bigint").alias("n_uncovered"),
        F.sum("n_windows").cast("bigint").alias("n_pairs"),
    )


ROLLUP_LEVELS_S = (300, 3600, 86400)


def _o_rollup_level(g: int) -> str:
    return f"""
        SELECT {g} AS level_s,
               (epoch_ns(ts) // {g} // {NS_PER_S}) * {g} AS window_start,
               COUNT(*) AS n_events,
               {o_dsum('value', 'total_value')}
        FROM events
        GROUP BY 2
    """


@register(
    "events_hierarchical_rollup",
    oracle=(
        "\nUNION ALL\n".join(_o_rollup_level(g) for g in ROLLUP_LEVELS_S)
        + "\nORDER BY level_s, window_start"
    ),
    tags=("events", "rollup", "hypertable", "continuous-aggregate"),
)
def events_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: 5-minute, hourly, and daily
    rollups where each coarser level re-aggregates the finer LEVEL, not
    the raw table (``operators/rollup_hierarchy.py``). The oracle computes
    every level directly from raw — equality proves the re-aggregation is
    exact (algebraic counts + decimal sums), which is what lets a 100 TB
    events table serve day-granularity dashboards from |hourly windows|
    rows.
    """
    from paimon_presto_spark.operators.rollup_hierarchy import hierarchical_rollup

    ev = load_table(spark, sf_dir, "events")
    out = hierarchical_rollup(ev, "ts", "value", list(ROLLUP_LEVELS_S))
    return (
        out.select(
            "level_s",
            "window_start",
            "n_events",
            F.col("total_value").cast("string").cast("double").alias("total_value"),
        )
        .orderBy("level_s", "window_start")
    )


FUNNEL_STEPS = ("signup", "click", "purchase")


@register(
    "events_funnel_steps",
    oracle=f"""
        WITH s1 AS (
            SELECT user_id, MIN(epoch_ns(ts)) AS t1
            FROM events WHERE event_type = '{FUNNEL_STEPS[0]}'
            GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t2, MIN(t1) AS t1
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND epoch_ns(e.ts) > s1.t1
            GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t3, MIN(t2) AS t2
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND epoch_ns(e.ts) > s2.t2
            GROUP BY e.user_id
        )
        SELECT 1 AS step_order, '{FUNNEL_STEPS[0]}' AS step,
               (SELECT COUNT(*) FROM s1) AS n_users,
               CAST(0 AS BIGINT) AS total_lag_s
        UNION ALL
        SELECT 2, '{FUNNEL_STEPS[1]}',
               (SELECT COUNT(*) FROM s2),
               (SELECT COALESCE(CAST(SUM((t2 - t1) // {NS_PER_S}) AS BIGINT), 0) FROM s2)
        UNION ALL
        SELECT 3, '{FUNNEL_STEPS[2]}',
               (SELECT COUNT(*) FROM s3),
               (SELECT COALESCE(CAST(SUM((t3 - t2) // {NS_PER_S}) AS BIGINT), 0) FROM s3)
        ORDER BY step_order
    """,
    tags=("events", "funnel", "sequence-match", "match-recognize"),
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (MATCH_RECOGNIZE-lite): per user, the first
    signup, the first click strictly after it, and the first purchase
    strictly after that; reported as per-step reach + summed conversion
    lag. Mirrors the sequential-pattern queries Presto serves with
    ``min_by``/sequence UDFs (reference exposes the raw events scan;
    SURVEY §2.2 window/session family).

    Spark shape: ONE shuffle — ``collect_list`` per user, ``array_sort``,
    then a single ``F.aggregate`` left-fold runs the state machine inside
    whole-stage codegen (no Python, no self-joins). The fold over the
    ts-sorted sequence with strict ``ts >`` guards is provably equal to
    the oracle's min-subquery chain, independent of tie order. At 100 TB
    the per-user sequence is bounded by per-user activity, not corpus
    size, and the final 3-row unpivot is driver-trivial. All time math is
    integer nanoseconds (epoch-ns BIGINT; ``DIV`` avoids double rounding
    per ADVICE r2 on rangejoin).
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("ts"), F.col("event_type").alias("et")))
        ).alias("seq")
    )
    init = F.struct(
        F.lit(None).cast("long").alias("t1"),
        F.lit(None).cast("long").alias("t2"),
        F.lit(None).cast("long").alias("t3"),
    )
    scan = F.aggregate(
        "seq",
        init,
        lambda acc, e: F.struct(
            F.when(
                acc["t1"].isNull() & (e["et"] == FUNNEL_STEPS[0]), e["ts"]
            ).otherwise(acc["t1"]).alias("t1"),
            F.when(
                acc["t2"].isNull()
                & acc["t1"].isNotNull()
                & (e["et"] == FUNNEL_STEPS[1])
                & (e["ts"] > acc["t1"]),
                e["ts"],
            ).otherwise(acc["t2"]).alias("t2"),
            F.when(
                acc["t3"].isNull()
                & acc["t2"].isNotNull()
                & (e["et"] == FUNNEL_STEPS[2])
                & (e["ts"] > acc["t2"]),
                e["ts"],
            ).otherwise(acc["t3"]).alias("t3"),
        ),
    )
    hit = per_user.select(scan.alias("s")).select("s.t1", "s.t2", "s.t3")
    totals = hit.agg(
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
        F.coalesce(
            F.sum(F.expr(f"(t2 - t1) DIV {NS_PER_S}")), F.lit(0)
        ).cast("long").alias("lag2"),
        F.coalesce(
            F.sum(F.expr(f"(t3 - t2) DIV {NS_PER_S}")), F.lit(0)
        ).cast("long").alias("lag3"),
    )
    return totals.select(
        F.expr(
            "stack(3, "
            f"1, '{FUNNEL_STEPS[0]}', n1, CAST(0 AS BIGINT), "
            f"2, '{FUNNEL_STEPS[1]}', n2, lag2, "
            f"3, '{FUNNEL_STEPS[2]}', n3, lag3) "
            "AS (step_order, step, n_users, total_lag_s)"
        )
    ).orderBy("step_order")


WEEK_NS = 7 * 86_400 * NS_PER_S


@register(
    "events_cohort_retention",
    oracle=f"""
        WITH act AS (
            SELECT DISTINCT user_id, epoch_ns(ts) // {WEEK_NS} AS wk
            FROM events
        ),
        cohort AS (SELECT user_id, MIN(wk) AS cw FROM act GROUP BY user_id),
        ret AS (
            SELECT c.cw AS cohort_week,
                   a.wk - c.cw AS week_offset,
                   COUNT(*) AS n_active
            FROM act a JOIN cohort c USING (user_id)
            GROUP BY 1, 2
        )
        SELECT cohort_week, week_offset, n_active,
               CAST(MAX(CASE WHEN week_offset = 0 THEN n_active END)
                    OVER (PARTITION BY cohort_week) AS BIGINT) AS cohort_size
        FROM ret
        ORDER BY cohort_week, week_offset
    """,
    tags=("events", "cohort", "retention", "window"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention — the canonical product-analytics triangle:
    users grouped by first-activity week, counted at each week offset
    they return. Three narrow aggregations (distinct user-weeks →
    per-user first week → per-(cohort, offset) counts) plus one window
    for the cohort size; every shuffle carries (user_id, week) pairs,
    never events. Integer epoch-week arithmetic (``ts DIV``, matching the
    oracle's ``epoch_ns // week``) and integer-only outputs keep the
    cross-engine hash trivially stable — retention RATios are left to the
    consumer, who has both numerator and denominator.
    """
    ev = load_table(spark, sf_dir, "events")
    act = (
        ev.select("user_id", F.expr(f"ts DIV {WEEK_NS}").alias("wk"))
        .distinct()
    )
    cohort = act.groupBy("user_id").agg(F.min("wk").alias("cw"))
    ret = (
        act.join(cohort, "user_id")
        .groupBy(
            F.col("cw").alias("cohort_week"),
            (F.col("wk") - F.col("cw")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    w = Window.partitionBy("cohort_week")
    return ret.select(
        "cohort_week", "week_offset", "n_active",
        F.max(
            F.when(F.col("week_offset") == 0, F.col("n_active"))
        ).over(w).cast("bigint").alias("cohort_size"),
    ).orderBy("cohort_week", "week_offset")


@register(
    "events_path_bigrams",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_ns(ts), event_id) AS prev
            FROM events
        )
        SELECT prev AS step_from, event_type AS step_to,
               COUNT(*) AS n_transitions,
               COUNT(DISTINCT user_id) AS n_users
        FROM seq
        WHERE prev IS NOT NULL
        GROUP BY 1, 2
        ORDER BY n_transitions DESC, step_from, step_to
        LIMIT 20
    """,
    tags=("events", "path-analysis", "sequence-mining", "window"),
)
def events_path_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the most-travelled consecutive event-type
    transitions (bigrams) across all user journeys — the click-path
    question behind funnel tools. One window per user orders each
    journey (event_id breaks timestamp ties so both engines pick the
    same predecessor), then a single aggregation counts transitions and
    distinct travellers; the shuffle carries (user, type, type) rows,
    never payloads. Top-20 with a deterministic tie-break.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type",
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    return (
        seq.groupBy(
            F.col("prev").alias("step_from"),
            F.col("event_type").alias("step_to"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_transitions"), "step_from", "step_to")
        .limit(20)
    )


@register(
    "events_window_anomaly",
    oracle=f"""
        WITH buckets AS (
            SELECT (epoch_ns(ts) // {WINDOW_S * NS_PER_S}) * {WINDOW_S}
                       AS window_start,
                   event_type,
                   COUNT(*) AS n
            FROM events
            GROUP BY 1, 2
        ),
        stats AS (
            SELECT event_type,
                   COUNT(*) AS n_windows,
                   SUM(CAST(n AS DECIMAL(28,10))) AS s1,
                   SUM(CAST(n AS DECIMAL(28,10)) * n) AS s2
            FROM buckets GROUP BY event_type
        ),
        scored AS (
            SELECT b.window_start, b.event_type, b.n,
                   CAST(s.s1 AS DOUBLE) / s.n_windows AS mu,
                   SQRT(CAST(s.s2 AS DOUBLE) / s.n_windows
                        - (CAST(s.s1 AS DOUBLE) / s.n_windows)
                          * (CAST(s.s1 AS DOUBLE) / s.n_windows)) AS sigma
            FROM buckets b JOIN stats s USING (event_type)
        )
        SELECT window_start, event_type, n,
               ROUND((n - mu) / sigma, 4) AS zscore
        FROM scored
        WHERE sigma > 0 AND ABS((n - mu) / sigma) >= 2.0
        ORDER BY ABS((n - mu) / sigma) DESC, window_start, event_type
        LIMIT 25
    """,
    tags=("events", "anomaly", "zscore", "monitoring"),
)
def events_window_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: 5-minute event-count buckets scored
    against their type's corpus mean/stddev, reporting windows at least
    2σ out — the monitoring question behind every traffic dashboard. Two
    aggregations (bucket counts, per-type moment sums) plus one
    broadcastable join of per-type stats back onto buckets; the moment
    sums ride DECIMAL so the mean/σ every bucket is scored against is
    bit-identical across engines, and the final z arithmetic is a fixed
    IEEE double sequence on identical operands. Top-25 with |z| and
    deterministic tie-breaks.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = F.expr(f"(ts DIV {WINDOW_S * NS_PER_S}) * {WINDOW_S}")
    buckets = ev.groupBy(
        bucket.alias("window_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    DECV = "decimal(28,10)"
    stats = buckets.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(F.col("n").cast(DECV)).alias("s1"),
        F.sum(F.col("n").cast(DECV) * F.col("n")).alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("n_windows")
    sigma = F.sqrt(
        F.col("s2").cast("double") / F.col("n_windows") - mu * mu
    )
    scored = (
        buckets.join(stats, "event_type")
        .withColumn("mu", mu)
        .withColumn("sigma", sigma)
        .withColumn("z", (F.col("n") - F.col("mu")) / F.col("sigma"))
    )
    return (
        scored.filter((F.col("sigma") > 0) & (F.abs("z") >= 2.0))
        .select(
            "window_start", "event_type", "n",
            F.round("z", 4).alias("zscore"),
        )
        .orderBy(F.abs("z").desc(), "window_start", "event_type")
        .limit(25)
    )


TOUCH_TYPES = ("click", "view")


@register(
    "events_attribution",
    oracle=f"""
        WITH w AS (
            SELECT event_type, value,
                   LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
                                   THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS last_touch,
                   FIRST_VALUE(CASE WHEN event_type IN ('click', 'view')
                                    THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS first_touch
            FROM events
        ),
        conv AS (SELECT * FROM w WHERE event_type = 'purchase')
        SELECT model, touch, CAST(COUNT(*) AS BIGINT) AS n_conversions,
               {o_dsum('value', 'revenue')}
        FROM (
            SELECT 'first' AS model, COALESCE(first_touch, 'none') AS touch,
                   value FROM conv
            UNION ALL
            SELECT 'last', COALESCE(last_touch, 'none'), value FROM conv
        )
        GROUP BY model, touch
        ORDER BY model, touch
    """,
    tags=("events", "attribution", "window", "navigation"),
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-/last-touch revenue attribution: every purchase credits its
    user's first and most recent touchpoint (click/view) at-or-before the
    purchase — the marketing-analytics question event warehouses answer
    with conditional value navigation. One window per model over the
    user's timeline (``first``/``last`` with ignorenulls over a
    conditional projection — no self-join, no per-conversion scan);
    at 100 TB the shuffle is one user-keyed exchange shared by both
    windows, with per-task work bounded by per-user activity. Revenue
    rides DECIMAL; (ts, event_id) ordering pins ties.
    """
    ev = load_table(spark, sf_dir, "events")
    touch = F.when(
        F.col("event_type").isin(*TOUCH_TYPES), F.col("event_type")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    conv = (
        ev.withColumn("last_touch", F.last(touch, ignorenulls=True).over(w))
        .withColumn("first_touch", F.first(touch, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
    )
    first = conv.select(
        F.lit("first").alias("model"),
        F.coalesce("first_touch", F.lit("none")).alias("touch"),
        "value",
    )
    last = conv.select(
        F.lit("last").alias("model"),
        F.coalesce("last_touch", F.lit("none")).alias("touch"),
        "value",
    )
    return (
        first.unionByName(last)
        .groupBy("model", "touch")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            dsum(F.col("value"), "revenue"),
        )
        .orderBy("model", "touch")
    )
