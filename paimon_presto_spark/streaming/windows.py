"""Streaming window operators: watermarked tumbling aggregation, session
windows, and a custom stateful running aggregate.

These are the streaming twins of the batch queries in
``queries/events.py`` — same semantics, expressed with native Structured
Streaming primitives so state management, late-data handling, and
incremental output are Spark's problem, not ours:

- tumbling:   ``F.window`` + ``withWatermark`` (late rows beyond the
  watermark are dropped deterministically)
- sessions:   ``F.session_window`` (gap-based, merges as events arrive)
- custom:     ``applyInPandasWithState`` for state machines the built-ins
  can't express (running per-key totals with timeout eviction here as the
  canonical template)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window counts/sums (streaming or batch DF).

    ``ts_col`` must be a TimestampType column (use ``timestamp_micros`` on
    the nanos-long column our events loader produces).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked sliding-window counts/sums: each event lands in
    window/slide overlapping windows (state cost scales with that factor —
    keep the ratio small at scale)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide).alias("win"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    within: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join: right events within ``[left.ts,
    left.ts + within]`` per key — the "click after view" correlation shape.

    Both sides carry watermarks plus an event-time range condition, which is
    what lets Spark BOUND the join state: buffered rows older than
    watermark + interval are evicted instead of accumulating forever. At
    scale this is the difference between a join that runs for months and
    one that OOMs in an hour.
    """
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{ts_col}") >= F.col(f"l.{ts_col}"))
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner").select(
        F.col(f"l.{key}").alias(key),
        F.col(f"l.{ts_col}").alias("left_ts"),
        F.col(f"r.{ts_col}").alias("right_ts"),
        F.col("l.event_type").alias("left_type"),
        F.col("r.event_type").alias("right_type"),
    )


def sessionized(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    key: str = "user_id",
) -> DataFrame:
    """Gap-based session windows per key (streaming twin of the batch
    ``events_sessionization`` query)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("win"), key)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col(key),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


RUNNING_STATE_SCHEMA = "total double, n bigint"
RUNNING_OUTPUT_SCHEMA = "user_id bigint, total double, n bigint"


def running_totals_stateful(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Custom stateful operator: running per-key value totals across
    micro-batches via ``applyInPandasWithState``.

    Template for operators the built-ins can't express (decayed counters,
    CEP-ish state machines, online dedup). State is (total, n) per key —
    constant size, so executor state stores stay bounded at any key count.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key_tuple, pdfs, state: "GroupState"):
        import pandas as pd

        total, n = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            total += float(pdf["value"].sum())
            n += int(len(pdf))
        state.update((total, n))
        yield pd.DataFrame(
            {"user_id": [key_tuple[0]], "total": [total], "n": [n]}
        )

    return events.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
