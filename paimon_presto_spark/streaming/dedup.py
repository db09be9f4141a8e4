"""Streaming deduplication: first-occurrence pass-through of distinct
document contents over an unbounded stream — the streaming twin of
``operators/dedup.exact_dedup`` for continuously-ingested corpora.

Built on Spark's stateful ``dropDuplicates`` family (state-store backed,
exactly-once under checkpointing) keyed by the 128-bit content hash, so
the state rows are 16-byte keys, never document payloads. Without a
watermark the state grows with distinct contents (fine for bounded key
domains); with one, ``dropDuplicatesWithinWatermark`` expires state past
the event-time horizon — the standard bounded-state configuration for a
24/7 ingest pipeline at 100 TB/day.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    watermark_col: str | None = None,
    delay: str = "1 hour",
) -> DataFrame:
    """Emit only the first occurrence of each distinct ``text_col`` content.

    ``watermark_col`` (an event-time timestamp column) bounds the dedup
    state: duplicates arriving within ``delay`` of the original are
    dropped, later state is expired. Omit it for exact unbounded dedup.
    """
    hashed = docs.withColumn(
        "__text_hash", F.md5(F.col(text_col).cast("binary"))
    )
    if watermark_col is not None:
        return hashed.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(
            ["__text_hash"]
        ).drop("__text_hash")
    return hashed.dropDuplicates(["__text_hash"]).drop("__text_hash")
