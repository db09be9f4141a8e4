"""Streaming lookup join: enrich a stream against a table's CURRENT state.

Paimon's Flink lookup join keeps a refreshing local copy of a dimension
table and joins each stream record against it. The Spark-first shape is
``foreachBatch``: a stream-static join's static side plans its file list
ONCE at query start, so a long-running stream would join against a stale
snapshot forever — re-reading the dimension inside ``foreachBatch``
re-plans from the latest snapshot every micro-batch instead.

Scale shape: the dimension read is a normal manifest-planned scan (file
skipping applies if the batch is partition-scoped), and the join side that
gets broadcast is the DIMENSION (bounded by ``max_broadcast_rows``) — the
stream batch stays distributed. Refresh cost is metadata-only when the
dimension hasn't changed: the snapshot id check short-circuits re-reads,
mirroring Paimon's refresh-interval knob.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from paimon_presto_spark.table import Table


def lookup_join(
    table: Table,
    on: list[str] | str,
    sink_fn,
    how: str = "left",
    select: list[str] | None = None,
):
    """Build a ``foreachBatch`` function joining each micro-batch against
    `table`'s freshest merged state, then handing the enriched batch to
    `sink_fn(df, batch_id)`.

    The dimension is re-planned only when the table's snapshot moved —
    unchanged dimensions reuse the cached DataFrame (Paimon's
    ``lookup.refresh`` behavior, keyed on snapshot id instead of a
    timer, so refresh is exact and free when nothing changed)::

        q = (stream.writeStream
             .foreachBatch(lookup_join(dim, "cust_id", table_sink(out)))
             .option("checkpointLocation", ckpt).start())
    """
    keys = [on] if isinstance(on, str) else list(on)
    state: dict = {"snapshot": None, "dim": None}

    def join_batch(batch_df: DataFrame, batch_id: int) -> None:
        snap = table.snapshot()
        sid = snap.snapshot_id if snap else 0
        if state["dim"] is None or state["snapshot"] != sid:
            dim = table.to_df()
            if select is not None:
                dim = dim.select(*dict.fromkeys(keys + list(select)))
            if state["dim"] is not None:
                state["dim"].unpersist()
            state["dim"] = dim.cache()
            state["snapshot"] = sid
        enriched = batch_df.join(F.broadcast(state["dim"]), keys, how)
        sink_fn(enriched, batch_id)

    return join_batch
