"""Schema-evolving CDC ingestion.

Paimon's CDC ingestion (its flink-cdc sink family) applies upstream schema
changes to the table as part of the write: unseen columns are added,
losslessly-widenable type changes are applied, and records missing columns
the table has are null-padded. This module is the Spark-native equivalent:
one call aligns the table schema to the incoming batch, then commits it
through the normal write path.

Scale shape: schema evolution is metadata-only (a new schema file; old
data files are projected through field-id casts on read, never rewritten),
so an evolving 100 TB ingest pays exactly what a non-evolving one does —
the schema diff is computed on the driver from the DataFrame's StructType,
with zero extra passes over data.

Use with streaming via ``foreachBatch``::

    stream.writeStream.foreachBatch(
        lambda df, bid: cdc_ingest(catalog, "default", "events", df)
    )

For partial-row upstreams (only changed columns present per record), put
the table in ``merge-engine = partial-update`` — with the default
deduplicate engine a full row replaces the previous one, nulls included
(standard CDC full-row semantics).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from paimon_presto_spark.table import Snapshot, _parse_type


def evolve_schema(catalog, db: str, name: str, df: DataFrame) -> list[str]:
    """Align ``db.name``'s schema to ``df``'s: add unseen columns, widen
    widenable types. Returns a log of applied changes (empty = no-op).
    Incompatible changes (narrowing, type flips) raise before anything is
    applied — the batch either fits after evolution or is rejected whole.
    """
    from paimon_presto_spark.catalog import _is_widening, _normalize_type

    t = catalog.get_table(db, name)
    schema = t.schema()
    existing = {f["name"].lower(): f for f in schema.fields}
    adds: list[tuple[str, str]] = []
    widens: list[tuple[str, str]] = []
    for sf in df.schema.fields:
        ddl = sf.dataType.simpleString()
        cur = existing.get(sf.name.lower())
        if cur is None:
            adds.append((sf.name, ddl))
            continue
        if _normalize_type(cur["type"]) == _normalize_type(ddl):
            continue
        if _is_widening(cur["type"], ddl):
            widens.append((sf.name, ddl))
        elif not _is_widening(ddl, cur["type"]):
            # narrower input casts up on write; anything else is a flip
            raise ValueError(
                f"incompatible CDC type change for {sf.name!r}: "
                f"table has {cur['type']!r}, batch has {ddl!r}"
            )
    log = []
    for col, ddl in adds:
        catalog.add_column(db, name, col, ddl)
        log.append(f"ADD {col} {ddl}")
    for col, ddl in widens:
        catalog.update_column_type(db, name, col, ddl)
        log.append(f"WIDEN {col} -> {ddl}")
    return log


def cdc_ingest(
    catalog, db: str, name: str, df: DataFrame, mode: str = "auto"
) -> Snapshot:
    """Evolve the table to fit ``df``, null-pad columns the batch lacks,
    and commit (``upsert`` for primary-key tables, ``append`` otherwise —
    or force with ``mode``). Primary-key columns must be present."""
    evolve_schema(catalog, db, name, df)
    t = catalog.get_table(db, name)
    schema = t.schema()
    have = {c.lower() for c in df.columns}
    for f in schema.fields:
        if f["name"].lower() not in have:
            if f["name"] in schema.primary_keys:
                raise ValueError(f"CDC batch lacks primary-key column {f['name']!r}")
            df = df.withColumn(f["name"], F.lit(None).cast(_parse_type(f["type"])))
    if mode == "auto":
        mode = "upsert" if schema.primary_keys else "append"
    if mode == "upsert":
        return t.upsert(df)
    if mode == "append":
        return t.append(df)
    raise ValueError(f"unsupported mode {mode!r}")
