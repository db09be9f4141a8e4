"""Streaming source over a table's changelog.

``changelog_stream`` returns a streaming DataFrame of the table's row-level
changes: every committed data file is an immutable changelog segment, so
Spark's file stream source (which tracks seen files in its own checkpoint)
delivers each commit's rows exactly once. Primary-key tables carry
``__row_kind`` ('I'/'D') and the commit sequence ``__seq`` — consumers can
apply upserts downstream (the Paimon "changelog-producer = input" model).

Scale notes: the file-stream source lists the data directory per
micro-batch; ``maxFilesPerTrigger`` bounds batch size. For 100 TB tables
the listing cost is bounded by partition-dir pruning — pass
``subdir`` (e.g. ``__part_region=eu``) to stream one partition.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from paimon_presto_spark.table import KIND_COL, POS_COL, SEQ_COL, Table, _parse_type


def changelog_stream(
    spark: SparkSession,
    table: Table,
    subdir: str | None = None,
    max_files_per_trigger: int | None = None,
    starting_snapshot: int | None = None,
) -> DataFrame:
    """Streaming DataFrame over `table`'s data files (changelog semantics).

    Append-only tables yield their rows; primary-key tables additionally
    carry ``__row_kind`` / ``__seq`` system columns. ``starting_snapshot``
    is the Paimon ``scan.mode=from-snapshot`` startup mode: only changes
    committed at or after that snapshot are delivered (rows filtered on the
    commit sequence — earlier files are still listed once but contribute no
    rows, and the checkpoint marks them done).
    """
    schema = table.schema()
    fields = [
        T.StructField(f["name"], _parse_type(f["type"]), True) for f in schema.fields
    ]
    if schema.primary_keys:
        fields += [
            T.StructField(SEQ_COL, T.LongType(), True),
            T.StructField(POS_COL, T.LongType(), True),
            T.StructField(KIND_COL, T.StringType(), True),
        ]
    data_dir = os.path.join(table.path, "data")
    if subdir:
        data_dir = os.path.join(data_dir, subdir)
    os.makedirs(data_dir, exist_ok=True)
    reader = (
        spark.readStream.schema(T.StructType(fields))
        .option("recursiveFileLookup", "true")
        # compaction rewrites are named cpt-*: NOT new data — excluding
        # them keeps a 100 TB table's compact() from re-emitting the whole
        # table into every streaming consumer (the batch-side counterpart
        # is incremental_df skipping COMPACT commits)
        .option("pathGlobFilter", "data-*")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    out = reader.parquet(data_dir)
    if starting_snapshot is not None:
        if not schema.primary_keys:
            raise ValueError(
                "starting_snapshot requires a primary-key table (append-only "
                "files carry no commit sequence column)"
            )
        out = out.filter(F.col(SEQ_COL) >= starting_snapshot)
    return out
