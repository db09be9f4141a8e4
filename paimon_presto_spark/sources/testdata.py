"""Loader for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).

Spark-first notes: ``spark.read.parquet`` gives the vectorized columnar
reader, so projection/predicate pushdown into the scan is free (the role
``PrestoPageSourceBase.java:79,145-172`` played row-at-a-time in the
reference). At 100 TB these reads become multi-file scans whose splits Spark
plans itself (the role of ``PrestoSplitManager.java:46-82``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always be broadcast in joins. At any
#: scale factor these stay tiny (region=5, nation=25) or bounded, so marking
#: them avoids a shuffle on the big fact-table side.
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts has shipped as both parquet TIMESTAMP(NANOS) and
        # TIMESTAMP(MICROS) across testdata generations. Normalize to an
        # epoch-nanosecond BIGINT either way: all downstream time arithmetic
        # is integer math on nanos (see queries/events.py), which is what
        # keeps it engine-portable and bit-deterministic. nanosAsLong makes
        # the NANOS flavor arrive as a long already; the MICROS flavor
        # arrives as a (NTZ) timestamp we convert under the UTC session tz.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type.startswith("timestamp"):
            from pyspark.sql import functions as F

            df = df.withColumn(
                "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
            )
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
