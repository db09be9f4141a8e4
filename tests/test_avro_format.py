"""``file.format=avro`` — the reference's third declared format option
(``PrestoSqlTableOptionUtils.java:111-112``), served here by the pure-Python
container codec in ``sources/avroio.py`` (no spark-avro jar ships with this
distribution). Covers the raw codec, the table read/write integration,
stats-based file skipping, partitioned layout, schema evolution projection,
merge-on-read, and compaction over avro files.
"""

import datetime
import decimal
import os

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from paimon_presto_spark.sources import avroio


# ---------------------------------------------------------------------------
# raw codec
# ---------------------------------------------------------------------------


def _schema_all_types() -> T.StructType:
    return T.StructType(
        [
            T.StructField("b", T.BooleanType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("l", T.LongType()),
            T.StructField("f", T.FloatType()),
            T.StructField("d", T.DoubleType()),
            T.StructField("s", T.StringType()),
            T.StructField("bin", T.BinaryType()),
            T.StructField("dt", T.DateType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("dec", T.DecimalType(10, 2)),
            T.StructField("arr", T.ArrayType(T.IntegerType())),
            T.StructField("m", T.MapType(T.StringType(), T.LongType())),
            T.StructField("im", T.MapType(T.IntegerType(), T.StringType())),
            T.StructField(
                "st",
                T.StructType(
                    [
                        T.StructField("x", T.IntegerType()),
                        T.StructField("y", T.StringType()),
                    ]
                ),
            ),
        ]
    )


def _row(i: int) -> dict:
    return {
        "b": i % 2 == 0,
        "i": i,
        "l": i * 10_000_000_000,
        "f": float(i) + 0.5,
        "d": i / 7.0,
        "s": f"row-{i}-é中",
        "bin": bytes([i % 256, 0, 255]),
        "dt": datetime.date(2020, 1, 1) + datetime.timedelta(days=i),
        "ts": datetime.datetime(2021, 6, 1, 12, 0, 0) + datetime.timedelta(seconds=i),
        "dec": decimal.Decimal(i * 100 + i) / 100,
        "arr": [i, i + 1, None] if i % 3 == 0 else [i],
        "m": {"a": i, "b": i * 2},
        "im": {i: f"v{i}", i + 1: "w"},
        "st": {"x": i, "y": f"y{i}"},
    }


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_codec_roundtrip_all_types(tmp_path, codec):
    schema = _schema_all_types()
    avsc = avroio.spark_to_avro_schema(schema)
    path = str(tmp_path / "t.avro")
    w = avroio.AvroWriter(path, avsc, codec=codec)
    rows = [_row(i) for i in range(10_000)]  # >1 block (block size 4096)
    nulled = dict.fromkeys(rows[0])  # all-null row exercises every union
    rows.append(nulled)
    for r in rows:
        w.write(r)
    w.close()
    back = list(avroio.read_file_rows(path))
    assert len(back) == len(rows)
    r0, b0 = rows[7], back[7]
    assert b0["i"] == r0["i"] and b0["l"] == r0["l"] and b0["s"] == r0["s"]
    assert b0["bin"] == r0["bin"] and b0["dt"] == r0["dt"] and b0["ts"] == r0["ts"]
    assert b0["dec"] == r0["dec"]
    assert b0["arr"] == r0["arr"] and b0["m"] == r0["m"] and b0["im"] == r0["im"]
    assert b0["st"] == {"x": 7, "y": "y7"}
    assert abs(b0["f"] - r0["f"]) < 1e-6 and b0["d"] == r0["d"]
    assert all(v is None for v in back[-1].values())


def test_codec_negative_and_boundary_longs(tmp_path):
    schema = T.StructType([T.StructField("v", T.LongType())])
    avsc = avroio.spark_to_avro_schema(schema)
    path = str(tmp_path / "l.avro")
    vals = [0, -1, 1, 2**62, -(2**62), 2**63 - 1, -(2**63), 127, -128, None]
    w = avroio.AvroWriter(path, avsc)
    for v in vals:
        w.write({"v": v})
    w.close()
    assert [r["v"] for r in avroio.read_file_rows(path)] == vals


def test_avro_schema_to_spark_roundtrip():
    schema = _schema_all_types()
    avsc = avroio.spark_to_avro_schema(schema)
    back, _ = avroio.avro_to_spark_type(avsc)
    # field-by-field: physical types survive (all top-level nullable)
    for f, g in zip(schema.fields, back.fields):
        assert f.name == g.name
        assert f.dataType == g.dataType, f.name


def test_unsupported_codec_rejected(tmp_path):
    schema = T.StructType([T.StructField("v", T.LongType())])
    avsc = avroio.spark_to_avro_schema(schema)
    with pytest.raises(ValueError, match="codec"):
        avroio.AvroWriter(str(tmp_path / "x.avro"), avsc, codec="snappy")


def test_wide_schema_header_over_64k(tmp_path):
    """OCF headers embed the full schema JSON; a 2000-column schema clears
    64 KB, which the fixed-size header read used to truncate silently."""
    n_cols = 2000
    schema = T.StructType(
        [T.StructField(f"col_{i:04d}_padded_name", T.LongType()) for i in range(n_cols)]
    )
    avsc = avroio.spark_to_avro_schema(schema)
    import json as _json

    assert len(_json.dumps(avsc)) > 65536  # the scenario under test
    p = str(tmp_path / "wide.avro")
    w = avroio.AvroWriter(p, avsc)
    rows = [{f"col_{i:04d}_padded_name": r * n_cols + i for i in range(n_cols)}
            for r in range(3)]
    for r in rows:
        w.write(r)
    w.close()
    got = list(avroio.read_file_rows(p))
    assert got == rows


# ---------------------------------------------------------------------------
# table integration
# ---------------------------------------------------------------------------


def test_avro_map_column_roundtrip(spark, catalog):
    """map<int,string> columns ride the paimonMap array-of-records encoding;
    Arrow->pandas hands the writer a list of (key, value) tuples, not a
    dict — the encoder must accept both."""
    t = catalog.create_table(
        "default", "av_map", "k bigint, m map<int,string>",
        options={"file.format": "avro"},
    )
    t.append(spark.createDataFrame(
        [(1, {1: "a", 2: "b"}), (2, {}), (3, None)],
        "k bigint, m map<int,string>",
    ))
    got = {r["k"]: r["m"] for r in t.to_df().collect()}
    assert got[1] == {1: "a", 2: "b"}
    assert got[2] in ({}, None)  # empty map roundtrips as empty
    assert got[3] is None


def test_avro_partition_values_null_and_int(spark, catalog):
    """Partition dirs must match the parquet writer's Hive layout: NULLs as
    __HIVE_DEFAULT_PARTITION__ and integer values as plain ints even though
    Arrow->pandas floatifies a nullable bigint column (3 -> 3.0)."""
    import os as _os

    t = catalog.create_table(
        "default", "av_np", "k bigint, p bigint",
        partition_keys=["p"],
        options={"file.format": "avro"},
    )
    t.append(spark.createDataFrame(
        [(1, 3), (2, 3), (3, None), (4, 7)], "k bigint, p bigint"
    ))
    dirs = set()
    for root, _, files in _os.walk(t.path):
        for f in files:
            if f.endswith(".avro"):
                dirs.add(_os.path.basename(root))
    assert "__part_p=3" in dirs and "__part_p=7" in dirs  # not p=3.0
    assert "__part_p=__HIVE_DEFAULT_PARTITION__" in dirs
    got = {r["k"]: r["p"] for r in t.to_df().collect()}
    assert got == {1: 3, 2: 3, 3: None, 4: 7}
    # partition pruning still works over the typed values
    from paimon_presto_spark.plans.predicate import P

    scan = t.scan(predicate=P.eq("p", 7))
    assert [r["k"] for r in scan.to_df().collect()] == [4]


def test_avro_append_table_roundtrip(spark, catalog):
    t = catalog.create_table(
        "default",
        "av1",
        "k bigint, v string, price double, day date",
        options={"file.format": "avro"},
    )
    df = spark.range(0, 500).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") * 1.5).alias("price"),
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int") % 30).alias("day"),
    )
    t.append(df)
    got = t.scan().to_df()
    assert got.count() == 500
    assert set(got.columns) == {"k", "v", "price", "day"}
    row = got.filter(F.col("k") == 123).collect()[0]
    assert row["v"] == "v123" and row["price"] == 184.5
    assert row["day"] == datetime.date(2024, 1, 4)
    # files on disk are avro containers
    files = [
        fn
        for _r, _d, fns in os.walk(os.path.join(t.path, "data"))
        for fn in fns
        if fn.endswith(".avro")
    ]
    assert files, "no .avro data files registered"


def test_avro_stats_file_skipping(spark, catalog):
    from paimon_presto_spark.plans.predicate import P

    t = catalog.create_table(
        "default", "av2", "k bigint, v string", options={"file.format": "avro"}
    )
    # two commits → two files with disjoint k ranges
    lo = (
        spark.range(0, 100)
        .select(F.col("id").alias("k"), F.lit("lo").alias("v"))
        .coalesce(1)
    )
    hi = (
        spark.range(1000, 1100)
        .select(F.col("id").alias("k"), F.lit("hi").alias("v"))
        .coalesce(1)
    )
    t.append(lo)
    t.append(hi)
    scan_all = t.scan()
    assert len(scan_all.plan_files()) == 2
    pruned = t.scan(predicate=P.gte("k", 1000))
    assert len(pruned.plan_files()) == 1  # min/max stats from the avro writer
    assert pruned.to_df().count() == 100


def test_avro_partitioned_table_prune(spark, catalog):
    t = catalog.create_table(
        "default",
        "av3",
        "k bigint, region string, v double",
        partition_keys=["region"],
        options={"file.format": "avro"},
    )
    df = spark.range(0, 200).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, "east").otherwise("west").alias("region"),
        (F.col("id") * 1.0).alias("v"),
    )
    t.append(df)
    from paimon_presto_spark.plans.predicate import P

    pruned = t.scan(predicate=P.eq("region", "east"))
    files = pruned.plan_files()
    assert files and all(e["partition"] == {"region": "east"} for e in files)
    got = pruned.to_df()
    assert got.count() == 100
    assert got.select("region").distinct().collect()[0][0] == "east"


def test_avro_pk_upsert_merge_on_read(spark, catalog):
    t = catalog.create_table(
        "default",
        "av4",
        "k bigint, v string",
        primary_keys=["k"],
        options={"file.format": "avro"},
    )
    t.upsert(spark.range(0, 100).select(F.col("id").alias("k"), F.lit("a").alias("v")))
    t.upsert(
        spark.range(0, 50).select(F.col("id").alias("k"), F.lit("b").alias("v"))
    )
    t.delete(spark.range(90, 100).select(F.col("id").alias("k"), F.lit("x").alias("v")))
    got = t.scan().to_df()
    assert got.count() == 90
    byv = {r["v"]: r["n"] for r in got.groupBy("v").agg(F.count("*").alias("n")).collect()}
    assert byv == {"b": 50, "a": 40}


def test_avro_schema_evolution_projection(spark, catalog):
    t = catalog.create_table(
        "default", "av5", "k bigint, v string", options={"file.format": "avro"}
    )
    t.append(spark.range(0, 10).select(F.col("id").alias("k"), F.lit("old").alias("v")))
    catalog.add_column("default", "av5", "extra", "double")
    t = catalog.get_table("default", "av5")
    t.append(
        spark.range(10, 20).select(
            F.col("id").alias("k"), F.lit("new").alias("v"), F.lit(1.5).alias("extra")
        )
    )
    got = t.scan().to_df().orderBy("k").collect()
    assert len(got) == 20
    assert got[0]["extra"] is None and got[15]["extra"] == 1.5


def test_avro_compaction(spark, catalog):
    t = catalog.create_table(
        "default",
        "av6",
        "k bigint, v string",
        primary_keys=["k"],
        options={"file.format": "avro", "bucket": "1"},
    )
    for i in range(3):
        t.upsert(
            spark.range(0, 30).select(
                F.col("id").alias("k"), F.lit(f"r{i}").alias("v")
            )
        )
    n_before = len(t.scan().plan_files())
    assert n_before >= 3
    t.compact()
    t = catalog.get_table("default", "av6")
    assert len(t.scan().plan_files()) < n_before
    got = t.scan().to_df()
    assert got.count() == 30
    assert got.select("v").distinct().collect()[0][0] == "r2"


def test_avro_rejects_deletion_vectors(spark, catalog):
    t = catalog.create_table(
        "default",
        "av7",
        "k bigint, v string",
        primary_keys=["k"],
        options={"file.format": "avro", "deletion-vectors.enabled": "true"},
    )
    with pytest.raises(ValueError, match="deletion-vectors"):
        t.upsert(
            spark.range(0, 5).select(F.col("id").alias("k"), F.lit("a").alias("v"))
        )


# ---------------------------------------------------------------------------
# Python DataSource over avro tables
# ---------------------------------------------------------------------------


def test_datasource_reads_avro_table(spark, catalog):
    from paimon_presto_spark.sources.datasource import PaimonDataSource

    try:
        spark.dataSource.register(PaimonDataSource)
    except Exception:
        pass
    t = catalog.create_table(
        "default",
        "av_ds",
        "k bigint, v string",
        primary_keys=["k"],
        options={"file.format": "avro"},
    )
    t.upsert(spark.range(0, 40).select(F.col("id").alias("k"), F.lit("a").alias("v")))
    t.upsert(spark.range(0, 10).select(F.col("id").alias("k"), F.lit("b").alias("v")))
    got = spark.read.format("paimon").option("path", t.path).load()
    assert got.count() == 40
    byv = {
        r["v"]: r["n"]
        for r in got.groupBy("v").agg(F.count("*").alias("n")).collect()
    }
    assert byv == {"b": 10, "a": 30}
    # matches the DataFrame-path merge
    assert sorted((r["k"], r["v"]) for r in got.collect()) == sorted(
        (r["k"], r["v"]) for r in t.to_df().collect()
    )


def test_datasource_write_avro_rejected(spark, catalog):
    from paimon_presto_spark.sources.datasource import PaimonDataSource

    try:
        spark.dataSource.register(PaimonDataSource)
    except Exception:
        pass
    t = catalog.create_table(
        "default", "av_dsw", "k bigint, v string", options={"file.format": "avro"}
    )
    df = spark.range(0, 5).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    with pytest.raises(Exception, match="parquet only"):
        df.write.format("paimon").option("path", t.path).mode("append").save()


# ---------------------------------------------------------------------------
# property: random-row codec roundtrip
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_prop_schema = T.StructType(
    [
        T.StructField("i", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("arr", T.ArrayType(T.LongType())),
    ]
)

_rows_strategy = st.lists(
    st.fixed_dictionaries(
        {
            "i": st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
            "s": st.one_of(st.none(), st.text(max_size=40)),
            "d": st.one_of(
                st.none(),
                st.floats(allow_nan=False, width=64),
            ),
            "arr": st.one_of(
                st.none(),
                st.lists(st.integers(-(2**40), 2**40), max_size=8),
            ),
        }
    ),
    max_size=60,
)


@settings(max_examples=40, deadline=None)
@given(rows=_rows_strategy, codec=st.sampled_from(["null", "deflate"]))
def test_codec_roundtrip_property(tmp_path_factory, rows, codec):
    path = str(tmp_path_factory.mktemp("avrp") / "p.avro")
    avsc = avroio.spark_to_avro_schema(_prop_schema)
    w = avroio.AvroWriter(path, avsc, codec=codec)
    for r in rows:
        w.write(r)
    w.close()
    back = list(avroio.read_file_rows(path))
    assert len(back) == len(rows)
    for orig, got in zip(rows, back):
        assert got["i"] == orig["i"]
        assert got["s"] == orig["s"]
        assert got["arr"] == (list(orig["arr"]) if orig["arr"] is not None else None)
        if orig["d"] is None:
            assert got["d"] is None
        else:
            assert got["d"] == orig["d"] or (orig["d"] != orig["d"])
