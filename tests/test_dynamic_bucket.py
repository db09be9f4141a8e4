"""Dynamic bucketing (`bucket = -1`): a persistent key index assigns each
primary key a bucket exactly once; new keys fill fresh buckets at
`dynamic-bucket.target-row-num` apiece, so bucket count grows with the
data instead of requiring a rescale rewrite.

Contract under test: observational equivalence with a fixed-bucket table
under the same mutations, key→bucket stability across commits, bucket
growth at the target rate, and per-bucket merge correctness through the
shuffle-free DataSource reader.
"""

import os

import pyspark.sql.functions as F
import pytest


def rows(df, *cols):
    out = df.select(*cols) if cols else df
    return sorted(tuple(r) for r in out.collect())


def kv(spark, lo, hi, tag="v"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit(tag), F.col("id")).alias("v"),
    )


@pytest.fixture()
def dyn(catalog):
    return catalog.create_table(
        "default", "dyn", "k bigint, v string", primary_keys=["k"],
        options={"bucket": "-1", "dynamic-bucket.target-row-num": "100"},
    )


def bucket_of(t):
    """key -> set of buckets its data files' rows live in."""
    out = {}
    for e in t.manifest_entries():
        df = t.spark.read.parquet(os.path.join(t.path, e["path"]))
        for r in df.select("k").collect():
            out.setdefault(r["k"], set()).add(e["bucket"])
    return out


def test_dynamic_matches_fixed(spark, catalog, dyn):
    fixed = catalog.create_table(
        "default", "fx", "k bigint, v string", primary_keys=["k"],
    )
    for t in (dyn, fixed):
        t.upsert(kv(spark, 0, 250))
        t.upsert(kv(spark, 100, 300, "w"))          # 150 updates + 50 new
        t.delete(kv(spark, 0, 40))
    assert rows(dyn.to_df()) == rows(fixed.to_df())
    assert dyn.to_df().count() == 260


def test_bucket_growth_and_key_stability(spark, dyn):
    dyn.upsert(kv(spark, 0, 250))     # 250 keys / target 100 -> >= 3 buckets
    idx = dyn.bucket_index_df()
    n_buckets = idx.select("bucket").distinct().count()
    assert n_buckets >= 3
    first = {r["kh"]: r["bucket"] for r in idx.collect()}
    # re-upserting existing keys changes no assignment and adds no buckets
    dyn.upsert(kv(spark, 0, 250, "w"))
    second = {r["kh"]: r["bucket"] for r in dyn.bucket_index_df().collect()}
    assert first == second
    # every version of a key lives in its assigned bucket only
    assert all(len(bs) == 1 for bs in bucket_of(dyn).values())
    # new keys extend the index without moving old ones
    dyn.upsert(kv(spark, 250, 500))
    third = {r["kh"]: r["bucket"] for r in dyn.bucket_index_df().collect()}
    assert all(third[h] == b for h, b in first.items())
    assert len(third) == 500


def test_small_batches_fill_newest_bucket(spark, dyn):
    # batches far below target should NOT each open a new bucket
    for i in range(4):
        dyn.upsert(kv(spark, i * 20, (i + 1) * 20))
    idx = dyn.bucket_index_df()
    assert idx.select("bucket").distinct().count() == 1
    assert dyn.to_df().count() == 80


def test_dynamic_compact_preserves_buckets(spark, dyn):
    dyn.upsert(kv(spark, 0, 250))
    before = bucket_of(dyn)
    dyn.delete(kv(spark, 0, 10))
    dyn.compact()
    after = bucket_of(dyn)
    assert set(after) == set(range(10, 250))
    assert all(after[k] == before[k] for k in after)
    assert rows(dyn.to_df(), "k") == [(k,) for k in range(10, 250)]


def test_dynamic_datasource_read_merges_per_bucket(spark, dyn):
    dyn.upsert(kv(spark, 0, 250))
    dyn.upsert(kv(spark, 0, 50, "w"))
    dyn.delete(kv(spark, 240, 250))
    spark.dataSource.register(__import__(
        "paimon_presto_spark.sources.datasource", fromlist=["PaimonDataSource"]
    ).PaimonDataSource)
    via_ds = spark.read.format("paimon").option("path", dyn.path).load()
    assert rows(via_ds) == rows(dyn.to_df())


def test_dynamic_datasource_write_rejected(spark, dyn):
    dyn.upsert(kv(spark, 0, 10))
    spark.dataSource.register(__import__(
        "paimon_presto_spark.sources.datasource", fromlist=["PaimonDataSource"]
    ).PaimonDataSource)
    with pytest.raises(Exception, match="dynamic bucketing"):
        kv(spark, 10, 20).write.format("paimon").option("path", dyn.path).mode(
            "append"
        ).save()


def test_dynamic_rescale_rejected(spark, dyn):
    dyn.upsert(kv(spark, 0, 10))
    with pytest.raises(ValueError, match="dynamic-bucket"):
        dyn.rescale_bucket(8)


def test_dynamic_with_deletion_vectors(spark, catalog):
    t = catalog.create_table(
        "default", "dyndv", "k bigint, v string", primary_keys=["k"],
        options={
            "bucket": "-1",
            "dynamic-bucket.target-row-num": "100",
            "deletion-vectors.enabled": "true",
        },
    )
    t.upsert(kv(spark, 0, 250))
    t.upsert(kv(spark, 0, 50, "w"))
    t.delete_where("k >= 240")
    assert t.to_df().count() == 240
    got = dict(rows(t.to_df(), "k", "v"))
    assert got[0] == "w0" and got[60] == "v60"
    # still exactly one live position per key, in the key's bucket
    assert all(len(bs) == 1 for bs in bucket_of(t).values())


def test_dynamic_index_expires_with_snapshots(spark, dyn):
    dyn.upsert(kv(spark, 0, 150))
    first = dyn.snapshot().bucket_index
    dyn.upsert(kv(spark, 150, 300))
    second = dyn.snapshot().bucket_index
    assert first != second
    dyn.expire_snapshots(keep_last=1)
    idx_dir = os.path.join(dyn.path, "index")
    assert not os.path.isdir(os.path.join(idx_dir, first))
    assert os.path.isdir(os.path.join(idx_dir, second))
    assert dyn.to_df().count() == 300
