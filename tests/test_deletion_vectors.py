"""Deletion vectors (`deletion-vectors.enabled=true`): write-time position
deletes instead of read-time merge — Paimon's DV mode surfaced through the
reference's table-options passthrough (``PrestoSqlTableOptionUtils.java``).

Contract under test: a DV table must be observationally IDENTICAL to a
merge-on-read table under the same mutation history, while its merged read
plan contains no Window (the merge already happened at write time) and its
CDC stream reconstructs deletions from position diffs.
"""

import os

import pyspark.sql.functions as F
import pytest


def rows(df, *cols):
    out = df.select(*cols) if cols else df
    return sorted(tuple(r) for r in out.collect())


def base_df(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") * 1.5).alias("n"),
    )


@pytest.fixture()
def pair(spark, catalog):
    """(dv_table, mor_table) with identical schema."""
    dv = catalog.create_table(
        "default", "dv", "k bigint, v string, n double", primary_keys=["k"],
        options={"deletion-vectors.enabled": "true"},
    )
    mor = catalog.create_table(
        "default", "mor", "k bigint, v string, n double", primary_keys=["k"],
    )
    return dv, mor


def test_dv_matches_merge_on_read(spark, pair):
    dv, mor = pair
    base = base_df(spark)
    patch = base.filter(F.col("k") % 7 == 0).withColumn("n", F.col("n") + 100)
    dels = base.filter(F.col("k") % 13 == 0)
    for t in pair:
        t.upsert(base)
        t.upsert(patch)
        t.delete(dels)
    assert rows(dv.to_df()) == rows(mor.to_df())
    # predicate pushdown still applies on the DV path
    from paimon_presto_spark.plans.predicate import P

    assert rows(dv.scan(predicate=P.gt("n", 400.0)).to_df()) == rows(
        mor.scan(predicate=P.gt("n", 400.0)).to_df()
    )


def test_dv_read_plan_has_no_window(spark, pair):
    dv, mor = pair
    dv.upsert(base_df(spark))
    dv.delete(base_df(spark).filter(F.col("k") < 10))
    plan = dv.to_df()._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan
    mor.upsert(base_df(spark))
    mor_plan = mor.to_df()._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" in mor_plan  # the contrast: MoR pays the window


def test_dv_upsert_dedups_batch_last_wins(spark, catalog):
    t = catalog.create_table(
        "default", "dvdup", "k bigint, v string", primary_keys=["k"],
        options={"deletion-vectors.enabled": "true"},
    )
    dup = spark.createDataFrame(
        [(1, "old"), (2, "x"), (1, "new")], "k bigint, v string"
    ).coalesce(1)  # one partition => monotonically increasing id follows row order
    t.upsert(dup)
    assert rows(t.to_df()) == [(1, "new"), (2, "x")]


def test_dv_delete_where_append_table(spark, catalog):
    t = catalog.create_table(
        "default", "dvap", "k bigint, v double",
        options={"deletion-vectors.enabled": "true"},
    )
    t.append(spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")))
    t.delete_where("k % 10 = 0")
    assert t.to_df().count() == 90
    assert t.to_df().filter(F.col("k") % 10 == 0).count() == 0
    # a later append does not resurrect deleted positions
    t.append(spark.range(100, 110).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")))
    assert t.to_df().count() == 100


def test_dv_append_without_dv_rejects_delete_where(spark, catalog):
    t = catalog.create_table("default", "plainap", "k bigint")
    t.append(spark.range(10).select(F.col("id").alias("k")))
    with pytest.raises(ValueError, match="deletion-vectors"):
        t.delete_where("k = 1")


def test_dv_time_travel_and_compact(spark, pair):
    dv, _ = pair
    s1 = dv.upsert(base_df(spark))
    s2 = dv.delete_where("k < 100")
    assert dv.snapshot().dv_index is not None
    dv.compact()
    assert dv.snapshot().dv_index is None  # deletions materialized
    assert dv.to_df().count() == 400
    # time travel re-applies the snapshot's own DV index
    assert dv.scan(snapshot_id=s1.snapshot_id).to_df().count() == 500
    assert dv.scan(snapshot_id=s2.snapshot_id).to_df().count() == 400


def test_dv_incremental_changelog(spark, pair):
    dv, _ = pair
    base = base_df(spark, 100)
    dv.upsert(base)                                       # s1
    dv.upsert(base.filter(F.col("k") % 10 == 0)
              .withColumn("n", F.col("n") + 1))           # s2: 10 updates
    dv.delete(base.filter(F.col("k") == 7))               # s3: 1 delete
    inc = dv.incremental_df(start_snapshot=1)
    kinds = {r["rowkind"]: r["cnt"] for r in
             inc.groupBy("rowkind").agg(F.count("*").alias("cnt")).collect()}
    # 10 new versions (+I), 10 shadowed old versions + 1 delete (-D)
    assert kinds == {"+I": 10, "-D": 11}
    # the -D payload is the OLD row content
    old7 = inc.filter((F.col("rowkind") == "-D") & (F.col("k") == 7)).collect()
    assert len(old7) == 1 and old7[0]["n"] == pytest.approx(10.5)


def test_dv_expire_reclaims_index(spark, pair):
    dv, _ = pair
    dv.upsert(base_df(spark, 50))
    dv.delete_where("k < 5")
    first_dv = dv.snapshot().dv_index
    dv.delete_where("k >= 45")
    second_dv = dv.snapshot().dv_index
    assert first_dv != second_dv
    dv.expire_snapshots(keep_last=1)
    idx = os.path.join(dv.path, "index")
    assert not os.path.isdir(os.path.join(idx, first_dv))
    assert os.path.isdir(os.path.join(idx, second_dv))
    assert dv.to_df().count() == 40


def test_dv_orphan_cleanup_keeps_live_index(spark, pair):
    dv, _ = pair
    dv.upsert(base_df(spark, 50))
    dv.delete_where("k < 5")
    live = dv.snapshot().dv_index
    # plant a dead index dataset and a stale staging dir
    dead = os.path.join(dv.path, "index", "dv-deadbeef")
    os.makedirs(dead, exist_ok=True)
    stale = os.path.join(dv.path, "staging", "crashed-writer")
    os.makedirs(stale, exist_ok=True)
    old = (0, 0)
    os.utime(dead, old)
    os.utime(stale, old)
    removed = dv.remove_orphan_files()
    assert os.path.join("index", "dv-deadbeef") in removed
    assert os.path.join("staging", "crashed-writer") in removed
    assert os.path.isdir(os.path.join(dv.path, "index", live))
    assert dv.to_df().count() == 45


def test_dv_datasource_read_applies_positions(spark, catalog, pair):
    dv, _ = pair
    dv.upsert(base_df(spark, 200))
    dv.delete_where("k % 4 = 0")
    spark.dataSource.register(__import__(
        "paimon_presto_spark.sources.datasource", fromlist=["PaimonDataSource"]
    ).PaimonDataSource)
    via_ds = (
        spark.read.format("paimon").option("path", dv.path).load()
    )
    assert rows(via_ds) == rows(dv.to_df())
    assert via_ds.count() == 150


def test_dv_datasource_write_rejected_for_pk(spark, catalog, pair):
    dv, _ = pair
    dv.upsert(base_df(spark, 10))
    spark.dataSource.register(__import__(
        "paimon_presto_spark.sources.datasource", fromlist=["PaimonDataSource"]
    ).PaimonDataSource)
    with pytest.raises(Exception, match="deletion-vectors"):
        (
            base_df(spark, 5).write.format("paimon")
            .option("path", dv.path).mode("append").save()
        )


def test_partial_compaction_folds_dv_for_hot_files_only(spark, catalog):
    """compact_buckets on a DV table: the rewritten group's dead rows are
    dropped in the rewrite and its index rows fold away; untouched files
    keep their deletion-vector entries."""
    t = catalog.create_table(
        "default", "dvbc", "k int, v string", primary_keys=["k"],
        options={"deletion-vectors.enabled": "true", "bucket": "2"},
    )
    ddl = "k int, v string"
    from paimon_presto_spark.functions.xxhash import spark_bucket
    keys = {spark_bucket(2, [(i, "int")]): i for i in range(20)}
    hot_k, cold_k = keys[0], keys[1]

    t.upsert(spark.createDataFrame([(cold_k, "c0"), (hot_k, "h0")], ddl))
    t.upsert(spark.createDataFrame([(cold_k, "c1")], ddl))   # cold now has a dead row
    for i in range(1, 4):
        t.upsert(spark.createDataFrame([(hot_k, f"h{i}")], ddl))
    assert t.dv_df() is not None and t.dv_df().count() >= 4

    snap = t.compact_buckets(min_files=3)
    assert snap is not None
    # results correct after the fold
    got = {r["k"]: r["v"] for r in t.to_df().collect()}
    assert got == {hot_k: "h3", cold_k: "c1"}
    # index kept ONLY the untouched files' entries
    remaining = t.dv_df()
    hot_bucket = spark_bucket(2, [(hot_k, "int")])
    live_paths = {e["path"] for e in t.manifest_entries() if e["bucket"] == hot_bucket}
    if remaining is not None:
        leaked = remaining.filter(F.col("path").isin(list(live_paths))).count()
        assert leaked == 0
        assert remaining.count() >= 1  # cold file's dead row survives
    # time travel to the pre-compaction snapshot still merges correctly
    pre = snap.snapshot_id - 1
    got_pre = {r["k"]: r["v"] for r in t.to_df(snapshot_id=pre).collect()}
    assert got_pre == {hot_k: "h3", cold_k: "c1"}
