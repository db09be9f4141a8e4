"""Python DataSource API face of the table format: read (bucket-aligned
shuffle-free merge-on-read, filter-driven file skipping, time travel) and
task-parallel append/overwrite writes with atomic manifest commit."""

import pytest


@pytest.fixture()
def registered(spark):
    from paimon_presto_spark.sources.datasource import PaimonDataSource

    try:
        spark.dataSource.register(PaimonDataSource)
    except Exception:
        pass  # already registered in this session
    return spark


def _read(spark, table):
    return spark.read.format("paimon").option("path", table.path).load()


def test_read_append_only(registered, spark, catalog):
    t = catalog.create_table("default", "ds_a", "a int, b string")
    t.append(spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string"))
    t.append(spark.createDataFrame([(3, "z")], "a int, b string"))
    got = sorted((r["a"], r["b"]) for r in _read(spark, t).collect())
    assert got == [(1, "x"), (2, "y"), (3, "z")]


def test_read_pk_merge_on_read(registered, spark, catalog):
    t = catalog.create_table("default", "ds_pk", "k int, v string", primary_keys=["k"])
    t.upsert(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    t.upsert(spark.createDataFrame([(1, "a2")], "k int, v string"))
    t.delete(spark.createDataFrame([(2, "b")], "k int, v string"))
    got = sorted((r["k"], r["v"]) for r in _read(spark, t).collect())
    assert got == [(1, "a2")]
    # matches the DataFrame-path (window-shuffle) merge
    expect = sorted((r["k"], r["v"]) for r in t.to_df().collect())
    assert got == expect


def test_read_partial_update_engine(registered, spark, catalog):
    t = catalog.create_table(
        "default", "ds_pu", "k int, a string, b int",
        primary_keys=["k"], options={"merge-engine": "partial-update"},
    )
    t.upsert(spark.createDataFrame([(1, "x", None)], "k int, a string, b int"))
    t.upsert(spark.createDataFrame([(1, None, 7)], "k int, a string, b int"))
    rows = _read(spark, t).collect()
    assert [(r["k"], r["a"], r["b"]) for r in rows] == [(1, "x", 7)]


def test_filter_pushdown_skips_files(registered, spark, catalog):
    t = catalog.create_table("default", "ds_f", "a int, b string")
    t.append(spark.createDataFrame([(i, f"v{i}") for i in range(10)], "a int, b string"))
    t.append(spark.createDataFrame([(i, f"v{i}") for i in range(100, 110)], "a int, b string"))
    df = _read(spark, t).filter("a >= 100")
    got = sorted(r["a"] for r in df.collect())
    assert got == list(range(100, 110))
    # correctness under pushdown + residual re-application
    assert _read(spark, t).filter("a = 5").count() == 1


def test_time_travel_option(registered, spark, catalog):
    t = catalog.create_table("default", "ds_tt", "a int")
    t.append(spark.createDataFrame([(1,)], "a int"))
    t.append(spark.createDataFrame([(2,)], "a int"))
    df1 = (
        spark.read.format("paimon")
        .option("path", t.path).option("snapshot", "1").load()
    )
    assert [r["a"] for r in df1.collect()] == [1]
    assert _read(spark, t).count() == 2


def test_datasource_write_append_and_overwrite(registered, spark, catalog):
    t = catalog.create_table("default", "ds_w", "a int, b string")
    src = spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string")
    src.write.format("paimon").option("path", t.path).mode("append").save()
    assert sorted(r["a"] for r in t.to_df().collect()) == [1, 2]
    # second append accumulates; snapshot log advances
    src.write.format("paimon").option("path", t.path).mode("append").save()
    assert t.to_df().count() == 4
    assert t.snapshot().commit_kind == "APPEND"
    spark.createDataFrame([(9, "z")], "a int, b string").write.format(
        "paimon"
    ).option("path", t.path).mode("overwrite").save()
    assert [(r["a"], r["b"]) for r in t.to_df().collect()] == [(9, "z")]


def test_datasource_write_partitioned(registered, spark, catalog):
    t = catalog.create_table(
        "default", "ds_wp", "a int, region string", partition_keys=["region"]
    )
    spark.createDataFrame(
        [(1, "eu"), (2, "us"), (3, "eu")], "a int, region string"
    ).write.format("paimon").option("path", t.path).mode("append").save()
    # partition pruning visible through the Table scan path
    scan = t.scan(partition_where="region = 'eu'")
    assert sorted(r["a"] for r in scan.to_df().collect()) == [1, 3]
    assert scan.last_plan["after_partition_prune"] < scan.last_plan["total_files"] + 1


def test_datasource_write_pk_upsert_delete(registered, spark, catalog):
    """Primary-key writes through the DataSource: upserts, deletes via
    rowkind option, and interop with Table-API writes (same xxhash64
    bucket layout, so merge-on-read spans both write paths)."""
    t = catalog.create_table(
        "default", "ds_wr", "k int, v string", primary_keys=["k"]
    )
    spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string").write.format(
        "paimon"
    ).option("path", t.path).mode("append").save()
    spark.createDataFrame([(1, "a2"), (3, "c")], "k int, v string").write.format(
        "paimon"
    ).option("path", t.path).mode("append").save()
    got = {r["k"]: r["v"] for r in t.to_df().collect()}
    assert got == {1: "a2", 2: "b", 3: "c"}

    # delete via rowkind=D
    spark.createDataFrame([(2, "b")], "k int, v string").write.format(
        "paimon"
    ).option("path", t.path).option("rowkind", "D").mode("append").save()
    got = {r["k"]: r["v"] for r in t.to_df().collect()}
    assert got == {1: "a2", 3: "c"}

    # interop: Table-API upsert on the same table, read back via the
    # DataSource's per-bucket merge. If the Python writer's bucket choice
    # diverged from the JVM xxhash64 layout, key 3's two versions would
    # land in different buckets and BOTH would survive this merge.
    t.upsert(spark.createDataFrame([(3, "c2")], "k int, v string"))
    got_ds = {r["k"]: r["v"] for r in _read(spark, t).collect()}
    assert got_ds == {1: "a2", 3: "c2"}
    assert _read(spark, t).count() == 2
    t.compact()
    assert {r["k"]: r["v"] for r in t.to_df().collect()} == {1: "a2", 3: "c2"}

    # overwrite on a pk table is rejected as ambiguous
    with pytest.raises(Exception, match="ambiguous"):
        spark.createDataFrame([(9, "z")], "k int, v string").write.format(
            "paimon"
        ).option("path", t.path).mode("overwrite").save()


def test_int_partition_key_pruning_correct(registered, spark, catalog):
    """Regression: partition dir values are strings; an equality filter on
    an int partition column must still match (typed comparison), and must
    actually prune non-matching partitions."""
    t = catalog.create_table(
        "default", "ds_ip", "v string, year int", partition_keys=["year"]
    )
    t.append(spark.createDataFrame(
        [("a", 2023), ("b", 2024), ("c", 2024)], "v string, year int"))
    df = _read(spark, t).filter("year = 2024")
    assert sorted(r["v"] for r in df.collect()) == ["b", "c"]
    assert _read(spark, t).filter("year > 2023").count() == 2
    assert _read(spark, t).filter("year IN (2023)").count() == 1


def test_schema_evolution_projection(registered, spark, catalog):
    """Files written under older schemas render through the current one by
    field id: renames follow, added columns null-fill (A18 contract on the
    DataSource read path)."""
    t = catalog.create_table("default", "ds_ev", "a int, b string")
    t.append(spark.createDataFrame([(1, "x")], "a int, b string"))
    catalog.rename_column("default", "ds_ev", "b", "label")
    catalog.add_column("default", "ds_ev", "score", "double")
    t2 = catalog.get_table("default", "ds_ev")
    t2.append(spark.createDataFrame([(2, "y", 0.5)], "a int, label string, score double"))

    rows = {r["a"]: (r["label"], r["score"]) for r in _read(spark, t2).collect()}
    assert rows == {1: ("x", None), 2: ("y", 0.5)}
    # matches the DataFrame-path projection
    expect = {r["a"]: (r["label"], r["score"]) for r in t2.to_df().collect()}
    assert rows == expect


def test_read_aggregation_engine(registered, spark, catalog):
    t = catalog.create_table(
        "default", "ds_ag", "k int, total int", primary_keys=["k"],
        options={"merge-engine": "aggregation",
                 "fields.total.aggregate-function": "sum"},
    )
    t.upsert(spark.createDataFrame([(1, 10), (2, 1)], "k int, total int"))
    t.upsert(spark.createDataFrame([(1, 5)], "k int, total int"))
    got = {r["k"]: r["total"] for r in _read(spark, t).collect()}
    assert got == {1: 15, 2: 1}


def test_datasource_branch_read_and_write(registered, spark, catalog):
    """option("branch", name): the DataSource reads and writes a branch
    lineage while sharing data files with main (same split planning,
    pushdown, and commit path — only the metadata root moves)."""
    t = catalog.create_table("default", "dsbr", "a int, v string")
    spark.createDataFrame([(1, "x"), (2, "y")], "a int, v string") \
        .write.format("paimon").option("path", t.path).mode("append").save()
    t.create_branch("dev")
    # write through the DataSource onto the branch
    spark.createDataFrame([(9, "dev")], "a int, v string") \
        .write.format("paimon").option("path", t.path).option("branch", "dev") \
        .mode("append").save()
    branch_rows = sorted(
        (r["a"], r["v"]) for r in
        spark.read.format("paimon").option("path", t.path)
        .option("branch", "dev").load().collect()
    )
    assert branch_rows == [(1, "x"), (2, "y"), (9, "dev")]
    main_rows = sorted((r["a"], r["v"]) for r in _read(spark, t).collect())
    assert main_rows == [(1, "x"), (2, "y")]  # main untouched
    # Table API sees the DataSource's branch commit (shared lineage)
    assert sorted(r["a"] for r in t.branch("dev").to_df().collect()) == [1, 2, 9]
    with pytest.raises(Exception, match="does not exist"):
        spark.read.format("paimon").option("path", t.path) \
            .option("branch", "nope").load().collect()


def test_startswith_pushdown_skips_files(registered, spark, catalog):
    """Spark pushes StringStartsWith to the DataSource; prefix file
    skipping shrinks the split list."""
    t = catalog.create_table("default", "dssw", "name string, v int")
    for prefix in ("alpha", "beta", "gamma"):
        spark.createDataFrame(
            [(f"{prefix}_{i}", i) for i in range(10)], "name string, v int"
        ).coalesce(1).write.format("paimon").option("path", t.path) \
            .mode("append").save()
    df = _read(spark, t).filter("name LIKE 'beta%'")
    assert df.count() == 10
    # all three files committed; the scan plans only the beta one
    assert len(t.manifest_entries()) == 3


class TestStreamReader:
    """spark.readStream.format("paimon") — snapshot-id offsets, exactly-once
    per commit, COMPACT invisible, DV deletes re-emitted, lookup-producer
    tables streaming their retraction changelog."""

    def _register(self, spark):
        from paimon_presto_spark.sources.datasource import PaimonDataSource
        spark.dataSource.register(PaimonDataSource)

    def _run(self, spark, t, tmp_path, name, **opts):
        reader = (
            spark.readStream.format("paimon")
            .option("path", t.path).option("changelog", "true")
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load().writeStream.format("memory").queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ck-{name}"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    def test_stream_across_commits_and_compaction(self, spark, catalog, tmp_path):
        self._register(spark)
        t = catalog.create_table("default", "ds_s1", "k int, v string",
                                 primary_keys=["k"])
        ddl = "k int, v string"
        t.upsert(spark.createDataFrame([(1, "a"), (2, "b")], ddl))
        t.delete(spark.createDataFrame([(1, "a")], ddl))
        t.compact()  # must emit nothing
        self._run(spark, t, tmp_path, "ds_s1_out")
        rows = [(r["k"], r["__row_kind"], r["__seq"]) for r in
                spark.sql("SELECT * FROM ds_s1_out ORDER BY __seq, k").collect()]
        assert rows == [(1, "I", 1), (2, "I", 1), (1, "D", 2)]

        # restart with same checkpoint: only NEW commits arrive
        t.upsert(spark.createDataFrame([(3, "c")], ddl))
        self._run(spark, t, tmp_path, "ds_s1_out2")  # fresh sink, fresh ckpt
        assert spark.table("ds_s1_out2").count() == 4  # full history again

    def test_consumer_option_records_progress(self, spark, catalog, tmp_path):
        """Source commit() acknowledges a batch on the NEXT run's recovery
        (Spark's source-commit protocol), advancing the consumer file; a
        fresh checkpoint with the same consumer-id resumes from it."""
        self._register(spark)
        t = catalog.create_table("default", "ds_s2", "k int", primary_keys=["k"])
        t.upsert(spark.createDataFrame([(1,)], "k int"))
        out = str(tmp_path / "ds_s2_files")
        ck = str(tmp_path / "ds_s2_ck")

        def run_files():
            q = (
                spark.readStream.format("paimon").option("path", t.path)
                .option("changelog", "true").option("consumer-id", "stream")
                .load().writeStream.format("parquet").option("path", out)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True).start()
            )
            q.awaitTermination(120)

        run_files()
        assert "stream" not in t.list_consumers()  # batch 0 not yet acked
        t.upsert(spark.createDataFrame([(2,)], "k int"))
        run_files()  # recovery acks batch 0 → consumer past snapshot 1
        assert t.list_consumers()["stream"] == 2
        # exactly-once across restarts: each snapshot's row delivered once
        assert spark.read.parquet(out).count() == 2

        # a FRESH checkpoint with the same consumer id resumes from the
        # recorded position instead of replaying history
        self._run(spark, t, tmp_path, "ds_s2_out2", **{"consumer-id": "stream"})
        got = {r["k"] for r in spark.table("ds_s2_out2").collect()}
        assert got == {2}

    def test_dv_deletes_stream_as_d_rows(self, spark, catalog, tmp_path):
        self._register(spark)
        t = catalog.create_table(
            "default", "ds_s3", "k int, v string", primary_keys=["k"],
            options={"deletion-vectors.enabled": "true"})
        ddl = "k int, v string"
        t.upsert(spark.createDataFrame([(1, "a"), (2, "b")], ddl))
        t.delete(spark.createDataFrame([(2, "b")], ddl))   # DV-only commit
        self._run(spark, t, tmp_path, "ds_s3_out")
        rows = [(r["k"], r["v"], r["__row_kind"], r["__seq"]) for r in
                spark.sql("SELECT * FROM ds_s3_out ORDER BY __seq, k").collect()]
        assert rows == [(1, "a", "I", 1), (2, "b", "I", 1), (2, "b", "D", 2)]

    def test_lookup_producer_streams_retractions(self, spark, catalog, tmp_path):
        self._register(spark)
        t = catalog.create_table(
            "default", "ds_s4", "k int, v string", primary_keys=["k"],
            options={"changelog-producer": "lookup"})
        ddl = "k int, v string"
        t.upsert(spark.createDataFrame([(1, "a")], ddl))
        t.upsert(spark.createDataFrame([(1, "a2")], ddl))
        self._run(spark, t, tmp_path, "ds_s4_out")
        rows = [(r["k"], r["v"], r["__row_kind"]) for r in spark.sql(
            "SELECT * FROM ds_s4_out ORDER BY __seq, __row_kind").collect()]
        assert rows == [(1, "a", "I"), (1, "a2", "UA"), (1, "a", "UB")]

    def test_batch_read_rejects_changelog_option(self, spark, catalog):
        self._register(spark)
        t = catalog.create_table("default", "ds_s5", "k int", primary_keys=["k"])
        t.upsert(spark.createDataFrame([(1,)], "k int"))
        import pytest as _pytest
        with _pytest.raises(Exception, match="streaming"):
            (spark.read.format("paimon").option("path", t.path)
             .option("changelog", "true").load().collect())


class TestStreamWriter:
    """writeStream.format("paimon"): one atomic snapshot per micro-batch,
    exactly-once via batch-id idempotence, on Spark's native sink protocol."""

    def _register(self, spark):
        from paimon_presto_spark.sources.datasource import PaimonDataSource
        spark.dataSource.register(PaimonDataSource)

    def test_paimon_to_paimon_pipeline(self, spark, catalog, tmp_path):
        """End-to-end: stream a pk table's changelog into an append sink
        table through the native source AND sink, across restarts."""
        self._register(spark)
        src = catalog.create_table("default", "pipe_src", "k int, v string",
                                   primary_keys=["k"])
        dst = catalog.create_table("default", "pipe_dst",
                                   "k int, v string, __seq bigint, __row_kind string")
        ddl = "k int, v string"
        src.upsert(spark.createDataFrame([(1, "a"), (2, "b")], ddl))
        ck = str(tmp_path / "pipe_ck")

        def run():
            q = (
                spark.readStream.format("paimon").option("path", src.path)
                .option("changelog", "true").load()
                .writeStream.format("paimon").option("path", dst.path)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True).start()
            )
            q.awaitTermination(120)

        run()
        got = {(r["k"], r["__row_kind"]) for r in dst.to_df().collect()}
        assert got == {(1, "I"), (2, "I")}
        assert dst.snapshot().commit_kind == "APPEND"

        # restart: only the new commit lands, exactly once
        src.delete(spark.createDataFrame([(1, "a")], ddl))
        run()
        rows = [(r["k"], r["__row_kind"], r["__seq"]) for r in
                dst.to_df().orderBy("__seq", "k").collect()]
        assert rows == [(1, "I", 1), (2, "I", 1), (1, "D", 2)]

    def test_stream_write_upserts_pk_sink(self, spark, catalog, tmp_path):
        """A primary-key sink applies each micro-batch as an upsert."""
        self._register(spark)
        src = catalog.create_table("default", "pipe2_src", "k int, v string",
                                   primary_keys=["k"])
        dst = catalog.create_table("default", "pipe2_dst", "k int, v string",
                                   primary_keys=["k"])
        ddl = "k int, v string"
        ck = str(tmp_path / "pipe2_ck")

        def run():
            q = (
                spark.readStream.format("paimon").option("path", src.path)
                .option("changelog", "true").load()
                .select("k", "v")   # project change rows onto the sink schema
                .writeStream.format("paimon").option("path", dst.path)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True).start()
            )
            q.awaitTermination(120)

        src.upsert(spark.createDataFrame([(1, "a")], ddl))
        run()
        src.upsert(spark.createDataFrame([(1, "a2"), (2, "b")], ddl))
        run()
        got = {r["k"]: r["v"] for r in dst.to_df().collect()}
        assert got == {1: "a2", 2: "b"}


def test_time_travel_tag_and_timestamp(registered, spark, catalog):
    """DataSource time travel by tag and by timestamp (A12 surface on the
    connector face: scan_version/scan_timestamp_millis analogs)."""
    import time as _time

    t = catalog.create_table("default", "ds_tt2", "a int")
    t.append(spark.createDataFrame([(1,)], "a int"))
    t.create_tag("rel")
    mid_ms = int(_time.time() * 1000)
    _time.sleep(0.05)
    t.append(spark.createDataFrame([(2,)], "a int"))

    by_tag = (spark.read.format("paimon").option("path", t.path)
              .option("tag", "rel").load())
    assert [r["a"] for r in by_tag.collect()] == [1]

    by_ts = (spark.read.format("paimon").option("path", t.path)
             .option("as-of-timestamp-ms", str(mid_ms)).load())
    assert [r["a"] for r in by_ts.collect()] == [1]

    # tag reads survive snapshot expiry
    t.append(spark.createDataFrame([(3,)], "a int"))
    t.expire_snapshots(keep_last=1)
    assert [r["a"] for r in (
        spark.read.format("paimon").option("path", t.path)
        .option("tag", "rel").load().collect())] == [1]

    with pytest.raises(Exception, match="mutually exclusive"):
        (spark.read.format("paimon").option("path", t.path)
         .option("tag", "rel").option("snapshot", "1").load().collect())


def test_stream_reader_mixed_rowkind_commit(spark, catalog, tmp_path):
    """A rowkind.field CDC commit mixes I and D rows in ONE snapshot; the
    changelog stream must emit each row with its own kind, in the single
    micro-batch of that commit."""
    from paimon_presto_spark.sources.datasource import PaimonDataSource

    spark.dataSource.register(PaimonDataSource)
    t = catalog.create_table(
        "default", "ds_rk", "k int, v string, rk string",
        primary_keys=["k"], options={"rowkind.field": "rk"},
    )
    ddl = "k int, v string, rk string"
    t.upsert(spark.createDataFrame([(1, "a", "+I"), (2, "b", "+I")], ddl))
    t.upsert(spark.createDataFrame(
        [(1, "a2", "+U"), (2, None, "-D"), (3, "c", "+I")], ddl))
    q = (
        spark.readStream.format("paimon")
        .option("path", t.path).option("changelog", "true")
        .load().writeStream.format("memory").queryName("ds_rk_out")
        .option("checkpointLocation", str(tmp_path / "ck-rk"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r["__seq"], r["k"], r["__row_kind"])
        for r in spark.table("ds_rk_out").collect()
    )
    assert rows == [
        (1, 1, "I"), (1, 2, "I"),
        (2, 1, "I"), (2, 2, "D"), (2, 3, "I"),
    ]


def test_writer_rowkind_field_mixed_batch(registered, spark, catalog):
    """option('rowkind-field', col): one DataSource write mixes upserts and
    tombstones, kinds taken per row from the column."""
    t = catalog.create_table(
        "default", "ds_rkw", "k int, v string, rk string",
        primary_keys=["k"], options={"bucket": "2"},
    )
    ddl = "k int, v string, rk string"
    t.upsert(spark.createDataFrame([(1, "a", "+I"), (2, "b", "+I")], ddl))
    (
        spark.createDataFrame(
            [(1, "a2", "+U"), (2, None, "-D"), (3, "c", "+I")], ddl)
        .write.format("paimon").option("path", t.path)
        .option("rowkind-field", "rk").mode("append").save()
    )
    assert t.snapshot().snapshot_id == 2  # one atomic commit
    got = sorted((r["k"], r["v"]) for r in t.to_df().collect())
    assert got == [(1, "a2"), (3, "c")]


def test_writer_rejects_lookup_changelog_tables(registered, spark, catalog):
    """Batch/stream DataSource writes must not leave changelog holes on
    lookup-producer tables — the Table API owns those writes."""
    import pyspark.sql.utils as _u

    t = catalog.create_table(
        "default", "ds_clgw", "k int, v string", primary_keys=["k"],
        options={"changelog-producer": "lookup"},
    )
    with pytest.raises(Exception, match="changelog-producer"):
        (
            spark.createDataFrame([(1, "a")], "k int, v string")
            .write.format("paimon").option("path", t.path)
            .mode("append").save()
        )


def test_stream_cdc_replication_with_deletes(spark, catalog, tmp_path):
    """Full CDC replication through the native source/sink protocol: the
    changelog stream's own __row_kind drives the sink via
    option('rowkind-field', '__row_kind'), so DELETES replicate — the
    piece a constant-rowkind pipe cannot express. UB pre-images are
    filtered (UA already replaces)."""
    from paimon_presto_spark.sources.datasource import PaimonDataSource
    import pyspark.sql.functions as F

    spark.dataSource.register(PaimonDataSource)
    src = catalog.create_table("default", "rep_src", "k int, v string",
                               primary_keys=["k"])
    dst = catalog.create_table("default", "rep_dst", "k int, v string",
                               primary_keys=["k"])
    ddl = "k int, v string"
    ck = str(tmp_path / "rep_ck")

    def run():
        # no UB filter needed: the sink drops pre-images itself
        q = (
            spark.readStream.format("paimon").option("path", src.path)
            .option("changelog", "true").load()
            .select("k", "v", "__row_kind")
            .writeStream.format("paimon").option("path", dst.path)
            .option("rowkind-field", "__row_kind")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    src.upsert(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ddl))
    run()
    assert rows_set(dst) == {(1, "a"), (2, "b"), (3, "c")}
    src.delete(spark.createDataFrame([(2, "b")], ddl))
    src.upsert(spark.createDataFrame([(1, "a2"), (4, "d")], ddl))
    run()
    assert rows_set(dst) == rows_set(src) == {(1, "a2"), (3, "c"), (4, "d")}


def rows_set(t):
    return {(r["k"], r["v"]) for r in t.to_df().collect()}


def test_writer_rowkind_field_rejected_on_partial_update(
        registered, spark, catalog):
    """rowkind-field on a partial-update (or aggregation) table must raise
    exactly like Table.write_cdc_batch: the merge read path filters 'D'
    rows before combining, so a tombstone would silently no-op."""
    import pytest

    t = catalog.create_table(
        "default", "ds_rkpu", "k int, v string, rk string",
        primary_keys=["k"],
        options={"rowkind.field": "rk", "merge-engine": "partial-update",
                 "bucket": "1"},
    )
    df = spark.createDataFrame([(1, None, "-D")], "k int, v string, rk string")
    with pytest.raises(Exception, match="merge-engine deduplicate"):
        (
            df.write.format("paimon").option("path", t.path)
            .mode("append").save()
        )


def test_writer_defaults_to_table_rowkind_field(registered, spark, catalog):
    """Writing to a table that declares rowkind.field must honor the kind
    column even when the write does not pass the option — a '-D' marker
    stored as a plain insert would leave the key alive."""
    t = catalog.create_table(
        "default", "ds_rkopt", "k int, v string, rk string",
        primary_keys=["k"], options={"rowkind.field": "rk"},
    )
    ddl = "k int, v string, rk string"
    t.upsert(spark.createDataFrame([(1, "a", "+I"), (2, "b", "+I")], ddl))
    (
        spark.createDataFrame([(1, None, "-D"), (3, "c", "+I")], ddl)
        .write.format("paimon").option("path", t.path)
        .mode("append").save()
    )
    got = sorted((r["k"], r["v"]) for r in t.to_df().collect())
    assert got == [(2, "b"), (3, "c")]


def test_stream_from_snapshot_startup(registered, spark, catalog, tmp_path):
    """option('from-snapshot', N) starts the stream AT snapshot N —
    Paimon's scan.mode=from-snapshot replay startup."""
    t = catalog.create_table("default", "ds_fs", "k int", primary_keys=["k"])
    for i in range(4):
        t.upsert(spark.createDataFrame([(i,)], "k int"))
    q = (
        spark.readStream.format("paimon").option("path", t.path)
        .option("changelog", "true").option("from-snapshot", "3")
        .load().writeStream.format("memory").queryName("ds_fs_out")
        .option("checkpointLocation", str(tmp_path / "ck-fs"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted((r["__seq"], r["k"]) for r in spark.table("ds_fs_out").collect())
    assert got == [(3, 2), (4, 3)]  # snapshots 3 and 4 only
