"""Pin the upstream Spark Python-DataSource scan-reuse hazard (round 9).

Spark 4.1.2 caches a Python data source's planned partitions per
``.load()`` handle and only re-runs pushdown planning when the current
query carries at least one CONVERTIBLE filter. Consequence: on a REUSED
handle, a completely filterless scan (or one whose filters can't convert
to DataSource filters) silently reuses the most recent FILTERED scan's
pruned partition list — dropping every row the prune skipped. This is
upstream behavior, not ours: the pushdown worker
(``pyspark/sql/worker/data_source_pushdown_filters.py``) builds a fresh
reader per invocation, so no reader state can leak; the stale state is
the JVM-side cached read info.

Our mitigations, asserted here:
- every engine surface hands out a FRESH handle per call (``to_df()``,
  ``colocated_join()``), so handle reuse never happens inside the engine;
- ``ColocatedJoinReader.pushFilters`` rebuilds its bucket pin from each
  call's filters (never accumulates), so re-planned scans are always
  self-consistent;
- the upstream behavior itself is pinned by ``test_upstream_stale_reuse``
  so a pyspark upgrade that fixes it flips this test and we can drop the
  fresh-handle workarounds (and this file's warnings).
"""

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def part_table(catalog, spark):
    t = catalog.create_table(
        "default", "reuse_p", "k bigint, part string, v bigint",
        partition_keys=["part"],
    )
    t.append(
        spark.range(100).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("string").alias("part"),
            F.col("id").alias("v"),
        )
    )
    return t


def _load(spark, t):
    from paimon_presto_spark.sources.datasource import PaimonDataSource

    spark.dataSource.register(PaimonDataSource)
    return spark.read.format("paimon").option("path", t.path).load()


def test_upstream_stale_reuse(spark, part_table):
    """UPSTREAM PIN — if this starts failing after a pyspark upgrade, the
    scan cache got filter-aware: delete the fresh-handle workarounds in
    join_bucket_colocated_lookup and this module's warnings."""
    df = _load(spark, part_table)
    assert df.filter(F.col("part") == "1").count() == 25
    # WRONG on purpose: the filterless scan reuses the pruned plan.
    assert df.count() == 25


def test_filtered_scans_always_replan(spark, part_table):
    """Scans WITH convertible filters re-plan every time — only
    filterless/non-convertible scans can go stale."""
    df = _load(spark, part_table)
    assert df.filter(F.col("part") == "1").count() == 25
    assert df.filter(F.col("part") == "2").count() == 25
    assert df.filter(F.col("v") > 50).count() == 49
    assert df.filter(F.col("part") == "3").count() == 25


def test_fresh_handles_are_always_correct(spark, part_table):
    """The engine's contract: one handle per query. to_df() builds a new
    DataFrame per call, so engine callers never hit the stale cache."""
    df = _load(spark, part_table)
    assert df.filter(F.col("part") == "1").count() == 25
    assert _load(spark, part_table).count() == 100
    assert part_table.to_df().count() == 100
    assert part_table.to_df().count() == 100


def test_colocated_fresh_handles_full_then_pinned(catalog, spark):
    """The colocated join under the same discipline: fresh handle per
    query keeps the full scan full and the pinned scan pinned."""
    from paimon_presto_spark.sources.colocated import colocated_join

    tl = catalog.create_table(
        "default", "reuse_cl", "k bigint, lv bigint",
        primary_keys=["k"], options={"bucket": "4"},
    )
    tl.upsert(spark.range(80).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv")))
    tr = catalog.create_table(
        "default", "reuse_cr", "k bigint, rv bigint",
        primary_keys=["k"], options={"bucket": "4"},
    )
    tr.upsert(spark.range(80).select(
        F.col("id").alias("k"), (F.col("id") + 1).alias("rv")))

    def j():
        return colocated_join(spark, tl, tr, left_on="k")

    pinned = j().filter(F.col("k") == 7)
    assert pinned.rdd.getNumPartitions() == 1
    assert pinned.count() == 1
    full = j()
    assert full.rdd.getNumPartitions() == 4
    assert full.count() == 80
