"""A21 session properties: scan_version routing and pushdown/prune toggles.

Reference surface: ``PrestoSessionProperties.java:35-79`` (property set),
``PrestoPropertyUtils.java:30-60`` (scan_version format),
``PrestoMetadata.java:137-165`` (resolution into the table handle).
"""

import pytest

from paimon_presto_spark import properties
from paimon_presto_spark.plans.predicate import P


class TestScanVersionParsing:
    def test_global_format(self):
        assert properties.resolve_scan_version("7", "db", "t") == "7"
        assert properties.resolve_scan_version(" tagname ", "db", "t") == "tagname"

    def test_blank_is_none(self):
        assert properties.resolve_scan_version(None, "db", "t") is None
        assert properties.resolve_scan_version("  ", "db", "t") is None

    def test_table_format_first_match_wins(self):
        sv = "db.t.3|db.t.9"
        assert properties.resolve_scan_version(sv, "db", "t") == "3"

    def test_table_format_no_match(self):
        assert properties.resolve_scan_version("other.t.3", "db", "t") is None

    def test_wildcards(self):
        assert properties.resolve_scan_version("*.t.5", "db", "t") == "5"
        assert properties.resolve_scan_version("db.*.5", "db", "t") == "5"
        assert properties.resolve_scan_version("*.*.5", "db", "t") == "5"
        assert properties.resolve_scan_version("*.other.5", "db", "t") is None

    def test_version_may_contain_dots(self):
        # the reference template captures (.+) — a tag like "v1.2" survives
        assert properties.resolve_scan_version("db.t.v1.2", "db", "t") == "v1.2"


@pytest.fixture()
def versioned(spark, catalog):
    t = catalog.create_table("default", "sv", "k int, v string", primary_keys=["k"])
    t.upsert(spark.createDataFrame([(1, "a")], "k int, v string"))   # snap 1
    t.upsert(spark.createDataFrame([(1, "b")], "k int, v string"))   # snap 2
    t.create_tag("rel", 1)
    yield t
    spark.conf.unset(properties.SCAN_VERSION)


class TestScanVersionReads:
    def test_snapshot_id_via_session(self, spark, catalog, versioned):
        spark.conf.set(properties.SCAN_VERSION, "1")
        assert catalog.read_table("default", "sv").collect()[0]["v"] == "a"
        spark.conf.set(properties.SCAN_VERSION, "default.sv.2")
        assert catalog.read_table("default", "sv").collect()[0]["v"] == "b"

    def test_tag_via_session(self, spark, catalog, versioned):
        spark.conf.set(properties.SCAN_VERSION, "*.sv.rel")
        assert catalog.read_table("default", "sv").collect()[0]["v"] == "a"

    def test_explicit_kwargs_take_precedence(self, spark, catalog, versioned):
        spark.conf.set(properties.SCAN_VERSION, "1")
        got = catalog.read_table("default", "sv", snapshot_id=2).collect()
        assert got[0]["v"] == "b"

    def test_non_matching_entry_reads_latest(self, spark, catalog, versioned):
        spark.conf.set(properties.SCAN_VERSION, "other.table.1")
        assert catalog.read_table("default", "sv").collect()[0]["v"] == "b"

    def test_bogus_version_raises(self, spark, catalog, versioned):
        spark.conf.set(properties.SCAN_VERSION, "no-such-tag")
        with pytest.raises(ValueError, match="scan_version"):
            catalog.read_table("default", "sv")


class TestPushdownToggles:
    @pytest.fixture()
    def parts(self, spark, catalog):
        t = catalog.create_table(
            "default", "tog", "k int, pt string", partition_keys=["pt"]
        )
        t.append(spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k int, pt string"))
        yield t
        for key in (properties.QUERY_PUSHDOWN_ENABLED,
                    properties.PARTITION_PRUNE_ENABLED):
            spark.conf.unset(key)

    def test_partition_prune_toggle_widens_only(self, spark, parts):
        pred = P.eq("pt", "a")
        scan = parts.scan(predicate=pred)
        scan.plan_files()
        assert scan.last_plan["after_partition_prune"] == 1

        spark.conf.set(properties.PARTITION_PRUNE_ENABLED, "false")
        scan_off = parts.scan(predicate=pred)
        scan_off.plan_files()
        assert scan_off.last_plan["after_partition_prune"] == 3
        # results invariant: predicate is re-applied engine-side
        assert [r["k"] for r in scan_off.to_df().collect()] == [1]

    def test_stats_skip_toggle_widens_only(self, spark, parts):
        pred = P.eq("k", 3)
        scan = parts.scan(predicate=pred)
        scan.plan_files()
        assert scan.last_plan["after_stats_skip"] == 1

        spark.conf.set(properties.QUERY_PUSHDOWN_ENABLED, "false")
        scan_off = parts.scan(predicate=pred)
        scan_off.plan_files()
        assert scan_off.last_plan["after_stats_skip"] == 3
        assert [r["k"] for r in scan_off.to_df().collect()] == [3]
