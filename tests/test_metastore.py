"""Metastore backends: the reference's catalog (metastore, uri) switch
(``PaimonConfig.java:28-60``) rebuilt as pluggable namespace storage —
``filesystem`` derives the namespace from the warehouse layout, ``jdbc``
keeps pointers in SQLite so a second engine sees the catalog without
listing the warehouse. Table content stays in the table directory either
way."""

from __future__ import annotations

import os

import pytest

from paimon_presto_spark.catalog import Catalog


def rows(df, *cols):
    out = df.select(*cols) if cols else df
    return sorted(tuple(r) for r in out.collect())


@pytest.fixture()
def wh(tmp_path):
    return str(tmp_path / "wh")


@pytest.fixture()
def uri(tmp_path):
    return str(tmp_path / "meta" / "catalog.sqlite")


class TestJdbcMetastore:
    def test_ddl_roundtrip_and_second_engine_visibility(self, spark, wh, uri):
        c = Catalog(spark, wh, metastore="jdbc", uri=uri)
        c.create_database("d1")
        t = c.create_table("d1", "t1", "k int, v string", primary_keys=["k"])
        t.upsert(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
        assert c.list_databases() == ["d1"]
        assert c.list_tables("d1") == ["t1"]
        assert c.table_exists("d1", "T1")  # case-insensitive

        # the point of an external metastore: a SECOND catalog instance on
        # the same uri resolves the namespace from the store, not the disk
        c2 = Catalog(spark, wh, metastore="jdbc", uri=uri)
        assert c2.list_tables("d1") == ["t1"]
        assert rows(c2.get_table("d1", "t1").to_df()) == [(1, "a"), (2, "b")]

        c2.rename_table("d1", "t1", "t2")
        assert c.list_tables("d1") == ["t2"]
        assert rows(c.get_table("d1", "t2").to_df()) == [(1, "a"), (2, "b")]
        c.drop_table("d1", "t2")
        assert c.list_tables("d1") == []
        c.drop_database("d1")
        assert c.list_databases() == []

    def test_unregistered_directory_is_invisible(self, spark, wh, uri):
        """A pointer-based namespace ignores stray directories — the
        filesystem backend would surface them (that's its contract)."""
        c = Catalog(spark, wh, metastore="jdbc", uri=uri)
        c.create_database("d")
        c.create_table("d", "real", "k int")
        fs = Catalog(spark, wh)  # same warehouse, filesystem namespace
        fs.create_table("d", "stray", "k int")
        assert c.list_tables("d") == ["real"]
        assert not c.table_exists("d", "stray")
        assert sorted(fs.list_tables("d")) == ["real", "stray"]

    def test_external_location(self, spark, wh, uri, tmp_path):
        """jdbc tables may live OUTSIDE the warehouse root; reads resolve
        through the registered pointer."""
        c = Catalog(spark, wh, metastore="jdbc", uri=uri)
        c.create_database("d")
        loc = str(tmp_path / "elsewhere" / "ext_t")
        t = c.create_table("d", "ext", "k int", location=loc)
        t.append(spark.createDataFrame([(7,)], "k int"))
        assert os.path.isdir(os.path.join(loc, "schema"))
        assert rows(c.read_table("d", "ext")) == [(7,)]
        c.drop_table("d", "ext")  # unregisters AND removes the directory
        assert not os.path.exists(loc)

    def test_rename_external_table_is_pointer_only(
            self, spark, wh, uri, tmp_path):
        """Renaming a table at an external location must NOT move its data
        into the warehouse — the rename is a pure namespace update."""
        c = Catalog(spark, wh, metastore="jdbc", uri=uri)
        c.create_database("d")
        loc = str(tmp_path / "ext2" / "t")
        t = c.create_table("d", "t", "k int", location=loc)
        t.append(spark.createDataFrame([(3,)], "k int"))
        c.rename_table("d", "t", "t_new")
        assert os.path.isdir(loc)  # data stayed put
        assert not os.path.exists(os.path.join(wh, "d.db", "t_new"))
        assert rows(c.read_table("d", "t_new")) == [(3,)]

    def test_rejected_create_leaves_no_debris(self, spark, wh, tmp_path):
        """A create_table the backend rejects must not leave a populated
        schema directory behind (a retry at the same location must work
        once the cause is fixed)."""
        c = Catalog(spark, wh)
        c.create_database("d")
        loc = str(tmp_path / "debris" / "t")
        with pytest.raises(ValueError, match="external"):
            c.create_table("d", "t", "k int", location=loc)
        assert not os.path.exists(loc)
        # same name is still creatable at the default location
        c.create_table("d", "t", "k int")
        assert c.table_exists("d", "t")

    def test_drop_database_cascade(self, spark, wh, uri):
        c = Catalog(spark, wh, metastore="jdbc", uri=uri)
        c.create_database("d")
        c.create_table("d", "t", "k int")
        with pytest.raises(ValueError, match="not empty"):
            c.drop_database("d")
        c.drop_database("d", cascade=True)
        assert c.list_databases() == []

    def test_duplicate_and_missing_errors(self, spark, wh, uri):
        c = Catalog(spark, wh, metastore="jdbc", uri=uri)
        c.create_database("d")
        c.create_table("d", "t", "k int")
        with pytest.raises(ValueError, match="already exists"):
            c.create_table("d", "t", "k int")
        with pytest.raises(ValueError, match="does not exist"):
            c.get_table("d", "nope")
        with pytest.raises(ValueError, match="does not exist"):
            c.rename_table("d", "nope", "t2")


class TestBackendSelection:
    def test_filesystem_rejects_uri(self, spark, wh):
        with pytest.raises(ValueError, match="takes no uri"):
            Catalog(spark, wh, metastore="filesystem", uri="x.sqlite")

    def test_filesystem_rejects_external_location(self, spark, wh, tmp_path):
        c = Catalog(spark, wh)
        c.create_database("d")
        with pytest.raises(ValueError, match="external"):
            c.create_table("d", "t", "k int", location=str(tmp_path / "x"))

    def test_jdbc_requires_uri(self, spark, wh):
        with pytest.raises(ValueError, match="requires uri"):
            Catalog(spark, wh, metastore="jdbc")

    def test_hive_rejected_actionably(self, spark, wh):
        with pytest.raises(NotImplementedError, match="thrift"):
            Catalog(spark, wh, metastore="hive", uri="thrift://hms:9083")

    def test_unknown_backend(self, spark, wh):
        with pytest.raises(ValueError, match="unknown metastore"):
            Catalog(spark, wh, metastore="glue")

    def test_uri_prefix_spellings(self, spark, wh, tmp_path):
        p = str(tmp_path / "m.sqlite")
        c = Catalog(spark, wh, metastore="jdbc", uri=f"jdbc:sqlite:{p}")
        c.create_database("d")
        c2 = Catalog(spark, wh, metastore="jdbc", uri=p)
        assert c2.list_databases() == ["d"]
