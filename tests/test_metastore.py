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

    def test_racing_duplicate_surfaces_catalog_contract(self, spark, wh, uri):
        """Two engines on the same uri racing create: the loser must see
        the documented ValueError('already exists'), not a raw
        sqlite3.IntegrityError (the catalog-level pre-check passes for
        both racers; the pointer insert is the atomic arbiter)."""
        c1 = Catalog(spark, wh, metastore="jdbc", uri=uri)
        c2 = Catalog(spark, wh, metastore="jdbc", uri=uri)
        c1.create_database("d")
        with pytest.raises(ValueError, match="already exists"):
            c2.metastore.create_database("d")
        c1.create_table("d", "t", "k int")
        with pytest.raises(ValueError, match="already exists"):
            c2.metastore.register_table("d", "t", os.path.join(wh, "d.db", "t"))

    def test_system_suffix_rejected_in_drop_and_rename(self, spark, wh, uri):
        """drop/rename of 't$snapshots' must fail loudly: table_exists
        strips the suffix, so the old code passed the existence check on
        base 't' then silently no-opped the unregister."""
        c = Catalog(spark, wh, metastore="jdbc", uri=uri)
        c.create_database("d")
        c.create_table("d", "t", "k int")
        with pytest.raises(ValueError, match="system table"):
            c.drop_table("d", "t$snapshots")
        with pytest.raises(ValueError, match="system table"):
            c.rename_table("d", "t$snapshots", "t2")
        with pytest.raises(ValueError, match="system table"):
            c.rename_table("d", "t", "t2$snapshots")
        assert c.table_exists("d", "t")  # nothing was silently dropped

    def test_dangling_pointer_names_the_repair(self, spark, wh, uri):
        """A pointer whose schema dir is missing (create_table killed
        between register and schema-0.json) must surface an actionable
        error naming drop_table — not the generic 'does not exist' that
        contradicts create_table's 'already exists' for the same name."""
        c = Catalog(spark, wh, metastore="jdbc", uri=uri)
        c.create_database("d")
        # simulate the interrupted create: pointer registered, no schema
        c.metastore.register_table("d", "wedged", os.path.join(wh, "d.db", "wedged"))
        with pytest.raises(ValueError, match="drop_table"):
            c.get_table("d", "wedged")
        with pytest.raises(ValueError, match="already exists"):
            c.create_table("d", "wedged", "k int")
        c.drop_table("d", "wedged")  # the named repair clears the wedge
        c.create_table("d", "wedged", "k int")
        assert c.get_table("d", "wedged") is not None


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


class TestHiveSeam:
    """The ``hive`` backend string is an explicit non-goal in this sandbox
    (no thrift client ships — ``create_metastore`` rejects it actionably),
    but the product ships ``HiveMetastore``, an adapter over a CALLER-
    SUPPLIED client duck-typed against the HMS thrift surface. These
    tests drive that adapter — not a test-local copy — through the full
    catalog DDL + write + read path with a thrift-faithful mock client
    (``.sd.location`` table shape, ``NoSuchObjectException`` /
    ``AlreadyExistsException`` error names translated by the adapter)."""

    @staticmethod
    def _adapter(warehouse):
        from paimon_presto_spark.metastore import HiveMetastore

        class NoSuchObjectException(Exception):
            pass

        class AlreadyExistsException(Exception):
            pass

        class _Sd:
            def __init__(self, location):
                self.location = location

        class _Tbl:
            """thrift Table: the adapter reads only .sd.location."""

            def __init__(self, location):
                self.sd = _Sd(location)

        class MockHmsClient:
            """Dict-backed stand-in for hive_metastore.ThriftHiveMetastore
            .Client exposing the calls HiveMetastore documents, with
            HMS-named exceptions (the adapter matches by type NAME, so a
            real thrift client's exceptions translate identically)."""

            def __init__(self):
                self.dbs: dict[str, dict[str, str]] = {}
                # every delete_data flag the adapter ever passes — the
                # adapter owns content removal, so True here would make a
                # real HMS double-delete the same locations (round-7
                # advisor finding)
                self.delete_data_flags: list[bool] = []

            def get_all_databases(self):
                return sorted(self.dbs)

            def create_database(self, name, location):
                if name in self.dbs:
                    raise AlreadyExistsException(name)
                self.dbs[name] = {}

            def drop_database(self, name, delete_data, cascade):
                self.delete_data_flags.append(delete_data)
                self.dbs.pop(name, None)

            def get_all_tables(self, db):
                return sorted(self.dbs.get(db, {}))

            def get_table(self, db, tbl):
                if tbl not in self.dbs.get(db, {}):
                    raise NoSuchObjectException(f"{db}.{tbl}")
                return _Tbl(self.dbs[db][tbl])

            def create_table(self, db, tbl, location):
                if tbl in self.dbs[db]:
                    raise AlreadyExistsException(tbl)
                self.dbs[db][tbl] = location

            def drop_table(self, db, tbl, delete_data):
                self.delete_data_flags.append(delete_data)
                if tbl not in self.dbs.get(db, {}):
                    raise NoSuchObjectException(f"{db}.{tbl}")
                self.dbs[db].pop(tbl)

            def alter_table(self, db, old, new, location):
                del self.dbs[db][old]
                self.dbs[db][new] = location

        return HiveMetastore(warehouse, MockHmsClient())

    def test_catalog_ddl_and_write_through_hms_adapter(self, spark, wh):
        ms = self._adapter(wh)
        c = Catalog(spark, wh, metastore=ms)
        c.create_database("hdb")
        c.create_table("hdb", "t", "k int, v string", primary_keys=["k"])
        t = c.get_table("hdb", "t")
        t.upsert(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
        assert rows(c.read_table("hdb", "t"), "k", "v") == [(1, "a"), (2, "b")]
        c.rename_table("hdb", "t", "t2")
        assert c.list_tables("hdb") == ["t2"]
        assert rows(c.read_table("hdb", "t2"), "k", "v") == [(1, "a"), (2, "b")]
        c.drop_table("hdb", "t2")
        assert c.list_tables("hdb") == []
        # a second catalog over the SAME adapter sees the namespace (the
        # second-engine visibility an external metastore exists to give)
        c2 = Catalog(spark, wh, metastore=ms)
        assert c2.list_databases() == ["hdb"]
        c2.drop_database("hdb", cascade=True)
        # pointer/content split: the adapter rmtree's locations itself and
        # must NEVER ask HMS to also delete data (delete_data=True would
        # double-delete with a real metastore)
        assert ms.client.delete_data_flags, "drops never reached the client"
        assert not any(ms.client.delete_data_flags)

    def test_metastore_instance_rejects_uri(self, spark, wh):
        ms = self._adapter(wh)
        with pytest.raises(ValueError, match="meaningless"):
            Catalog(spark, wh, metastore=ms, uri="x.sqlite")
