"""Pluggable metastore backends for the catalog namespace.

The reference's catalog config accepts ``metastore`` and ``uri`` next to
``warehouse`` (``PaimonConfig.java:28-60``: the connector forwards them to
Paimon's catalog factory, which picks filesystem / hive / jdbc). This
module is the Spark-native rebuild of that choice point: the *namespace*
(which databases exist, which tables they hold, where each table lives)
is owned by a Metastore implementation, while table CONTENT — schemas,
snapshots, manifests, data files — always stays in the table directory
(exactly Paimon's split: the external metastore holds pointers, the
warehouse holds the format).

Backends:

- ``filesystem`` (default): the namespace IS the warehouse directory
  layout (``warehouse/<db>.db/<table>/``) — zero extra infrastructure,
  the behavior rounds 1-3 shipped.
- ``jdbc``: the namespace lives in a SQLite database at ``uri`` —
  the stdlib-only stand-in for Paimon's JDBC catalog. What this buys is
  what any external metastore buys: a second engine (or a second
  SparkSession on another machine) pointed at the same ``uri`` sees the
  catalog WITHOUT listing the warehouse, table paths may live outside
  the warehouse root, and namespace changes are transactional.
- ``hive``: ``HiveMetastore`` adapts a CALLER-SUPPLIED thrift client
  (duck-typed; this module ships no thrift dependency) — pass an
  instance to ``Catalog(metastore=...)``. The string form
  ``metastore='hive'`` is rejected with an actionable error because no
  thrift client ships in this environment; the adapter + its mock-HMS
  test pin the seam a real client drops into.

Concurrency: the JDBC backend opens one short-lived connection per
operation (closed on exit, committed/rolled back by the connection
context manager — default deferred transactions); SQLite's file locking
serializes writers, which matches the single-committer model the table
format already assumes per table.
"""

from __future__ import annotations

import os
import shutil
import sqlite3
from contextlib import contextmanager
from typing import Iterator


def create_metastore(
    warehouse: str, metastore: str = "filesystem", uri: str | None = None
) -> "Metastore":
    """The reference's (metastore, uri) switch (``PaimonConfig.java:44-60``)."""
    if metastore in (None, "", "filesystem"):
        if uri:
            raise ValueError(
                "metastore='filesystem' takes no uri (the warehouse path "
                "is the namespace); pass metastore='jdbc' to use one"
            )
        return FilesystemMetastore(warehouse)
    if metastore == "jdbc":
        if not uri:
            raise ValueError("metastore='jdbc' requires uri=<sqlite path>")
        return JdbcMetastore(warehouse, uri)
    if metastore == "hive":
        raise NotImplementedError(
            "metastore='hive' needs a connected thrift Hive-metastore "
            "client, which this environment does not ship; construct "
            "HiveMetastore(warehouse, client=<your thrift client>) and "
            "pass it to Catalog(metastore=...), or use metastore='jdbc' "
            "(SQLite namespace at uri=) / the default filesystem catalog"
        )
    raise ValueError(
        f"unknown metastore {metastore!r}; expected filesystem, jdbc or hive"
    )


class Metastore:
    """Namespace operations the catalog delegates; all identifiers arrive
    already lower-cased by the catalog (case-insensitive surface)."""

    def __init__(self, warehouse: str):
        self.warehouse = warehouse

    # databases
    def list_databases(self) -> list[str]:
        raise NotImplementedError

    def database_exists(self, db: str) -> bool:
        raise NotImplementedError

    def create_database(self, db: str) -> None:
        raise NotImplementedError

    def drop_database(self, db: str, cascade: bool) -> None:
        raise NotImplementedError

    # tables (namespace only — content lives at the returned path)
    def default_table_path(self, db: str, table: str) -> str:
        return os.path.join(self.warehouse, f"{db}.db", table)

    def list_tables(self, db: str) -> list[str]:
        raise NotImplementedError

    def table_path(self, db: str, table: str) -> str | None:
        """Registered location, or None when the table does not exist."""
        raise NotImplementedError

    def register_table(self, db: str, table: str, path: str) -> None:
        raise NotImplementedError

    def unregister_table(self, db: str, table: str) -> None:
        """DROP-table semantics: remove the pointer AND the content."""
        raise NotImplementedError

    def forget_table(self, db: str, table: str) -> None:
        """Remove ONLY the namespace pointer, never touching the path —
        the rollback primitive for a create that failed after
        registering (the location may hold a concurrent creator's data,
        so drop-semantics here could destroy content this call never
        wrote)."""
        raise NotImplementedError

    def rename_table(self, db: str, old: str, new: str, new_path: str) -> None:
        raise NotImplementedError


class FilesystemMetastore(Metastore):
    """Namespace = warehouse layout; registering a table is creating its
    directory (done by the table writer), so most ops are directory probes.
    """

    def _db_path(self, db: str) -> str:
        return os.path.join(self.warehouse, f"{db}.db")

    def list_databases(self) -> list[str]:
        return sorted(
            d[: -len(".db")]
            for d in os.listdir(self.warehouse)
            if d.endswith(".db")
            and os.path.isdir(os.path.join(self.warehouse, d))
        )

    def database_exists(self, db: str) -> bool:
        return os.path.isdir(self._db_path(db))

    def create_database(self, db: str) -> None:
        os.makedirs(self._db_path(db))

    def drop_database(self, db: str, cascade: bool) -> None:
        p = self._db_path(db)
        if os.listdir(p) and not cascade:
            raise ValueError(f"database {db} is not empty")
        shutil.rmtree(p)

    def list_tables(self, db: str) -> list[str]:
        p = self._db_path(db)
        return sorted(
            t
            for t in os.listdir(p)
            if os.path.isdir(os.path.join(p, t, "schema"))
        )

    def table_path(self, db: str, table: str) -> str | None:
        p = self.default_table_path(db, table)
        return p if os.path.isdir(os.path.join(p, "schema")) else None

    def register_table(self, db: str, table: str, path: str) -> None:
        if os.path.abspath(path) != os.path.abspath(
            self.default_table_path(db, table)
        ):
            raise ValueError(
                "filesystem metastore requires tables at their warehouse "
                "path; external locations need metastore='jdbc'"
            )
        # the directory is the registration; the creator already made it

    def unregister_table(self, db: str, table: str) -> None:
        p = self.default_table_path(db, table)
        if os.path.isdir(p):
            shutil.rmtree(p)

    def forget_table(self, db: str, table: str) -> None:
        pass  # the directory IS the registration; the caller owns cleanup

    def rename_table(self, db: str, old: str, new: str, new_path: str) -> None:
        os.rename(self.default_table_path(db, old), new_path)


class JdbcMetastore(Metastore):
    """SQLite-backed namespace (Paimon's JDBC catalog shape): pointers in
    the database, content at each table's path. Table directories default
    under the warehouse but any path is legal — the point of an external
    metastore."""

    def __init__(self, warehouse: str, uri: str):
        super().__init__(warehouse)
        # accept plain paths and jdbc:sqlite:/sqlite:// spellings
        for prefix in ("jdbc:sqlite:", "sqlite://", "sqlite:"):
            if uri.startswith(prefix):
                uri = uri[len(prefix):]
                break
        self.db_file = uri
        os.makedirs(os.path.dirname(os.path.abspath(uri)), exist_ok=True)
        with self._conn() as c:
            c.execute(
                "CREATE TABLE IF NOT EXISTS databases ("
                " name TEXT PRIMARY KEY)"
            )
            c.execute(
                "CREATE TABLE IF NOT EXISTS tables ("
                " db TEXT NOT NULL, name TEXT NOT NULL, path TEXT NOT NULL,"
                " PRIMARY KEY (db, name))"
            )

    @contextmanager
    def _conn(self) -> Iterator[sqlite3.Connection]:
        """One short-lived connection per operation: commit/rollback via
        the connection's own context manager, and ALWAYS close (the bare
        ``with sqlite3.connect(...)`` idiom commits but never closes —
        a long-lived session would leak one fd per catalog call)."""
        con = sqlite3.connect(self.db_file, timeout=30)
        try:
            with con:
                yield con
        finally:
            con.close()

    def list_databases(self) -> list[str]:
        with self._conn() as c:
            return sorted(
                r[0] for r in c.execute("SELECT name FROM databases")
            )

    def database_exists(self, db: str) -> bool:
        with self._conn() as c:
            return (
                c.execute(
                    "SELECT 1 FROM databases WHERE name = ?", (db,)
                ).fetchone()
                is not None
            )

    def create_database(self, db: str) -> None:
        try:
            with self._conn() as c:
                c.execute("INSERT INTO databases VALUES (?)", (db,))
        except sqlite3.IntegrityError:
            # Two engines racing the same uri: surface the documented
            # catalog contract, not the backend's raw exception.
            raise ValueError(f"database {db} already exists") from None
        os.makedirs(os.path.join(self.warehouse, f"{db}.db"), exist_ok=True)

    def drop_database(self, db: str, cascade: bool) -> None:
        with self._conn() as c:
            tables = [
                r for r in c.execute(
                    "SELECT name, path FROM tables WHERE db = ?", (db,)
                )
            ]
            if tables and not cascade:
                raise ValueError(f"database {db} is not empty")
            c.execute("DELETE FROM tables WHERE db = ?", (db,))
            c.execute("DELETE FROM databases WHERE name = ?", (db,))
        for _, path in tables:
            shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(
            os.path.join(self.warehouse, f"{db}.db"), ignore_errors=True
        )

    def list_tables(self, db: str) -> list[str]:
        with self._conn() as c:
            return sorted(
                r[0]
                for r in c.execute(
                    "SELECT name FROM tables WHERE db = ?", (db,)
                )
            )

    def table_path(self, db: str, table: str) -> str | None:
        with self._conn() as c:
            row = c.execute(
                "SELECT path FROM tables WHERE db = ? AND name = ?",
                (db, table),
            ).fetchone()
        return row[0] if row else None

    def register_table(self, db: str, table: str, path: str) -> None:
        try:
            with self._conn() as c:
                c.execute(
                    "INSERT INTO tables VALUES (?, ?, ?)", (db, table, path)
                )
        except sqlite3.IntegrityError:
            # The atomic duplicate check create_table relies on: racing
            # creators must see the catalog's ValueError contract.
            raise ValueError(f"table {db}.{table} already exists") from None

    def unregister_table(self, db: str, table: str) -> None:
        with self._conn() as c:
            row = c.execute(
                "SELECT path FROM tables WHERE db = ? AND name = ?",
                (db, table),
            ).fetchone()
            c.execute(
                "DELETE FROM tables WHERE db = ? AND name = ?", (db, table)
            )
        if row:
            shutil.rmtree(row[0], ignore_errors=True)

    def forget_table(self, db: str, table: str) -> None:
        with self._conn() as c:
            c.execute(
                "DELETE FROM tables WHERE db = ? AND name = ?", (db, table)
            )

    def rename_table(self, db: str, old: str, new: str, new_path: str) -> None:
        # Explicit transaction control: BEGIN IMMEDIATE takes the write
        # lock BEFORE the directory moves (no deferred-lock upgrade that
        # can SQLITE_BUSY mid-way), and the commit happens INSIDE the
        # guarded block — a failed commit must also roll the directory
        # move back, or the pointer would name a path that no longer
        # exists (unreachable from every engine sharing the catalog).
        con = sqlite3.connect(self.db_file, timeout=30)
        moved = False
        try:
            con.execute("BEGIN IMMEDIATE")
            row = con.execute(
                "SELECT path FROM tables WHERE db = ? AND name = ?",
                (db, old),
            ).fetchone()
            if row is None:
                raise ValueError(f"table {db}.{old} is not registered")
            moved = os.path.abspath(row[0]) != os.path.abspath(new_path)
            if moved:  # external-location renames are pointer-only
                os.rename(row[0], new_path)
            con.execute(
                "UPDATE tables SET name = ?, path = ?"
                " WHERE db = ? AND name = ?",
                (new, new_path, db, old),
            )
            con.commit()
        except BaseException:
            try:
                con.rollback()
            finally:
                if moved:
                    os.rename(new_path, row[0])  # roll the move back
            raise
        finally:
            con.close()


class HiveMetastore(Metastore):
    """Hive-metastore-backed namespace, adapting a CALLER-SUPPLIED thrift
    client (duck-typed against the HMS thrift surface — this module ships
    no thrift dependency, which is exactly the seam the reference keeps:
    ``PaimonConfig.java:44-60`` forwards (metastore='hive', uri) to a
    catalog factory that owns the client).

    The client must expose the standard HMS calls used below:
    ``get_all_databases() / create_database(name, location) /
    drop_database(name, delete_data, cascade) / get_all_tables(db) /
    get_table(db, name) -> obj with .sd.location /
    create_table(db, name, location) / drop_table(db, name, delete_data) /
    alter_table(db, name, new_name, new_location)``. HMS-style errors are
    translated by exception NAME (``NoSuchObjectException`` /
    ``AlreadyExistsException``) to the catalog's documented ValueError
    contract, so a real ``hmsclient``/``pymetastore`` client drops in
    without this module importing either.

    Same content split as every backend: HMS holds POINTERS (database and
    table locations); schemas/snapshots/manifests stay in the table
    directory. ``tests/test_metastore.py`` drives the full catalog CRUD
    battery through a mock client to pin the adapter contract.
    """

    def __init__(self, warehouse: str, client):
        super().__init__(warehouse)
        self.client = client

    @staticmethod
    def _is_no_such(exc: BaseException) -> bool:
        return type(exc).__name__ == "NoSuchObjectException"

    @staticmethod
    def _is_already(exc: BaseException) -> bool:
        return type(exc).__name__ == "AlreadyExistsException"

    def list_databases(self) -> list[str]:
        return sorted(self.client.get_all_databases())

    def database_exists(self, db: str) -> bool:
        return db in self.client.get_all_databases()

    def create_database(self, db: str) -> None:
        location = os.path.join(self.warehouse, f"{db}.db")
        try:
            self.client.create_database(db, location)
        except Exception as exc:
            if self._is_already(exc):
                raise ValueError(f"database {db} already exists") from None
            raise
        os.makedirs(location, exist_ok=True)

    def drop_database(self, db: str, cascade: bool) -> None:
        if self.client.get_all_tables(db) and not cascade:
            raise ValueError(f"database {db} is not empty")
        paths = [
            self.client.get_table(db, t).sd.location
            for t in self.client.get_all_tables(db)
        ]
        # delete_data=False: HMS holds POINTERS only — content removal is
        # this adapter's job (below). delete_data=True would have a real
        # HMS delete the same locations we rmtree, a double-delete that
        # also contradicts the pointer/content split documented above.
        self.client.drop_database(db, False, cascade)
        for p in paths:
            shutil.rmtree(p, ignore_errors=True)
        shutil.rmtree(
            os.path.join(self.warehouse, f"{db}.db"), ignore_errors=True
        )

    def list_tables(self, db: str) -> list[str]:
        return sorted(self.client.get_all_tables(db))

    def table_path(self, db: str, table: str) -> str | None:
        try:
            return self.client.get_table(db, table).sd.location
        except Exception as exc:
            if self._is_no_such(exc):
                return None
            raise

    def register_table(self, db: str, table: str, path: str) -> None:
        try:
            self.client.create_table(db, table, path)
        except Exception as exc:
            if self._is_already(exc):
                raise ValueError(
                    f"table {db}.{table} already exists"
                ) from None
            raise

    def unregister_table(self, db: str, table: str) -> None:
        path = self.table_path(db, table)
        try:
            # delete_data=False — the adapter owns content removal (the
            # rmtree below); see drop_database for the pointer/content
            # split rationale.
            self.client.drop_table(db, table, False)
        except Exception as exc:
            if not self._is_no_such(exc):
                raise
        if path:
            shutil.rmtree(path, ignore_errors=True)

    def forget_table(self, db: str, table: str) -> None:
        try:
            self.client.drop_table(db, table, False)
        except Exception as exc:
            if not self._is_no_such(exc):
                raise

    def rename_table(self, db: str, old: str, new: str, new_path: str) -> None:
        row = self.table_path(db, old)
        if row is None:
            raise ValueError(f"table {db}.{old} is not registered")
        moved = os.path.abspath(row) != os.path.abspath(new_path)
        if moved:  # external-location renames are pointer-only
            os.rename(row, new_path)
        try:
            self.client.alter_table(db, old, new, new_path)
        except BaseException:
            if moved:
                os.rename(new_path, row)  # roll the move back
            raise
