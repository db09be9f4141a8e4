"""Snapshot-versioned table format: the Spark-native rebuild of the Paimon
table layer the reference connector exposes.

Reference parity map (SURVEY §2.1):
- snapshots + manifests + time travel ..... A12 (``PrestoMetadata.java:133-165``,
  ``PrestoSqlTableHandle.java:113-126``)
- scan planning with file skipping ........ A1/A7/A8 (``PrestoSplitManager.java:46-82``,
  ``PrestoFilterConverter.java:71-186``)
- partition pruning incl. expression-over-
  partition-value ......................... A10/A11 (``PrestoComputePushdown.java:234-357``)
- merge-on-read for primary-key tables .... A13 (``PrestoPageSourceProvider.java:80-83``)
- system tables ``$snapshots`` ``$files``
  ``$partitions`` ``$schemas`` ``$tags``
  ``$options`` ``$manifests`` ``$audit_log`` A14 (``TestPrestoITCase.java:376-381``;
  the connector resolves ANY ``$`` suffix through ``catalog.getTable``,
  ``PrestoMetadata.java:141`` — the full set is Paimon-upstream surface)
- schema evolution projection ............. A18 (``PrestoSqlMetadataBase.java:288-343``)
- engine-native writes (reference lacks
  them — ``PrestoMetadata.java:229-263``) . A24

Storage layout (one directory per table)::

    schema/schema-<id>.json      column list w/ stable field ids, pks, partition keys, options
    snapshot/snapshot-<id>.json  commit metadata -> manifest file
    snapshot/LATEST              current snapshot id (advisory pointer)
    manifest/manifest-<id>.json  FULL file listing at that snapshot + per-file column stats
    data/...                     parquet data files (immutable)

Commits are atomic: the snapshot JSON is created with O_EXCL, so two
concurrent committers cannot both claim snapshot N — the loser re-plans
against the winner's manifest and retries (the reference gets the same
read-committed, snapshot-isolated behavior from immutable Paimon snapshots
— ``PrestoConnectorBase.java:70-97``).

Scale notes:
- Data I/O is always Spark (``df.write.parquet`` / ``spark.read.parquet``);
  the driver only touches *metadata* (JSON manifests, parquet footers).
- Partition columns are duplicated into the data files (`__part_<k>=` dirs
  are organizational), so pruned reads are a plain multi-file parquet scan
  with full types — no partition-inference coupling.
- Per-file stats come from parquet footers (metadata-only reads). For
  multi-million-file tables, gather footers with a small Spark job instead
  of the driver loop (same entries, distributed); the manifest format is
  unchanged.
- Merge-on-read shuffles on the primary key; bucketed writes keep each
  key in one bucket's file set, so a bucket-aligned reader (or periodic
  ``compact()``) bounds that cost.
"""

from __future__ import annotations

import json
import os
import re as _re_mod
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Iterable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import types as T

from paimon_presto_spark import properties
from paimon_presto_spark.plans import fileindex
from paimon_presto_spark.plans.predicate import Predicate, skip_safe_predicate

SEQ_COL = "__seq"
POS_COL = "__pos"
KIND_COL = "__row_kind"
SYS_COLS = (SEQ_COL, POS_COL, KIND_COL)
PART_DIR_PREFIX = "__part_"
DV_PATH_COL = "__dv_path"  # table-relative data-file path of a scanned row
DV_POS_COL = "__dv_pos"  # row position within that file (_metadata.row_index)


# --------------------------------------------------------------------------
# schema
# --------------------------------------------------------------------------


@dataclass
class TableSchema:
    schema_id: int
    fields: list[dict]  # {"id": int, "name": str, "type": ddl-str, "nullable": bool}
    primary_keys: list[str]
    partition_keys: list[str]
    options: dict[str, str]
    highest_field_id: int

    def to_json(self) -> dict:
        return {
            "schema_id": self.schema_id,
            "fields": self.fields,
            "primary_keys": self.primary_keys,
            "partition_keys": self.partition_keys,
            "options": self.options,
            "highest_field_id": self.highest_field_id,
        }

    @staticmethod
    def from_json(d: dict) -> "TableSchema":
        return TableSchema(
            schema_id=d["schema_id"],
            fields=d["fields"],
            primary_keys=d["primary_keys"],
            partition_keys=d["partition_keys"],
            options=d.get("options", {}),
            highest_field_id=d["highest_field_id"],
        )

    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(f["name"], _parse_type(f["type"]), f.get("nullable", True))
                for f in self.fields
            ]
        )

    def field_names(self) -> list[str]:
        return [f["name"] for f in self.fields]

    def resolve(self, name: str) -> str:
        """Case-insensitive column resolution (``FieldNameUtils.java:30-35``)."""
        for f in self.fields:
            if f["name"].lower() == name.lower():
                return f["name"]
        raise KeyError(f"no such column: {name}")

    @property
    def num_buckets(self) -> int:
        return int(self.options.get("bucket", "4"))


_TIME_RE = None  # lazy


def _is_time_type(ddl: str) -> bool:
    """True for TIME / TIME(p) declarations (any precision 0-9)."""
    global _TIME_RE
    if _TIME_RE is None:
        import re as _re

        _TIME_RE = _re.compile(r"^\s*time\s*(\(\s*\d\s*\))?\s*$", _re.I)
    return bool(_TIME_RE.match(ddl))


#: Numeric declared-type names — the single classification shared by
#: clustering-key normalization (z-order/Hilbert) and ANALYZE histograms.
#: Matched on the base name so parameterized decimals count.
NUMERIC_TYPES = (
    "tinyint", "smallint", "int", "bigint", "float", "double", "decimal"
)


def _is_numeric_type(t: str) -> bool:
    return t.split("(")[0].strip().lower() in NUMERIC_TYPES


def _parse_type(ddl: str) -> T.DataType:
    """Declared type string → physical Spark type.

    Spark has no TIME type; the pinned convention (SURVEY §7.1) is
    **micros-since-midnight as LongType** — the same value the reference
    bridges through with micros↔millis scaling
    (``PrestoTypeUtils.java:127-128``, ``PrestoPageSourceBase.java:228-229``:
    Paimon stores TIME as micros, Presto's TIME is millis). Keeping micros
    end-to-end loses nothing and filters/aggregations work as plain longs;
    the declared ``time`` string survives in the table schema metadata so
    a migrating engine can re-surface the logical type.
    """
    if _is_time_type(ddl):
        return T.LongType()
    return T.StructType.fromDDL(f"c {ddl}")[0].dataType


def split_ddl_fields(ddl: str) -> list[tuple[str, str]]:
    """Split a top-level DDL field list into (name, type-string) pairs,
    honoring nesting (``struct<a:int,b:string>``) and backquoted names.

    Needed because ``StructType.fromDDL`` rejects the TIME declarations
    ``_parse_type`` supports; only top-level TIME columns are recognized
    (TIME nested inside struct/array is not supported — same surface the
    reference maps, which bridges TIME only as a column type).
    """
    fields: list[tuple[str, str]] = []
    depth, start, in_bq = 0, 0, False
    for i, ch in enumerate(ddl + ","):
        if ch == "`":
            in_bq = not in_bq
        elif not in_bq:
            if ch in "<(":
                depth += 1
            elif ch in ">)":
                depth -= 1
            elif ch == "," and depth == 0:
                part = ddl[start:i].strip()
                start = i + 1
                if not part:
                    continue
                if part.startswith("`"):
                    end = part.index("`", 1)
                    name, typ = part[1:end], part[end + 1 :].strip()
                else:
                    name, _, typ = part.partition(" ")
                    if not typ and ":" in name:  # 'a:int' with no space
                        name, _, typ = name.partition(":")
                name = name.strip().rstrip(":")  # 'a: int' leaves 'a:'
                typ = typ.strip().removeprefix(":").strip()
                if not typ:
                    raise ValueError(f"malformed DDL field: {part!r}")
                fields.append((name, typ))
    return fields


_CHAR_RE = None  # lazy


def _char_len(ddl: str) -> int | None:
    """n for CHAR(n) column types, else None."""
    global _CHAR_RE
    if _CHAR_RE is None:
        import re as _re

        _CHAR_RE = _re.compile(r"^\s*char\s*\(\s*(\d+)\s*\)\s*$", _re.I)
    m = _CHAR_RE.match(ddl)
    return int(m.group(1)) if m else None


def _apply_char_padding(col, ddl: str):
    """Blank-pad CHAR(n) values to length n (SURVEY §7 risk 4: the
    reference engine's CHAR comparisons are padded). This is Spark's own
    CHAR contract — pad on the write side — applied explicitly because a
    bare ``cast(char(n))`` does not pad. Comparisons then behave
    consistently as long as literals are written at full width (or
    ``rtrim`` is applied), matching Spark's documented CHAR semantics."""
    n = _char_len(ddl)
    return F.rpad(col, n, " ") if n is not None else col


_VARCHAR_RE = None  # lazy


def _varchar_len(ddl: str) -> int | None:
    """n for VARCHAR(n) column types, else None (bare varchar = unbounded)."""
    global _VARCHAR_RE
    if _VARCHAR_RE is None:
        import re as _re

        _VARCHAR_RE = _re.compile(r"^\s*varchar\s*\(\s*(\d+)\s*\)\s*$", _re.I)
    m = _VARCHAR_RE.match(ddl)
    return int(m.group(1)) if m else None


def _apply_varchar_bound(col, ddl: str):
    """Reject over-length VARCHAR(n) values at write time.

    The reference preserves varchar bounds in its type mapping
    (``PrestoSqlTypeUtils.java:96-101``) and only ever reads tables whose
    writer (Paimon) enforced them; Spark's own varchar cast is a silent
    string passthrough, so the bound is enforced here — ANSI insert
    semantics (error, not truncation)."""
    n = _varchar_len(ddl)
    if n is None:
        return col
    return F.when(col.isNull() | (F.length(col) <= n), col).otherwise(
        F.raise_error(
            F.concat(F.lit(f"value too long for type varchar({n}): "), col)
        )
    )


def schema_from_spark(
    spark_schema: T.StructType,
    primary_keys: Iterable[str] = (),
    partition_keys: Iterable[str] = (),
    options: dict[str, str] | None = None,
) -> TableSchema:
    fields = [
        {"id": i, "name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
        for i, f in enumerate(spark_schema.fields)
    ]
    return TableSchema(
        schema_id=0,
        fields=fields,
        primary_keys=list(primary_keys),
        partition_keys=list(partition_keys),
        options=dict(options or {}),
        highest_field_id=len(fields) - 1,
    )


# --------------------------------------------------------------------------
# table
# --------------------------------------------------------------------------


class CommitConflict(Exception):
    pass


# folded manifest listings keyed by (meta_path, manifest file name) —
# manifest files are immutable once written, so entries never go stale
_MANIFEST_CACHE: dict[tuple[str, str], list[dict]] = {}


@dataclass
class Snapshot:
    snapshot_id: int
    schema_id: int
    commit_user: str
    commit_identifier: int
    commit_kind: str  # APPEND | UPSERT | DELETE | OVERWRITE | COMPACT
    timestamp_ms: int
    manifest: str
    total_rows: int
    # deletion-vector index for this snapshot: name of a parquet dataset
    # under <table>/index/ holding (path, pos) deleted-row positions; None
    # when the snapshot has no deletions (or the table is not in DV mode)
    dv_index: str | None = None
    # dynamic-bucket key index (bucket=-1 tables): parquet dataset under
    # <table>/index/ mapping xxhash64(pk) -> assigned bucket
    bucket_index: str | None = None
    # retraction changelog for this commit (changelog-producer=lookup):
    # parquet dataset under <meta>/changelog/ with I/UB/UA/D row kinds
    changelog: str | None = None

    def to_json(self):
        return self.__dict__.copy()


class Table:
    """A snapshot-versioned, optionally primary-keyed, partitioned table.

    `branch` selects an alternative metadata lineage (Paimon branches):
    schema/snapshot/manifest/tag/consumer files resolve under
    ``branch/branch-<name>/`` while data files stay shared at the table
    root — a branch is a writable fork that costs metadata only.
    """

    def __init__(self, spark: SparkSession, path: str, branch: str | None = None):
        self.spark = spark
        self.path = path  # table root: data/ and staging/ always live here
        self.branch_name = branch
        self.meta_path = (
            os.path.join(path, "branch", f"branch-{branch}") if branch else path
        )

    # -- metadata ----------------------------------------------------------

    def _schema_path(self, sid: int) -> str:
        return os.path.join(self.meta_path, "schema", f"schema-{sid}.json")

    def schema(self, schema_id: int | None = None) -> TableSchema:
        if schema_id is None:
            sdir = os.path.join(self.meta_path, "schema")
            schema_id = max(
                int(f[len("schema-") : -len(".json")]) for f in os.listdir(sdir)
            )
        with open(self._schema_path(schema_id)) as fh:
            return TableSchema.from_json(json.load(fh))

    def snapshot_ids(self) -> list[int]:
        sdir = os.path.join(self.meta_path, "snapshot")
        if not os.path.isdir(sdir):
            return []
        return sorted(
            int(f[len("snapshot-") : -len(".json")])
            for f in os.listdir(sdir)
            if f.startswith("snapshot-") and f.endswith(".json")
        )

    def snapshot(self, snapshot_id: int | None = None) -> Snapshot | None:
        ids = self.snapshot_ids()
        if not ids:
            return None
        sid = snapshot_id if snapshot_id is not None else ids[-1]
        if sid not in ids:
            raise ValueError(f"snapshot {sid} does not exist (have {ids})")
        with open(os.path.join(self.meta_path, "snapshot", f"snapshot-{sid}.json")) as fh:
            return Snapshot(**json.load(fh))

    def snapshot_as_of(self, timestamp_ms: int) -> Snapshot:
        """Latest snapshot committed at or before `timestamp_ms` (A12)."""
        cand = [
            self.snapshot(i)
            for i in self.snapshot_ids()
        ]
        cand = [s for s in cand if s.timestamp_ms <= timestamp_ms]
        if not cand:
            raise ValueError(f"no snapshot at or before {timestamp_ms}")
        return max(cand, key=lambda s: s.snapshot_id)

    def manifest_entries(self, snap: Snapshot | None = None) -> list[dict]:
        """The snapshot's full file listing.

        Three manifest formats (Paimon's base+delta design, so a commit
        WRITES O(changed files), not O(table files) — see
        ``_commit_manifest``):

        - ``{"entries": [...]}`` — full listing (legacy, and the base
          written by manifest full-compaction);
        - ``{"manifests": [names]}`` — a manifest LIST whose members fold
          left-to-right;
        - ``{"adds": [...], "removes": [paths]}`` — a delta member.
        """
        snap = snap or self.snapshot()
        if snap is None:
            return []
        # manifests are immutable once written: cache folded results by
        # file name (planning calls this repeatedly — stats-based
        # clustering alone reads it per column)
        key = (self.meta_path, snap.manifest)
        hit = _MANIFEST_CACHE.get(key)
        if hit is not None:
            return hit
        with open(os.path.join(self.meta_path, "manifest", snap.manifest)) as fh:
            d = json.load(fh)
        if "entries" in d:
            out_list = d["entries"]
        else:
            out: dict[str, dict] = {}
            for name in d["manifests"]:
                with open(os.path.join(self.meta_path, "manifest", name)) as fh:
                    m = json.load(fh)
                if "entries" in m:
                    out = {e["path"]: e for e in m["entries"]}
                else:
                    for p in m.get("removes", []):
                        out.pop(p, None)
                    for e in m.get("adds", []):
                        out[e["path"]] = e
            out_list = list(out.values())
        if len(_MANIFEST_CACHE) > 64:
            _MANIFEST_CACHE.clear()  # crude cap; entries are per-snapshot
        _MANIFEST_CACHE[key] = out_list
        return out_list

    def _manifest_members(self, snap: Snapshot) -> list[str]:
        """Every manifest file the snapshot references: the pointer file
        itself plus, for list manifests, all member files (shared with
        neighboring snapshots — expiry must treat them as shared)."""
        with open(os.path.join(self.meta_path, "manifest", snap.manifest)) as fh:
            d = json.load(fh)
        if "manifests" in d:
            return [snap.manifest] + list(d["manifests"])
        return [snap.manifest]

    @property
    def is_primary_keyed(self) -> bool:
        return bool(self.schema().primary_keys)

    # -- deletion vectors --------------------------------------------------
    #
    # Paimon's `deletion-vectors.enabled` mode: instead of merging away old
    # row versions at read time (window shuffle over the key), each write
    # marks the POSITIONS of shadowed/deleted rows in existing files, and
    # readers drop those positions during the scan. Reads of a primary-key
    # table become append-table reads plus a position anti-join — no
    # key-shuffle, no window — at the cost of a key-lookup job per write
    # (exactly the write-amplification Paimon's lookup compaction pays).
    # The reference exposes the option passthrough at
    # PrestoSqlTableOptionUtils.java (table-options surface); the index
    # layout mirrors Paimon's <table>/index/ deletion-vector files.

    @property
    def dv_enabled(self) -> bool:
        return self.schema().options.get("deletion-vectors.enabled") == "true"

    def _dv_root(self) -> str:
        return os.path.join(self.path, "index")

    def dv_df(self, snap: Snapshot | None = None) -> DataFrame | None:
        """The snapshot's deletion-vector index as a DataFrame of
        (path string, pos long), or None when it has no deletions."""
        snap = snap if snap is not None else self.snapshot()
        if snap is None or not snap.dv_index:
            return None
        return self.spark.read.parquet(os.path.join(self._dv_root(), snap.dv_index))

    def _file_pos_cols(self) -> tuple[F.Column, F.Column]:
        """(table-relative file path, row position) columns for a scan of
        files under this table's root, from Spark's hidden ``_metadata``."""
        prefix = "file:" + os.path.abspath(self.path) + "/"
        rel = F.expr(f"substring(_metadata.file_path, {len(prefix) + 1})")
        return rel.alias(DV_PATH_COL), F.col("_metadata.row_index").alias(DV_POS_COL)

    def _check_dv_supported(self, schema: TableSchema) -> None:
        if schema.options.get("file.format", "parquet") != "parquet":
            raise ValueError("deletion-vectors require file.format=parquet "
                             "(row positions come from the parquet row index)")
        engine = schema.options.get("merge-engine", "deduplicate")
        if schema.primary_keys and engine != "deduplicate":
            raise ValueError(
                f"deletion-vectors support merge-engine deduplicate, got {engine!r}")
        if schema.options.get("sequence.field"):
            # DV upserts eagerly delete the key's OLD position; under
            # sequence.field the old row may be the merge winner, so the
            # eager delete would be wrong. Paimon has the same restriction.
            raise ValueError(
                "deletion-vectors cannot be combined with sequence.field "
                "(an out-of-order upsert must lose to the stored row)")

    def _dv_hits(self, keys: DataFrame) -> DataFrame:
        """(path, pos) of currently-live rows whose primary key appears in
        `keys`. One semi-join of the live scan against the (deduplicated)
        key set; in DV mode each key has at most one live position."""
        pks = self.schema().primary_keys
        live = self.scan().to_df(merge=False, keep_pos=True)
        return (
            live.select(*pks, DV_PATH_COL, DV_POS_COL)
            .join(keys.select(*pks).distinct(), on=pks, how="left_semi")
            .select(F.col(DV_PATH_COL).alias("path"), F.col(DV_POS_COL).alias("pos"))
        )

    def _write_dv_index(self, add: DataFrame, base: Snapshot | None) -> str:
        """Write the next cumulative DV index: previous positions ∪ `add`.
        The index is a plain parquet dataset so readers join it
        distributed — never materialized on the driver."""
        prev = self.dv_df(base)
        dv = add if prev is None else prev.unionByName(add).distinct()
        name = f"dv-{uuid.uuid4().hex}"
        os.makedirs(self._dv_root(), exist_ok=True)
        dv.repartition(1).write.parquet(os.path.join(self._dv_root(), name))
        return name

    # -- dynamic bucketing -------------------------------------------------
    #
    # Paimon's `bucket = -1` mode: instead of a fixed pmod(hash, n) layout,
    # a persistent key index assigns each primary key a bucket once, and
    # new keys fill fresh buckets at `dynamic-bucket.target-row-num` keys
    # apiece. Bucket count then grows WITH the data — the 100 TB answer to
    # the undersized-fixed-bucket write-amplification trap, without the
    # full rescale rewrite. A key's bucket never changes, so per-bucket
    # merge-on-read (the shuffle-free DataSource reader) stays correct.

    @property
    def is_dynamic_bucket(self) -> bool:
        return self.schema().options.get("bucket") == "-1"

    def bucket_index_df(self, snap: Snapshot | None = None) -> DataFrame | None:
        snap = snap if snap is not None else self.snapshot()
        if snap is None or not snap.bucket_index:
            return None
        return self.spark.read.parquet(
            os.path.join(self._dv_root(), snap.bucket_index)
        )

    def _assign_dynamic_buckets(
        self, df: DataFrame, base: Snapshot | None, index_new_keys: bool = True
    ) -> tuple[DataFrame, str | None]:
        """Attach ``__bucket`` to each row of `df` from the key index:
        known keys keep their bucket; new keys fill the newest bucket if it
        has room, else hash-split across ceil(n_new/target) FRESH buckets.

        Returns (df with __bucket, new index dataset name or None when the
        index is unchanged). Two small aggregations plus one join against
        the index — the same cost profile as Paimon's hash-index lookup,
        expressed as a Spark join instead of per-writer in-memory state.
        `index_new_keys=False` (deletes) assigns strays to bucket 0
        without recording them: a -D for a key never inserted merges away
        no matter which bucket holds it.
        """
        import math

        schema = self.schema()
        pks = schema.primary_keys
        target = int(schema.options.get("dynamic-bucket.target-row-num", "2000000"))
        kh = F.xxhash64(*[F.col(k) for k in pks])
        df = df.withColumn("__kh", kh)
        idx = self.bucket_index_df(base)
        if idx is None:
            if not index_new_keys:
                return df.withColumn("__bucket", F.lit(0)).drop("__kh"), None
            n_new = df.select("__kh").distinct().count()
            k = max(1, math.ceil(n_new / target))
            assigned = df.withColumn(
                "__bucket", F.pmod(F.col("__kh"), F.lit(k)).cast("int")
            )
            name = self._write_bucket_index(
                assigned.select(F.col("__kh").alias("kh"),
                                F.col("__bucket").alias("bucket")).distinct(),
                None,
            )
            return assigned.drop("__kh"), name
        joined = df.join(
            idx.select(F.col("kh").alias("__kh"),
                       F.col("bucket").alias("__old_bucket")),
            on="__kh", how="left",
        )
        if not index_new_keys:
            return (
                joined.withColumn(
                    "__bucket", F.coalesce("__old_bucket", F.lit(0)).cast("int")
                ).drop("__kh", "__old_bucket"),
                None,
            )
        occ = {
            r["bucket"]: r["cnt"]
            for r in idx.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()
        }
        max_b = max(occ) if occ else 0
        n_new = (
            joined.filter(F.col("__old_bucket").isNull())
            .select("__kh").distinct().count()
        )
        if n_new == 0:
            return (
                joined.withColumn("__bucket", F.col("__old_bucket").cast("int"))
                .drop("__kh", "__old_bucket"),
                None,  # index unchanged
            )
        if n_new <= target - occ.get(max_b, 0):
            new_bucket = F.lit(max_b)  # newest bucket still has room
        else:
            k = math.ceil(n_new / target)
            new_bucket = F.lit(max_b + 1) + F.pmod(F.col("__kh"), F.lit(k))
        assigned = joined.withColumn(
            "__bucket", F.coalesce(F.col("__old_bucket"), new_bucket).cast("int")
        )
        adds = (
            assigned.filter(F.col("__old_bucket").isNull())
            .select(F.col("__kh").alias("kh"), F.col("__bucket").alias("bucket"))
            .distinct()
        )
        name = self._write_bucket_index(adds, base)
        return assigned.drop("__kh", "__old_bucket"), name

    def _write_bucket_index(self, adds: DataFrame, base: Snapshot | None) -> str:
        prev = self.bucket_index_df(base)
        idx = adds if prev is None else prev.unionByName(adds)
        name = f"bidx-{uuid.uuid4().hex}"
        os.makedirs(self._dv_root(), exist_ok=True)
        idx.repartition(1).write.parquet(os.path.join(self._dv_root(), name))
        return name

    def delete_where(self, condition: str) -> Snapshot:
        """Row-level ``DELETE ... WHERE <condition>`` without rewriting data.

        DV mode (append-only or primary-key): the matching rows' positions
        join the deletion-vector index — a metadata-plus-index commit,
        O(matches), no data files touched. Non-DV primary-key tables fall
        back to tombstone deletes of the matching keys. Non-DV append
        tables have no row identity to delete by, so they must use DV mode.
        """
        if not self.dv_enabled:
            if self.is_primary_keyed:
                return self.delete(self.to_df().filter(F.expr(condition)))
            raise ValueError(
                "append table without deletion-vectors.enabled cannot delete rows"
            )
        base = self.snapshot()
        if base is None:
            raise ValueError("table has no snapshots")
        live = self.scan().to_df(merge=False, keep_pos=True).filter(F.expr(condition))
        hits = live.select(
            F.col(DV_PATH_COL).alias("path"), F.col(DV_POS_COL).alias("pos")
        )
        dv_name = self._write_dv_index(hits, base)
        return self._commit_meta(
            "DELETE", self.manifest_entries(base), dv_name, expect=base.snapshot_id
        )

    # -- write path --------------------------------------------------------

    def append(
        self, df: DataFrame, commit_identifier: int | None = None
    ) -> Snapshot:
        """Append-only commit (tables without primary keys).

        ``commit_identifier`` is the writer-supplied idempotence handle
        from Paimon's sink contract (``BatchTableCommit``/the Flink
        sink's checkpoint id, surfaced as ``commitIdentifier`` in real
        Paimon snapshots): a resumable writer stamps each commit with a
        monotone identifier and, on restart, reads the latest committed
        one back to know where to continue (see ``operators/emit.py``).
        Default: the snapshot id, as before."""
        if self.is_primary_keyed:
            raise ValueError("primary-key table: use upsert()/delete()")
        snap = self._commit_write(
            df, kind="APPEND", row_kind=None,
            commit_identifier=commit_identifier,
        )
        # small-file compaction: append tables accumulate files per
        # partition just like pk buckets accumulate sorted runs
        self._maybe_auto_compact(self.schema())
        return snap

    def upsert(self, df: DataFrame) -> Snapshot:
        """Insert-or-update by primary key (RowKind +I rows).

        In DV mode the batch is first deduplicated per key (last row wins,
        as the deduplicate engine would), then the OLD positions of the
        touched keys are added to the deletion-vector index in the same
        commit — so every key has exactly one live position and reads skip
        the merge entirely."""
        if not self.is_primary_keyed:
            raise ValueError("append-only table: use append()")
        schema = self.schema()
        if schema.options.get("rowkind.field"):
            return self._upsert_with_rowkind(df, schema)
        dv_mode = schema.options.get("deletion-vectors.enabled") == "true"
        dynamic = schema.options.get("bucket") == "-1"
        clg_name = None
        if schema.options.get("changelog-producer") == "lookup":
            clg_name = self._produce_lookup_changelog(df, schema, deletes=False)
            # changelog rows were computed against the current snapshot;
            # serialize with `expect` so they can't go stale mid-commit
            base0 = self.snapshot()
            if not dv_mode and not dynamic:
                snap = self._commit_write(
                    df, kind="UPSERT", row_kind="I", changelog=clg_name,
                    expect=base0.snapshot_id if base0 else 0,
                )
                self._maybe_auto_compact(schema)
                return snap
        elif not dv_mode and not dynamic:
            snap = self._commit_write(df, kind="UPSERT", row_kind="I")
            self._maybe_auto_compact(schema)
            return snap
        base = self.snapshot()
        dv_name = None
        if dv_mode:
            self._check_dv_supported(schema)
            pks = schema.primary_keys
            w = Window.partitionBy(*pks).orderBy(F.desc(POS_COL))
            df = (
                df.withColumn(POS_COL, F.monotonically_increasing_id())
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn", POS_COL)
            )
            if base is not None:
                hits = self._dv_hits(df)
                dv_name = self._write_dv_index(hits, base)
        b_name = None
        if dynamic:
            df, b_name = self._assign_dynamic_buckets(df, base)
        snap = self._commit_write(
            df, kind="UPSERT", row_kind="I", dv_index=dv_name,
            bucket_index=b_name,
            expect=base.snapshot_id if base else 0,
            changelog=clg_name,
        )
        if not dv_mode:
            self._maybe_auto_compact(schema)
        return snap

    def _upsert_with_rowkind(self, df: DataFrame, schema: TableSchema) -> Snapshot:
        """CDC-batch upsert driven by ``rowkind.field`` (Paimon's public
        option: a column of the input carries each row's kind, so ONE
        atomic commit can mix inserts/updates and deletes — exactly what a
        database CDC feed emits). Values ``-D``/``D``/``-U`` mark
        tombstones; everything else is an upsert. Within the batch the
        winner per key is resolved first (by ``sequence.field`` when set,
        else input order — last row wins), matching Paimon's writer
        buffer, so a key's insert+delete in one batch collapses before the
        commit.
        """
        rkf = schema.options["rowkind.field"]
        if rkf not in schema.field_names():
            raise ValueError(f"rowkind.field references unknown column {rkf!r}")
        if rkf in schema.primary_keys:
            raise ValueError(f"rowkind.field {rkf!r} cannot be a primary key")
        self._check_cdc_batch_supported(schema, "rowkind.field")
        is_del = F.upper(F.col(rkf)).isin("-D", "D", "-U")
        df = df.withColumn(
            "__rk", F.when(is_del, F.lit("D")).otherwise(F.lit("I"))
        )
        return self._commit_cdc_batch(df, schema)

    def _check_cdc_batch_supported(self, schema: TableSchema, what: str) -> None:
        engine = schema.options.get("merge-engine", "deduplicate")
        if engine != "deduplicate":
            raise ValueError(
                f"{what} requires merge-engine deduplicate, got {engine!r}"
            )
        if schema.options.get("deletion-vectors.enabled") == "true":
            raise ValueError(
                f"{what} cannot be combined with deletion-vectors "
                "(eager position deletes assume insert-only batches)"
            )

    def _commit_cdc_batch(self, df: DataFrame, schema: TableSchema) -> Snapshot:
        """ONE atomic commit of a mixed insert/tombstone batch: `df`
        carries a ``__rk`` column ('I' or 'D') per row. Within-batch
        winners resolve per key first (by sequence.field when set, else
        input order), the lookup producer emits a single mixed changelog,
        dynamic-bucket tombstones for never-seen keys are not indexed."""
        pks = schema.primary_keys
        seqf = _sequence_fields(schema)
        w = Window.partitionBy(*pks).orderBy(
            *[F.desc_nulls_last(f) for f in seqf], F.desc(POS_COL)
        )
        df = (
            df.withColumn(POS_COL, F.monotonically_increasing_id())
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", POS_COL)
        )
        is_del = F.col("__rk") == "D"
        clg_name = None
        if schema.options.get("changelog-producer") == "lookup":
            clg_name = self._produce_rowkind_changelog(
                df.filter(~is_del).drop("__rk"),
                df.filter(is_del).drop("__rk"),
                schema,
            )
        base = self.snapshot()
        b_name = None
        if schema.options.get("bucket") == "-1":
            # inserts index new keys; tombstones for never-seen keys merge
            # away wherever they land and must NOT pollute the key index
            ins, b_name = self._assign_dynamic_buckets(df.filter(~is_del), base)
            dels, _ = self._assign_dynamic_buckets(
                df.filter(is_del), base, index_new_keys=False
            )
            df = ins.unionByName(dels)
        need_expect = b_name is not None or clg_name is not None
        snap = self._commit_write(
            df, kind="UPSERT", row_kind=F.col("__rk"),
            bucket_index=b_name, changelog=clg_name,
            expect=(base.snapshot_id if base else 0) if need_expect else None,
        )
        self._maybe_auto_compact(schema)
        return snap

    def merge_into(
        self,
        source: DataFrame,
        when_matched: str = "update",
        matched_condition: str | None = None,
        when_not_matched: str = "insert",
        update_set: dict[str, str] | None = None,
    ) -> Snapshot:
        """MERGE INTO in one atomic commit (the lakehouse upsert idiom;
        Paimon ships the same statement through its Spark integration):

        - ``when_matched``: ``'update'`` (source row replaces the stored
          row), ``'delete'`` (tombstone), or ``'ignore'`` — applied only
          where ``matched_condition`` (SQL over source columns, may
          reference the stored row as ``target.<col>``) holds; matched
          rows failing the condition are left untouched.
        - ``when_not_matched``: ``'insert'`` or ``'ignore'``.
        - ``update_set``: column-level UPDATE (``WHEN MATCHED THEN UPDATE
          SET col = expr``): only the listed columns change — each expr
          is SQL over source columns and the stored row (``target.<col>``)
          — and every unlisted column KEEPS its stored value. Without it,
          the source row replaces the stored row whole.

        Matching is by primary key against the CURRENT merged state (one
        broadcast semi-lookup of the batch keys — the same price the
        changelog producer pays). The commit itself is a mixed
        insert/tombstone batch, so readers never observe a half-applied
        merge.
        """
        if not self.is_primary_keyed:
            raise ValueError("merge_into requires a primary-key table")
        if when_matched not in ("update", "delete", "ignore"):
            raise ValueError(f"when_matched must be update|delete|ignore, got {when_matched!r}")
        if when_not_matched not in ("insert", "ignore"):
            raise ValueError(f"when_not_matched must be insert|ignore, got {when_not_matched!r}")
        schema = self.schema()
        self._check_cdc_batch_supported(schema, "merge_into")
        pks = schema.primary_keys
        cols = schema.field_names()
        missing = [c for c in pks if c not in source.columns]
        if missing:
            raise ValueError(f"source is missing key columns {missing}")
        missing_vals = [c for c in cols
                        if c not in pks and c not in source.columns]
        if missing_vals and when_matched == "update" and update_set is None:
            # Whole-row replace with a partial source would silently
            # overwrite every unlisted stored column with NULL — SQL MERGE
            # and Paimon both demand the columns (or an explicit SET list)
            # instead. Null-padding is only sound for delete/ignore paths
            # (key-only sources) and for inserts (SQL INSERT pads nulls).
            raise ValueError(
                f"merge_into with when_matched='update' and no update_set "
                f"replaces the stored row whole, but the source is missing "
                f"columns {missing_vals}; pass update_set= to patch only "
                f"some columns, or provide every table column"
            )
        for c in missing_vals:
            source = source.withColumn(c, F.lit(None).cast(_parse_type(
                next(f["type"] for f in schema.fields if f["name"] == c))))
        base = self.snapshot()
        keys = source.select(*pks).distinct()
        if base is None:
            existing = None
        else:
            existing = (
                self.to_df()
                .join(F.broadcast(keys), pks, "inner")
                .select(*[F.col(c).alias(f"__t_{c}") for c in cols])
            )
        src = source.select(*cols)
        if existing is None:
            marked = src.withColumn("__matched", F.lit(False))
            for c in cols:
                marked = marked.withColumn(f"__t_{c}", F.lit(None).cast(
                    _parse_type(next(
                        f["type"] for f in schema.fields if f["name"] == c))))
        else:
            marked = src.join(
                existing,
                [F.col(k) == F.col(f"__t_{k}") for k in pks],
                "left",
            ).withColumn(
                "__matched", F.col(f"__t_{pks[0]}").isNotNull()
            )
        # expose the stored row as target.<col> for the condition
        cond = F.lit(True)
        if matched_condition is not None:
            cond = F.expr(
                _re_mod.sub(r"\btarget\.", "__t_", matched_condition)
            )
        if update_set is not None:
            if when_matched != "update":
                raise ValueError("update_set requires when_matched='update'")
            bad = [c for c in update_set if c not in cols or c in pks]
            if bad:
                raise ValueError(
                    f"update_set keys must be non-key columns, got {bad}")
        m = F.col("__matched")
        if update_set is not None:
            # SQL MERGE SET semantics: every expr (and the condition,
            # already captured in `cond`) evaluates against PRE-update
            # values — one select applies all patches simultaneously so no
            # expr can observe another column's patched value. Matched
            # rows take stored values patched by the SET exprs; unmatched
            # rows (inserts) keep source values untouched.
            patched_cols = []
            for c in cols:
                if c in update_set:
                    patched = F.expr(
                        _re_mod.sub(r"\btarget\.", "__t_", update_set[c])
                    )
                else:
                    patched = F.col(f"__t_{c}")
                patched_cols.append(
                    F.when(m, patched).otherwise(F.col(c)).alias(c)
                )
            marked = marked.select(
                *patched_cols,
                "__matched",
                cond.alias("__cond"),
            )
            cond = F.col("__cond")
        if when_matched == "update":
            keep = (~m) | (m & cond)
            rk = F.lit("I")
        elif when_matched == "delete":
            keep = (~m) | (m & cond)
            rk = F.when(m & cond, F.lit("D")).otherwise(F.lit("I"))
        else:  # ignore matched
            keep = ~m
            rk = F.lit("I")
        if when_not_matched == "ignore":
            keep = keep & m if when_matched != "ignore" else F.lit(False)
        batch = (
            marked.filter(keep)
            .withColumn("__rk", rk)
            .select(*cols, "__rk")
        )
        return self._commit_cdc_batch(batch, schema)

    def delete(self, df: DataFrame) -> Snapshot:
        """Delete by primary key.

        Default path writes RowKind -D tombstones that merge away on read
        (mirrors the reference fixture flow, ``TestPrestoITCase.java:94-96``).
        DV mode instead marks the keys' live positions in the
        deletion-vector index — no tombstone rows, no read-side merge.

        ``df`` needs at least the pk columns; missing columns are nulled.
        """
        schema = self.schema()
        clg_name = None
        if schema.options.get("changelog-producer") == "lookup":
            clg_name = self._produce_lookup_changelog(df, schema, deletes=True)
        if schema.options.get("deletion-vectors.enabled") == "true":
            self._check_dv_supported(schema)
            base = self.snapshot()
            if base is None:
                raise ValueError("table has no snapshots")
            hits = self._dv_hits(df.select(*schema.primary_keys))
            dv_name = self._write_dv_index(hits, base)
            return self._commit_meta(
                "DELETE", self.manifest_entries(base), dv_name,
                expect=base.snapshot_id, changelog=clg_name,
            )
        engine = schema.options.get("merge-engine", "deduplicate")
        if engine != "deduplicate" and schema.options.get("ignore-delete") != "true":
            raise ValueError(
                f"merge-engine {engine!r} does not accept deletes "
                "(set option ignore-delete=true to silently drop them)"
            )
        for c in schema.field_names():
            if c not in df.columns:
                df = df.withColumn(c, F.lit(None).cast(_parse_type(
                    next(f["type"] for f in schema.fields if f["name"] == c))))
        df = df.select(*schema.field_names())
        if schema.options.get("bucket") == "-1":
            # tombstones must land in the key's assigned bucket so the
            # per-bucket merge sees them; unknown keys go anywhere (their
            # -D merges to nothing regardless) and are not indexed
            df, _ = self._assign_dynamic_buckets(
                df, self.snapshot(), index_new_keys=False
            )
        if clg_name is not None:
            base = self.snapshot()
            return self._commit_write(
                df, kind="DELETE", row_kind="D", changelog=clg_name,
                expect=base.snapshot_id if base else 0,
            )
        return self._commit_write(df, kind="DELETE", row_kind="D")

    def compact(
        self, sort_by: list[str] | None = None, strategy: str = "order"
    ) -> Snapshot:
        """Rewrite current merged state into fresh files (OVERWRITE manifest).

        Bounds merge-on-read cost: after compaction a snapshot has one
        level, so the read-side window dedup sees one row per key.

        ``sort_by`` additionally clusters the rewrite on those columns
        (Paimon's sort-compact; its upstream ``sort-compact`` action takes
        the same order/zorder choice):

        - ``strategy="order"``: lexicographic range clustering — surgical
          min/max file skipping on the FIRST column (and prefix-correlated
          ones), little help on later columns.
        - ``strategy="zorder"``: bit-interleaved Z-values over all
          ``sort_by`` columns (numeric; 2-4 of them) — every file covers a
          narrow hyper-rectangle, so skipping works on EACH column
          independently. The right choice at 100 TB when queries filter on
          different columns of the same table. Column ranges come from
          manifest stats (no extra data pass); rows are range-partitioned
          by Z-value so file count stays at the shuffle-partition count.
        - ``strategy="hilbert"``: same per-column skipping as zorder but
          along a Hilbert curve (Paimon upstream's second clustering
          choice). The curve has no Z-shaped jumps — consecutive index
          values are always ADJACENT cells — so each file's bounding box
          is tighter on average; prefer it when range predicates dominate.
          Computed with a vectorized Arrow-batched kernel (Skilling's
          transform) — a one-off pass inside the rewrite, not a hot path.
        """
        current = self.to_df()
        if sort_by:
            # explicit partition count: AQE would otherwise coalesce the
            # range shuffle and fold the clustering into too few files
            n = int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
            if strategy in ("zorder", "hilbert"):
                if strategy == "zorder":
                    z = self._zorder_value(current, sort_by)
                else:
                    z = self._hilbert_value(current, sort_by)
                current = (
                    current.withColumn("__z", z)
                    .repartitionByRange(n, "__z")
                    .sortWithinPartitions("__z")
                    .drop("__z")
                )
            elif strategy == "order":
                current = current.repartitionByRange(n, *sort_by).sortWithinPartitions(
                    *sort_by
                )
            else:
                raise ValueError(f"unknown compact strategy {strategy!r}")
        # a full replace rewrites from the merged state: deletions are
        # materialized into the new files, so the DV index resets to empty.
        # In DV mode, conflict (rather than silently drop) a concurrent
        # delete that lands between our read and our commit.
        base = self.snapshot()
        if self.is_primary_keyed and self.is_dynamic_bucket:
            # rewrite preserves each key's assigned bucket (n_new == 0, so
            # the index itself is untouched and carries forward)
            current, _ = self._assign_dynamic_buckets(current, base)
        return self._commit_write(
            current, kind="COMPACT", row_kind="I" if self.is_primary_keyed else None,
            replace=True,
            expect=(base.snapshot_id if base else 0) if self.dv_enabled else None,
        )

    def compact_buckets(self, min_files: int | None = None) -> Snapshot | None:
        """Partial compaction: rewrite ONLY the (partition, bucket) groups
        holding at least `min_files` data files (default: the
        ``num-sorted-run.compaction-trigger`` option, Paimon's writer-side
        trigger, default 5). Untouched groups keep their files byte-for-
        byte — at 100 TB this is the difference between compaction being
        a routine background step (O(hot buckets)) and a full-table
        rewrite. Returns None when nothing crossed the trigger.

        Correct per-group because bucketing confines every version of a
        key to one bucket: collapsing a group locally can never miss a
        newer version elsewhere. Rewrites commit as COMPACT, so streaming
        changelog readers and incremental reads ignore them. DV tables
        drop their dead positions during the rewrite and the rewritten
        files' index rows fold away (other files keep theirs).
        """
        schema = self.schema()
        dv_mode = schema.options.get("deletion-vectors.enabled") == "true"
        if min_files is None:
            min_files = int(
                schema.options.get("num-sorted-run.compaction-trigger", "5")
            )
        base = self.snapshot()
        if base is None:
            return None
        entries = self.manifest_entries(base)
        groups: dict[str, list[dict]] = {}
        for e in entries:
            key = json.dumps(
                {"p": e["partition"], "b": e["bucket"]}, sort_keys=True
            )
            groups.setdefault(key, []).append(e)
        hot = {k: v for k, v in groups.items() if len(v) >= min_files}
        if not hot:
            return None
        pk = self.is_primary_keyed
        parts: list[DataFrame] = []
        for key, es in hot.items():
            bucket = json.loads(key)["b"]
            by_schema: dict[int, list[str]] = {}
            for e in es:
                by_schema.setdefault(e["schema_id"], []).append(
                    os.path.join(self.path, e["path"])
                )
            gdf = None
            for wsid, files in sorted(by_schema.items()):
                ws = self.schema(wsid)
                fmt = ws.options.get("file.format", "parquet")
                raw = _read_data_files(self.spark, fmt, files)
                if dv_mode:
                    # drop the group's deleted positions during the rewrite
                    # (the fold DV compaction performs); untouched files
                    # keep their index rows
                    dv = self.dv_df(base)
                    if dv is not None:
                        pcol, poscol = self._file_pos_cols()
                        raw = (
                            raw.select("*", pcol, poscol)
                            .join(
                                F.broadcast(dv.withColumnRenamed(
                                    "path", DV_PATH_COL
                                ).withColumnRenamed("pos", DV_POS_COL)),
                                [DV_PATH_COL, DV_POS_COL],
                                "left_anti",
                            )
                            .drop(DV_PATH_COL, DV_POS_COL)
                        )
                piece = _project_to(raw, ws, schema, pk)
                gdf = piece if gdf is None else gdf.unionByName(piece)
            if pk:
                gdf = _merge_on_read(gdf, schema)
            # one output file per compacted group — the point of the
            # rewrite; group size is bucket-bounded, so one task suffices
            parts.append(
                gdf.coalesce(1).withColumn("__bucket", F.lit(int(bucket)))
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        next_id = base.snapshot_id + 1
        staging = os.path.join(self.path, "staging", uuid.uuid4().hex)
        new_entries = self._write_data_files(
            df, schema, next_id, "I" if pk else None, staging, prefix="cpt"
        )
        keep = [
            e
            for e in entries
            if json.dumps({"p": e["partition"], "b": e["bucket"]},
                          sort_keys=True) not in hot
        ]
        # fold the rewritten files' deletions out of the DV index (their
        # dead rows were dropped in the rewrite); other files keep theirs
        new_dv = base.dv_index
        if dv_mode and base.dv_index:
            hot_paths = {e["path"] for es in hot.values() for e in es}
            remaining = self.dv_df(base).filter(
                ~F.col("path").isin(list(hot_paths))
            )
            if remaining.limit(1).count() == 0:
                new_dv = None
            else:
                name = f"dv-{uuid.uuid4().hex}"
                remaining.repartition(1).write.parquet(
                    os.path.join(self._dv_root(), name)
                )
                new_dv = name
        cur = self.snapshot()
        if cur.snapshot_id != base.snapshot_id:
            raise CommitConflict(
                "concurrent commit during bucket compaction — retry"
            )
        return self._commit_manifest(
            schema, next_id, "COMPACT", keep + new_entries,
            dv_index=new_dv, bucket_index=base.bucket_index,
        )

    def _maybe_auto_compact(self, schema: TableSchema) -> None:
        """Writer-side automatic compaction: with
        ``num-sorted-run.compaction-trigger`` set, each upsert checks its
        buckets' file counts and rewrites only those past the trigger —
        Paimon's writers do the same inside their commit."""
        if "num-sorted-run.compaction-trigger" not in schema.options:
            return
        try:
            self.compact_buckets()
        except CommitConflict:
            pass  # another writer moved the table; its trigger will fire

    def _zorder_value(self, df: DataFrame, cols: list[str], bits: int = 16) -> F.Column:
        """Z-order key: each column scaled to `bits` buckets between its
        manifest-stats min/max, then bit-interleaved into one long."""
        scaled = self._scaled_coords(df, cols, bits, "zorder")
        k = len(cols)
        z = F.lit(0).cast("long")
        for bit in range(bits):
            for j, v in enumerate(scaled):
                z = z + F.shiftleft(
                    F.shiftright(v, bit).bitwiseAND(F.lit(1)), bit * k + j
                )
        return z

    def _hilbert_value(self, df: DataFrame, cols: list[str], bits: int = 10) -> F.Column:
        """Hilbert-curve key over 2-4 numeric columns, scaled like zorder."""
        scaled = self._scaled_coords(df, cols, bits, "hilbert")
        return _hilbert_index(scaled, bits)

    def _scaled_coords(
        self, df: DataFrame, cols: list[str], bits: int, what: str
    ) -> list[F.Column]:
        """Each column scaled to an integer in [0, 2^bits) between its
        manifest-stats min/max (single data pass only as a no-stats
        fallback) — the shared coordinate normalization for space-filling
        clustering keys."""
        if not 2 <= len(cols) <= 4:
            raise ValueError(f"{what} needs 2-4 columns")
        schema = self.schema()
        types = {f["name"]: f["type"] for f in schema.fields}
        bounds = {}
        for c in cols:
            cl = schema.resolve(c)
            if not _is_numeric_type(types[cl]):
                raise ValueError(f"{what} column {c!r} must be numeric, got {types[cl]}")
            mns = [
                e["stats"][cl]["min"]
                for e in self.manifest_entries()
                if e.get("stats", {}).get(cl, {}).get("min") is not None
            ]
            mxs = [
                e["stats"][cl]["max"]
                for e in self.manifest_entries()
                if e.get("stats", {}).get(cl, {}).get("max") is not None
            ]
            if mns and mxs:
                bounds[cl] = (float(min(mns)), float(max(mxs)))
            else:  # no stats (e.g. all-null column): single data pass fallback
                row = df.agg(
                    F.min(cl).cast("double"), F.max(cl).cast("double")
                ).collect()[0]
                bounds[cl] = (row[0] or 0.0, row[1] or 0.0)
        scaled = []
        for c in cols:
            cl = schema.resolve(c)
            mn, mx = bounds[cl]
            if mx <= mn:
                scaled.append(F.lit(0).cast("long"))
                continue
            b = F.width_bucket(
                F.col(cl).cast("double"), F.lit(mn), F.lit(mx), F.lit(1 << bits)
            ) - 1
            scaled.append(
                F.coalesce(
                    F.least(F.greatest(b, F.lit(0)), F.lit((1 << bits) - 1)),
                    F.lit(0),
                ).cast("long")
            )
        return scaled

    def drop_partition(self, **partition_values) -> Snapshot:
        """Atomically drop whole partitions (``ALTER TABLE ... DROP
        PARTITION`` / Paimon partition expiration): a metadata-only commit
        whose manifest excludes the dropped partitions' files — O(manifest),
        no data rewritten; storage is reclaimed by ``expire_snapshots``.
        """
        schema = self.schema()
        for k in partition_values:
            if k not in schema.partition_keys:
                raise ValueError(f"{k!r} is not a partition key")
        want = {k: str(v) for k, v in partition_values.items()}
        if self.snapshot() is None:
            raise ValueError("table has no snapshots")
        for _attempt in range(5):
            prev = self.snapshot()
            next_id = (prev.snapshot_id + 1) if prev else 1
            # recomputed per attempt so a racing writer's files survive
            kept = [
                e
                for e in self.manifest_entries(prev)
                if any(e["partition"].get(k) != v for k, v in want.items())
            ]
            try:
                # surviving partitions keep their deletion vectors and
                # bucket assignments (entries for dropped files are inert)
                return self._commit_manifest(
                    schema, next_id, "DROP_PARTITION", kept,
                    dv_index=prev.dv_index, bucket_index=prev.bucket_index,
                )
            except CommitConflict:
                continue
        raise CommitConflict("gave up after 5 retries")

    def expire_partitions(
        self,
        expiration_ms: int | None = None,
        timestamp_formatter: str | None = None,
        partition_key: str | None = None,
        now_ms: int | None = None,
    ) -> list[dict]:
        """Time-based partition expiration (Paimon's
        ``partition.expiration-time``): drop every partition whose
        time-typed value is older than now − expiration, in ONE
        metadata-only commit — the retention loop for date-partitioned
        fact tables (at 100 TB, dropping day partitions must cost
        O(manifest), never a rewrite; storage returns via
        ``expire_snapshots``).

        Arguments default from table options ``partition.expiration-time``
        (duration like ``7 d`` / ``24 h`` / ``30000 ms``),
        ``partition.timestamp-formatter`` (strptime pattern, default
        ``%Y-%m-%d``), and the first partition key. Unparseable partition
        values are kept (conservative). Returns the expired partition
        dicts; no commit happens when nothing expires.
        """
        import datetime as _dt

        schema = self.schema()
        if not schema.partition_keys:
            raise ValueError("partition expiration requires a partitioned table")
        if expiration_ms is None:
            spec = schema.options.get("partition.expiration-time")
            if spec is None:
                raise ValueError(
                    "no expiration_ms given and option "
                    "partition.expiration-time is unset"
                )
            expiration_ms = _parse_duration_ms(spec)
        fmt = timestamp_formatter or schema.options.get(
            "partition.timestamp-formatter", "%Y-%m-%d"
        )
        key = partition_key or schema.partition_keys[0]
        if key not in schema.partition_keys:
            raise ValueError(f"{key!r} is not a partition key")
        cutoff_ms = (now_ms if now_ms is not None else int(time.time() * 1000)) - expiration_ms

        def value_ms(v: str) -> int | None:
            try:
                dt = _dt.datetime.strptime(v, fmt)
                return int(dt.replace(tzinfo=_dt.timezone.utc).timestamp() * 1000)
            except (ValueError, TypeError):
                return None

        if self.snapshot() is None:
            return []
        for _attempt in range(5):
            prev = self.snapshot()
            entries = self.manifest_entries(prev)
            expired_parts: dict[str, dict] = {}
            kept = []
            for e in entries:
                ms = value_ms(e["partition"].get(key))
                if ms is not None and ms < cutoff_ms:
                    expired_parts[json.dumps(e["partition"], sort_keys=True)] = e[
                        "partition"
                    ]
                else:
                    kept.append(e)
            if not expired_parts:
                return []
            try:
                self._commit_manifest(
                    self.schema(), prev.snapshot_id + 1, "DROP_PARTITION", kept,
                    dv_index=prev.dv_index, bucket_index=prev.bucket_index,
                )
                return list(expired_parts.values())
            except CommitConflict:
                continue
        raise CommitConflict("gave up after 5 retries")

    def overwrite(self, df: DataFrame) -> Snapshot:
        """Replace the whole table contents in one atomic commit."""
        kind = "I" if self.is_primary_keyed else None
        b_name = None
        if self.is_primary_keyed and self.is_dynamic_bucket:
            # full replacement: assign against a FRESH index (the old
            # mapping only described the replaced contents)
            df, b_name = self._assign_dynamic_buckets(df, None)
        return self._commit_write(
            df, kind="OVERWRITE", row_kind=kind, replace=True, bucket_index=b_name
        )

    def overwrite_dynamic(self, df: DataFrame) -> Snapshot:
        """Dynamic partition overwrite (Paimon's ``dynamic-partition-overwrite``
        / Spark's ``partitionOverwriteMode=dynamic``): atomically replace ONLY
        the partitions present in `df`; untouched partitions keep their files.
        The backfill primitive at scale — rewriting one day of a date-
        partitioned 100 TB table commits O(that day), not O(table)."""
        if not self.schema().partition_keys:
            raise ValueError("dynamic overwrite requires a partitioned table")
        kind = "I" if self.is_primary_keyed else None
        b_name = None
        if self.is_primary_keyed and self.is_dynamic_bucket:
            # untouched partitions keep live rows, so keys keep buckets;
            # only genuinely new keys extend the index
            df, b_name = self._assign_dynamic_buckets(df, self.snapshot())
        return self._commit_write(
            df, kind="OVERWRITE", row_kind=kind, replace="dynamic",
            bucket_index=b_name,
        )

    # -- consumers: streaming-reader progress pins (Paimon consumer-id) ----

    def _consumer_path(self, name: str) -> str:
        return os.path.join(self.meta_path, "consumer", f"consumer-{name}.json")

    def register_consumer(self, name: str, next_snapshot: int | None = None) -> None:
        """Record that reader `name` still needs snapshots >= `next_snapshot`
        (default: the snapshot after the current one). ``expire_snapshots``
        keeps every snapshot any consumer has yet to read — so a lagging
        streaming reader never loses unread commits to retention (Paimon's
        ``consumer-id`` mechanism)."""
        if not name or "/" in name or "$" in name:
            raise ValueError(f"invalid consumer name {name!r}")
        if next_snapshot is None:
            cur = self.snapshot()
            next_snapshot = (cur.snapshot_id + 1) if cur else 1
        os.makedirs(os.path.join(self.meta_path, "consumer"), exist_ok=True)
        tmp = self._consumer_path(name) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"next_snapshot": int(next_snapshot),
                 "update_ms": int(time.time() * 1000)},
                fh,
            )
        os.replace(tmp, self._consumer_path(name))

    def drop_consumer(self, name: str) -> None:
        try:
            os.remove(self._consumer_path(name))
        except FileNotFoundError:
            raise ValueError(f"consumer {name!r} does not exist") from None

    def list_consumers(self) -> dict[str, int]:
        cdir = os.path.join(self.meta_path, "consumer")
        if not os.path.isdir(cdir):
            return {}
        out = {}
        for fn in sorted(os.listdir(cdir)):
            if fn.startswith("consumer-") and fn.endswith(".json"):
                with open(os.path.join(cdir, fn)) as fh:
                    out[fn[len("consumer-") : -len(".json")]] = json.load(fh)[
                        "next_snapshot"
                    ]
        return out

    def consumers_df(self) -> DataFrame:
        rows = [(k, v) for k, v in self.list_consumers().items()]
        return self.spark.createDataFrame(
            rows, "consumer_id string, next_snapshot bigint"
        )

    # -- changelog producer (Paimon changelog-producer=lookup): retraction
    #    streams with UPDATE_BEFORE/UPDATE_AFTER, paid at write time ---------

    def _produce_lookup_changelog(
        self, df: DataFrame, schema: TableSchema, deletes: bool
    ) -> str:
        """Materialize this commit's retraction changelog (see
        ``_lookup_changelog_rows`` for the semantics)."""
        clg, caches = self._lookup_changelog_rows(df, schema, deletes)
        return self._write_changelog(clg, caches)

    def _produce_rowkind_changelog(
        self, ins: DataFrame, dels: DataFrame, schema: TableSchema
    ) -> str:
        """Changelog for a mixed rowkind.field commit: the insert rows and
        tombstone rows of ONE atomic batch, resolved against the same base
        snapshot, written as a single changelog dataset (keys are disjoint
        — the caller resolved within-batch winners first)."""
        a, ca = self._lookup_changelog_rows(ins, schema, deletes=False)
        b, cb = self._lookup_changelog_rows(dels, schema, deletes=True)
        return self._write_changelog(a.unionByName(b), ca + cb)

    def _lookup_changelog_combining(
        self,
        df: DataFrame,
        schema: TableSchema,
        deletes: bool,
        base,
        engine: str,
    ) -> tuple[DataFrame, list[DataFrame]]:
        """Lookup changelog for the COMBINING merge engines
        (partial-update / aggregation): the post-image is the engine's
        merge of the key's full raw history PLUS the batch — pre-
        aggregated state cannot be combined directly (count is not
        associative over its own output), so the lookup re-merges the
        touched keys' change rows, the same O(touched keys) cost Paimon's
        lookup compaction pays for these engines."""
        pks = schema.primary_keys
        cols = schema.field_names()
        next_id = (base.snapshot_id + 1) if base else 1
        empty = (
            df.select(*[F.col(c) for c in cols if c in df.columns])
            .limit(0)
        )
        for c in cols:
            if c not in empty.columns:
                empty = empty.withColumn(c, F.lit(None).cast(_parse_type(
                    next(f["type"] for f in schema.fields if f["name"] == c))))
        empty = empty.select(*cols).withColumn(KIND_COL, F.lit("I"))
        if deletes:
            # these engines only accept deletes under ignore-delete=true,
            # where tombstones merge away — nothing changes, no changelog
            return empty, []
        batch = df.select(*cols).withColumn(
            SEQ_COL, F.lit(next_id).cast("long")
        ).withColumn(POS_COL, F.monotonically_increasing_id()).withColumn(
            KIND_COL, F.lit("I")
        )
        keys = df.select(*pks).distinct()
        if base is None:
            post = _merge_on_read(batch, schema)
            return post.select(*cols).withColumn(KIND_COL, F.lit("I")), []
        raw_old = (
            self.scan().to_df(merge=False)
            .join(F.broadcast(keys), pks, "inner")
            .select(*cols, SEQ_COL, POS_COL, KIND_COL)
        )
        old = _merge_on_read(raw_old, schema).cache()
        old.count()
        post = _merge_on_read(raw_old.unionByName(batch), schema)
        had = old.select(*pks).distinct()
        ub = old.select(*cols).withColumn(KIND_COL, F.lit("UB"))
        ua = (
            post.join(had, pks, "left_semi")
            .select(*cols)
            .withColumn(KIND_COL, F.lit("UA"))
        )
        ins = (
            post.join(had, pks, "left_anti")
            .select(*cols)
            .withColumn(KIND_COL, F.lit("I"))
        )
        return ub.unionByName(ua).unionByName(ins), [old]

    def _write_changelog(
        self, clg: DataFrame, caches: list[DataFrame]
    ) -> str:
        base = self.snapshot()
        next_id = (base.snapshot_id + 1) if base else 1
        clg = clg.withColumn(SEQ_COL, F.lit(next_id).cast("long"))
        name = f"clg-{next_id}-{uuid.uuid4().hex}"
        out = os.path.join(self.meta_path, "changelog", name)
        clg.write.mode("overwrite").parquet(out)
        for c in caches:
            c.unpersist()
        return name

    def _lookup_changelog_rows(
        self, df: DataFrame, schema: TableSchema, deletes: bool
    ) -> tuple[DataFrame, list[DataFrame]]:
        """This commit's retraction changelog rows: for each touched
        key, the pre-image (``UB`` = Paimon's -U, or ``D`` for deletes) and
        post-image (``UA`` = +U) — brand-new keys emit ``I``.

        Paimon's lookup producer does exactly this inside lookup
        compaction: pay one key-lookup join at write time so every
        downstream consumer gets a lossless retraction stream for free,
        instead of every consumer reconstructing old values itself. The
        lookup is a join of the (small) batch against the merged table —
        broadcast the batch keys, never the table.

        Returns (rows, cached-frames-to-unpersist-after-write).
        """
        engine = schema.options.get("merge-engine", "deduplicate")
        if engine not in (
            "deduplicate", "first-row", "partial-update", "aggregation"
        ):
            raise ValueError(
                f"changelog-producer=lookup does not support merge-engine "
                f"{engine!r}"
            )
        pks = schema.primary_keys
        cols = schema.field_names()
        seqf = _sequence_fields(schema)
        base = self.snapshot()
        caches: list[DataFrame] = []
        if engine in ("partial-update", "aggregation"):
            return self._lookup_changelog_combining(
                df, schema, deletes, base, engine
            )
        if seqf:
            # sequence.field rows may arrive pk-only (deletes): null-pad so
            # the ordering columns exist — a null sequence value loses.
            for c in cols:
                if c not in df.columns:
                    df = df.withColumn(c, F.lit(None).cast(_parse_type(
                        next(f["type"] for f in schema.fields if f["name"] == c))))
        # the post-commit value per key: last write wins for deduplicate
        # (largest sequence value first, under sequence.field), the
        # earliest for first-row (whose updates to existing keys are
        # no-ops — they emit no changelog at all, matching Paimon's
        # first-row changelog contract of insert-only streams)
        order = (
            [F.asc(POS_COL)]
            if engine == "first-row"
            else [F.desc_nulls_last(f) for f in seqf] + [F.desc(POS_COL)]
        )
        w = Window.partitionBy(*pks).orderBy(*order)
        newest = (
            df.withColumn(POS_COL, F.monotonically_increasing_id())
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", POS_COL)
        )
        if base is None:
            clg = newest.select(*cols).withColumn(KIND_COL, F.lit("I"))
            if deletes:  # delete against an empty table retracts nothing
                clg = clg.filter(F.lit(False))
        elif engine == "first-row":
            keys = newest.select(*pks).distinct()
            existing = self.to_df().join(F.broadcast(keys), pks, "inner")
            clg = (
                newest.join(existing.select(*pks), pks, "left_anti")
                .select(*cols)
                .withColumn(KIND_COL, F.lit("I"))
            )
            if deletes:  # first-row ignores deletes; nothing to retract
                clg = clg.filter(F.lit(False))
        else:
            keys = newest.select(*pks).distinct()
            old = self.to_df().join(F.broadcast(keys), pks, "inner").cache()
            old.count()  # pre-image used twice below; compute the merge once
            caches.append(old)
            if seqf:
                # The batch row only takes effect if it WINS the merge
                # against the stored row (ties go to the batch — input
                # order). A losing upsert/delete changes nothing and must
                # emit NO changelog.
                tagged = (
                    old.select(*cols).withColumn("__src", F.lit(0))
                    .unionByName(newest.select(*cols).withColumn("__src", F.lit(1)))
                )
                ww = Window.partitionBy(*pks).orderBy(
                    *[F.desc_nulls_last(f) for f in seqf], F.desc("__src")
                )
                winner = (
                    tagged.withColumn("__rn", F.row_number().over(ww))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                )
                batch_won = winner.filter(F.col("__src") == 1).drop("__src")
                if deletes:
                    clg = (
                        old.join(batch_won.select(*pks), pks, "left_semi")
                        .select(*cols)
                        .withColumn(KIND_COL, F.lit("D"))
                    )
                else:
                    had = old.select(*pks).distinct()
                    ub = (
                        old.join(batch_won.select(*pks), pks, "left_semi")
                        .select(*cols)
                        .withColumn(KIND_COL, F.lit("UB"))
                    )
                    ua = (
                        batch_won.join(had, pks, "left_semi")
                        .select(*cols)
                        .withColumn(KIND_COL, F.lit("UA"))
                    )
                    ins = (
                        batch_won.join(had, pks, "left_anti")
                        .select(*cols)
                        .withColumn(KIND_COL, F.lit("I"))
                    )
                    clg = ub.unionByName(ua).unionByName(ins)
            elif deletes:
                clg = old.select(*cols).withColumn(KIND_COL, F.lit("D"))
            else:
                ub = old.select(*cols).withColumn(KIND_COL, F.lit("UB"))
                marked = newest.join(
                    old.select(*pks).withColumn("__had", F.lit(1)).distinct(),
                    pks,
                    "left",
                )
                ua = (
                    marked.filter(F.col("__had").isNotNull())
                    .select(*cols)
                    .withColumn(KIND_COL, F.lit("UA"))
                )
                ins = (
                    marked.filter(F.col("__had").isNull())
                    .select(*cols)
                    .withColumn(KIND_COL, F.lit("I"))
                )
                clg = ub.unionByName(ua).unionByName(ins)
        return clg, caches

    def changelog_df(
        self, start_snapshot: int = 0, end_snapshot: int | None = None
    ) -> DataFrame:
        """The retraction changelog committed AFTER `start_snapshot` up to
        and including `end_snapshot` (Paimon's ``incremental-between-scan-
        mode = changelog``). Requires ``changelog-producer = lookup``;
        rows carry ``__row_kind`` ∈ {I, UB, UA, D} (Paimon's +I/-U/+U/-D)
        and ``__seq`` = committing snapshot, so consumers can apply
        retractions in order."""
        if self.schema().options.get("changelog-producer") != "lookup":
            raise ValueError(
                "changelog_df requires table option changelog-producer=lookup"
            )
        end = (
            end_snapshot
            if end_snapshot is not None
            else (self.snapshot().snapshot_id if self.snapshot() else 0)
        )
        names = []
        for sid in self.snapshot_ids():
            if start_snapshot < sid <= end:
                snap = self.snapshot(sid)
                if snap.changelog:
                    names.append(snap.changelog)
        schema = self.schema()
        out = None
        for name in names:
            part = self.spark.read.parquet(
                os.path.join(self.meta_path, "changelog", name)
            )
            out = part if out is None else out.unionByName(
                part, allowMissingColumns=True
            )
        if out is None:
            fields = [
                T.StructField(f["name"], _parse_type(f["type"]), True)
                for f in schema.fields
            ] + [
                T.StructField(KIND_COL, T.StringType(), True),
                T.StructField(SEQ_COL, T.LongType(), True),
            ]
            return self.spark.createDataFrame([], T.StructType(fields))
        # project to the current schema (changelog files keep their writer
        # schema; added columns null-pad by name)
        cols = [
            (
                F.col(f["name"]).cast(_parse_type(f["type"]))
                if f["name"] in out.columns
                else F.lit(None).cast(_parse_type(f["type"]))
            ).alias(f["name"])
            for f in schema.fields
        ]
        return out.select(*cols, F.col(KIND_COL), F.col(SEQ_COL))

    def ro_df(self) -> DataFrame:
        """Read-optimized read (Paimon's ``$ro`` system table): serve the
        state as of the most recent full-rewrite snapshot (COMPACT /
        OVERWRITE / TRUNCATE), whose files are already collapsed — so the
        read is a plain append-style scan with ZERO merge cost, trading
        freshness (commits since that snapshot are invisible) for
        throughput. The interactive-dashboard pattern at 100 TB: frequent
        compaction keeps staleness bounded while every read skips the
        key-window entirely.
        """
        if not self.is_primary_keyed:
            return self.to_df()
        pin = None
        for sid in reversed(self.snapshot_ids()):
            if self.snapshot(sid).commit_kind in (
                "COMPACT", "OVERWRITE", "TRUNCATE",
            ):
                pin = sid
                break
        schema = self.schema()
        if pin is None:  # never compacted: nothing is read-optimized yet
            fields = [
                T.StructField(f["name"], _parse_type(f["type"]), True)
                for f in schema.fields
            ]
            return self.spark.createDataFrame([], T.StructType(fields))
        df = self.scan(snapshot_id=pin).to_df(merge=False)
        if KIND_COL in df.columns:
            df = df.filter(F.col(KIND_COL) != "D").drop(*SYS_COLS)
        return df

    # -- statistics: ANALYZE TABLE + $statistics (Paimon's statistics file
    #    and system table; the reference imports the engine's statistics
    #    SPI but leaves it unwired, PrestoMetadata.java:50) -----------------

    def _stats_path(self, snapshot_id: int) -> str:
        return os.path.join(
            self.meta_path, "statistics", f"stats-{snapshot_id}.json"
        )

    def analyze(
        self,
        columns: list[str] | None = None,
        histogram_bins: int = 0,
    ) -> dict:
        """ANALYZE TABLE: one distributed pass over the merged table
        computing per-column null count, approximate NDV, min/max and avg
        length, stored against the current snapshot and surfaced via
        ``$statistics``.

        ``histogram_bins`` > 0 additionally records an equi-depth
        histogram (the ``histogram_bins - 1`` interior quantiles) for
        each NUMERIC analyzed column — what a cost model needs to
        estimate range-predicate selectivity on skewed data, where
        min/max alone is off by orders of magnitude.

        Scale shape: every statistic is an algebraic/sketch aggregate
        (count, min, max, HLL, and the histogram's KLL/GK quantile
        sketch), so the whole ANALYZE is ONE map-side-partial
        aggregation — no shuffle of data rows, no second pass, constant
        memory per column. At 100 TB this is the only viable shape;
        anything exact-NDV would shuffle the world. A cost-based planner
        (or an operator picking a broadcast side) reads these numbers
        instead of guessing.
        """
        snap = self.snapshot()
        if snap is None:
            raise ValueError("table has no snapshots")
        schema = self.schema()
        names = [f["name"] for f in schema.fields]
        if columns is not None:
            unknown = set(columns) - set(names)
            if unknown:
                raise ValueError(f"unknown columns {sorted(unknown)}")
            names = [n for n in names if n in columns]
        df = self.to_df()
        numeric = {
            f["name"] for f in schema.fields if _is_numeric_type(f["type"])
        }
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for i, c in enumerate(names):
            aggs += [
                F.sum(F.col(c).isNull().cast("long")).alias(f"__st{i}_nulls"),
                # NDV over the string form: identical for atomic types and
                # keeps map/array columns analyzable (maps aren't hashable)
                F.approx_count_distinct(F.col(c).cast("string")).alias(
                    f"__st{i}_ndv"
                ),
                F.min(F.col(c).cast("string")).alias(f"__st{i}_min"),
                F.max(F.col(c).cast("string")).alias(f"__st{i}_max"),
                F.avg(F.length(F.col(c).cast("string"))).alias(f"__st{i}_len"),
            ]
            # bins >= 2 only: percentile_approx([]) returns NULL, not [],
            # so a 1-bin histogram (zero interior quantiles) is recorded
            # as [] below without running the aggregate
            if histogram_bins >= 2 and c in numeric:
                qs = [j / histogram_bins for j in range(1, histogram_bins)]
                aggs.append(
                    F.percentile_approx(
                        F.col(c).cast("double"), qs, 10000
                    ).alias(f"__st{i}_hist")
                )
        row = df.agg(*aggs).collect()[0]
        stats = {
            "snapshot_id": snap.snapshot_id,
            "schema_id": snap.schema_id,
            "total_rows": row["__rows"],
            "analyze_ms": int(time.time() * 1000),
            "columns": {
                c: {
                    "null_count": row[f"__st{i}_nulls"],
                    "distinct_count": row[f"__st{i}_ndv"],
                    "min": row[f"__st{i}_min"],
                    "max": row[f"__st{i}_max"],
                    "avg_len": row[f"__st{i}_len"],
                    **(
                        {"histogram": row[f"__st{i}_hist"]}
                        if f"__st{i}_hist" in row.asDict()
                        else {"histogram": []}
                        if histogram_bins == 1 and c in numeric
                        else {}
                    ),
                }
                for i, c in enumerate(names)
            },
        }
        os.makedirs(os.path.join(self.meta_path, "statistics"), exist_ok=True)
        tmp = self._stats_path(snap.snapshot_id) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(stats, fh, indent=2)
        os.replace(tmp, self._stats_path(snap.snapshot_id))
        return stats

    def latest_statistics(self) -> dict | None:
        """The most recent ANALYZE result at or before the current
        snapshot (Paimon reads stats the same way: newest not-newer than
        the scanned snapshot)."""
        sdir = os.path.join(self.meta_path, "statistics")
        if not os.path.isdir(sdir):
            return None
        cur = self.snapshot()
        best = None
        for fn in os.listdir(sdir):
            if fn.startswith("stats-") and fn.endswith(".json"):
                sid = int(fn[len("stats-"):-len(".json")])
                if cur is None or sid <= cur.snapshot_id:
                    if best is None or sid > best:
                        best = sid
        if best is None:
            return None
        with open(self._stats_path(best)) as fh:
            return json.load(fh)

    def statistics_df(self) -> DataFrame:
        """``$statistics``: one row per analyzed column of the freshest
        applicable ANALYZE run."""
        st = self.latest_statistics()
        schema = (
            "snapshot_id bigint, schema_id bigint, total_rows bigint, "
            "column_name string, null_count bigint, distinct_count bigint, "
            "min string, max string, avg_len double, histogram array<double>"
        )
        if st is None:
            return self.spark.createDataFrame([], schema)
        rows = [
            (
                st["snapshot_id"], st["schema_id"], st["total_rows"],
                c, v["null_count"], v["distinct_count"],
                v["min"], v["max"], v["avg_len"], v.get("histogram"),
            )
            for c, v in sorted(st["columns"].items())
        ]
        return self.spark.createDataFrame(rows, schema)

    # -- branches: writable metadata forks sharing data files (Paimon
    #    branch feature; metadata-only cost) --------------------------------

    def _branch_dir(self, name: str) -> str:
        return os.path.join(self.path, "branch", f"branch-{name}")

    def create_branch(
        self,
        name: str,
        from_snapshot: int | None = None,
        from_tag: str | None = None,
    ) -> "Table":
        """Fork a writable branch at a snapshot (default latest) or a tag.

        The branch copies metadata only — schema versions, the fork
        snapshot, and its manifest; every data file is shared with main.
        Writes/DDL on the branch never touch main's lineage; merge back
        with ``fast_forward``."""
        if self.branch_name is not None:
            raise ValueError("branches fork from main, not from other branches")
        if not name or "/" in name or "$" in name:
            raise ValueError(f"invalid branch name {name!r}")
        snap = (
            self.tag_snapshot(from_tag)
            if from_tag is not None
            else self.snapshot(from_snapshot)
        )
        if snap is None:
            raise ValueError("table has no snapshots")
        bdir = self._branch_dir(name)
        if os.path.isdir(bdir):
            raise ValueError(f"branch {name!r} already exists")
        sdir = os.path.join(self.meta_path, "schema")
        os.makedirs(os.path.join(bdir, "schema"))
        os.makedirs(os.path.join(bdir, "snapshot"))
        os.makedirs(os.path.join(bdir, "manifest"))
        for fn in os.listdir(sdir):  # all schema versions (files reference them)
            _copyfile(os.path.join(sdir, fn), os.path.join(bdir, "schema", fn))
        with open(
            os.path.join(bdir, "snapshot", f"snapshot-{snap.snapshot_id}.json"), "w"
        ) as fh:
            json.dump(snap.to_json(), fh)
        with open(os.path.join(bdir, "snapshot", "LATEST"), "w") as fh:
            fh.write(str(snap.snapshot_id))
        for m in self._manifest_members(snap):
            _copyfile(
                os.path.join(self.meta_path, "manifest", m),
                os.path.join(bdir, "manifest", m),
            )
        with open(os.path.join(bdir, "branch.json"), "w") as fh:
            json.dump(
                {"fork_snapshot": snap.snapshot_id,
                 "create_ms": int(time.time() * 1000)},
                fh,
            )
        return Table(self.spark, self.path, branch=name)

    def branch(self, name: str) -> "Table":
        if not os.path.isdir(self._branch_dir(name)):
            raise ValueError(f"branch {name!r} does not exist")
        return Table(self.spark, self.path, branch=name)

    def list_branches(self) -> list[str]:
        bdir = os.path.join(self.path, "branch")
        if not os.path.isdir(bdir):
            return []
        return sorted(
            d[len("branch-"):] for d in os.listdir(bdir) if d.startswith("branch-")
        )

    def delete_branch(self, name: str) -> None:
        """Drop a branch's metadata. Data files only it referenced become
        orphans (not reclaimed here — same as Paimon, which ships a
        separate orphan-file cleanup)."""
        bdir = self._branch_dir(name)
        if not os.path.isdir(bdir):
            raise ValueError(f"branch {name!r} does not exist")
        _rmtree_quiet(bdir)

    def branches_df(self) -> DataFrame:
        rows = []
        for name in self.list_branches():
            with open(os.path.join(self._branch_dir(name), "branch.json")) as fh:
                d = json.load(fh)
            b = self.branch(name)
            latest = b.snapshot()
            rows.append(
                (name, d["fork_snapshot"],
                 latest.snapshot_id if latest else None, d.get("create_ms"))
            )
        return self.spark.createDataFrame(
            rows,
            "branch_name string, fork_snapshot bigint, latest_snapshot bigint, "
            "create_ms bigint",
        )

    def fast_forward(self, name: str) -> Snapshot:
        """Merge a branch back: copy its post-fork snapshots/manifests/schemas
        into main. Requires main to still be AT the fork point (no divergent
        commits) — the metadata twin of a git fast-forward."""
        if self.branch_name is not None:
            raise ValueError("fast_forward applies to the main lineage")
        b = self.branch(name)
        with open(os.path.join(self._branch_dir(name), "branch.json")) as fh:
            fork = json.load(fh)["fork_snapshot"]
        cur = self.snapshot()
        if cur is None or cur.snapshot_id != fork:
            raise CommitConflict(
                f"main diverged from branch {name!r} (main at "
                f"{cur.snapshot_id if cur else None}, fork at {fork})"
            )
        new_ids = [sid for sid in b.snapshot_ids() if sid > fork]
        # schemas the branch added
        for fn in os.listdir(os.path.join(b.meta_path, "schema")):
            dst = os.path.join(self.meta_path, "schema", fn)
            if not os.path.exists(dst):
                _copyfile(os.path.join(b.meta_path, "schema", fn), dst)
        last = cur
        for sid in new_ids:
            snap = b.snapshot(sid)
            for m in b._manifest_members(snap):
                dst = os.path.join(self.meta_path, "manifest", m)
                if not os.path.exists(dst):
                    _copyfile(os.path.join(b.meta_path, "manifest", m), dst)
            spath = os.path.join(self.meta_path, "snapshot", f"snapshot-{sid}.json")
            try:
                fd = os.open(spath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError as exc:  # concurrent main commit raced us
                raise CommitConflict(str(exc)) from exc
            with os.fdopen(fd, "w") as fh:
                json.dump(snap.to_json(), fh)
            last = snap
        tmp = os.path.join(self.meta_path, "snapshot", f".LATEST.{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(str(last.snapshot_id))
        os.replace(tmp, os.path.join(self.meta_path, "snapshot", "LATEST"))
        return last

    def expire_snapshots(self, keep_last: int = 10) -> list[int]:
        """Drop snapshots older than the newest `keep_last`, deleting data
        files no surviving snapshot references (the standard lakehouse
        retention op — bounds metadata growth and reclaims storage from
        compaction/overwrite churn). Time travel remains valid for every
        kept snapshot; expired ids raise on access. Returns expired ids.
        """
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        ids = self.snapshot_ids()
        expired = ids[:-keep_last]
        # Consumers pin every snapshot they have yet to read: a consumer at
        # next_snapshot=N needs N and everything after it. A consumer not
        # updated within ``consumer.expiration-time`` is dropped first
        # (Paimon's stale-consumer expiry) — a crashed reader must not pin
        # retention forever.
        ttl = self.schema().options.get("consumer.expiration-time")
        if ttl is not None:
            cutoff = int(time.time() * 1000) - _parse_duration_ms(ttl)
            for name in list(self.list_consumers()):
                with open(self._consumer_path(name)) as fh:
                    if json.load(fh).get("update_ms", 0) < cutoff:
                        self.drop_consumer(name)
        consumers = self.list_consumers()
        if consumers:
            floor = min(consumers.values())
            expired = [i for i in expired if i < floor]
        if not expired:
            return []
        kept = [i for i in ids if i not in set(expired)]
        live_files = set()
        live_manifests = set()
        live_dv = set()
        # Tagged snapshots stay readable after expiry (the tag file carries
        # the snapshot payload), so their manifests and data files are live.
        live_snaps = [self.snapshot(sid) for sid in kept] + [
            self.tag_snapshot(name) for name in self.list_tags()
        ]
        for snap in live_snaps:
            live_manifests.update(self._manifest_members(snap))
            if snap.dv_index:
                live_dv.add(snap.dv_index)
            if snap.bucket_index:
                live_dv.add(snap.bucket_index)
            for e in self.manifest_entries(snap):
                live_files.add(e["path"])
        # Data files are shared across lineages: anything ANY other branch
        # (or main, when expiring on a branch) references stays live. Their
        # manifests/snapshots live in their own directories and are untouched.
        main = Table(self.spark, self.path)
        others = [main] if self.branch_name is not None else []
        others += [
            main.branch(n)
            for n in main.list_branches()
            if n != self.branch_name
        ]
        for t in others:
            for snap in (
                [t.snapshot(sid) for sid in t.snapshot_ids()]
                + [t.tag_snapshot(nm) for nm in t.list_tags()]
            ):
                if snap.dv_index:
                    live_dv.add(snap.dv_index)
                if snap.bucket_index:
                    live_dv.add(snap.bucket_index)
                for e in t.manifest_entries(snap):
                    live_files.add(e["path"])
        dead_files = set()
        dead_manifests = set()
        dead_dv = set()
        for sid in expired:
            snap = self.snapshot(sid)
            dead_manifests.update(self._manifest_members(snap))
            if snap.dv_index and snap.dv_index not in live_dv:
                dead_dv.add(snap.dv_index)
            if snap.bucket_index and snap.bucket_index not in live_dv:
                dead_dv.add(snap.bucket_index)
            for e in self.manifest_entries(snap):
                if e["path"] not in live_files:
                    dead_files.add(e["path"])
        for rel in dead_files:
            try:
                os.remove(os.path.join(self.path, rel))
            except FileNotFoundError:
                pass
        for m in dead_manifests - live_manifests:
            try:
                os.remove(os.path.join(self.meta_path, "manifest", m))
            except FileNotFoundError:
                pass
        for dv in dead_dv:
            _rmtree_quiet(os.path.join(self._dv_root(), dv))
        for sid in expired:
            snap = self.snapshot(sid)
            if snap.changelog:
                _rmtree_quiet(
                    os.path.join(self.meta_path, "changelog", snap.changelog)
                )
            os.remove(os.path.join(self.meta_path, "snapshot", f"snapshot-{sid}.json"))
        return expired

    def truncate(self) -> Snapshot:
        """TRUNCATE TABLE: one atomic commit with an empty manifest.
        History stays time-travelable until ``expire_snapshots``; storage
        is reclaimed then, not now — O(1) regardless of table size."""
        if self.snapshot() is None:
            raise ValueError("table has no snapshots")
        schema = self.schema()
        for _attempt in range(5):
            prev = self.snapshot()
            next_id = (prev.snapshot_id + 1) if prev else 1
            try:
                return self._commit_manifest(schema, next_id, "TRUNCATE", [])
            except CommitConflict:
                continue
        raise CommitConflict("gave up after 5 retries")

    def rollback_to(self, snapshot_id: int) -> None:
        """Roll the table back to `snapshot_id`: snapshots after it are
        deleted (Paimon's ``rollback_to`` procedure). Metadata-only —
        data files written by rolled-back commits become orphans and are
        reclaimed by ``remove_orphan_files``, so rollback is O(#snapshots)
        regardless of data size.

        Bookkeeping that referenced the rolled-back range is reconciled
        the way Paimon's RollbackHelper does: tags pinned to deleted
        snapshots are dropped; consumer positions past the new head are
        clamped to it (their unread commits no longer exist).
        """
        ids = self.snapshot_ids()
        if snapshot_id not in ids:
            raise ValueError(f"snapshot {snapshot_id} does not exist (have {ids})")
        doomed = [i for i in ids if i > snapshot_id]
        for name in self.list_tags():
            if self.tag_snapshot(name).snapshot_id > snapshot_id:
                self.delete_tag(name)
        for name, nxt in self.list_consumers().items():
            if nxt > snapshot_id + 1:
                self.register_consumer(name, snapshot_id + 1)
        for sid in doomed:
            snap = self.snapshot(sid)
            if snap.changelog:
                _rmtree_quiet(
                    os.path.join(self.meta_path, "changelog", snap.changelog)
                )
            os.remove(
                os.path.join(self.meta_path, "snapshot", f"snapshot-{sid}.json")
            )
            try:
                os.remove(self._stats_path(sid))
            except FileNotFoundError:
                pass
        tmp = os.path.join(self.meta_path, "snapshot", f".LATEST.{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(str(snapshot_id))
        os.replace(tmp, os.path.join(self.meta_path, "snapshot", "LATEST"))

    def incremental_between_timestamps(
        self, start_ms: int, end_ms: int | None = None
    ) -> DataFrame:
        """Paimon's ``incremental-between-timestamp`` scan mode: the change
        rows of every commit AFTER the last snapshot at-or-before
        `start_ms` up to the last snapshot at-or-before `end_ms` (default
        now). Resolves both bounds to snapshot ids against commit
        timestamps, then delegates to ``incremental_df`` — wall-clock
        bounds are what schedulers have ("what changed since last night's
        run") when no one recorded snapshot ids."""
        def at_or_before(ms: int) -> int:
            try:
                return self.snapshot_as_of(ms).snapshot_id
            except ValueError:
                return 0  # bound precedes all history

        start = at_or_before(start_ms)
        end = (
            at_or_before(end_ms)
            if end_ms is not None
            else (self.snapshot().snapshot_id if self.snapshot() else 0)
        )
        return self.incremental_df(start, max(start, end))

    def incremental_df(
        self,
        start_snapshot: int | str,
        end_snapshot: int | str | None = None,
    ) -> DataFrame:
        """Batch-CDC read: the change rows committed AFTER `start_snapshot`
        up to and including `end_snapshot` (default: latest) — Paimon's
        ``incremental-between`` scan mode. Either bound may be a TAG name
        (Paimon's incremental-between-tags): "the changes between release
        tags" is the reproducible-diff question a corpus pipeline asks.

        Walks the commits in the range and unions each commit's NEW files
        (manifest diff against its parent), skipping COMPACT commits —
        rewrites are not new data, so incremental consumers never see a
        compaction re-emit the table. Deletion-vector tables additionally
        re-read the positions each commit marked deleted and emit them as
        '-D' rows (positions are exact row identities, so the CDC stream
        stays lossless without tombstone rows in the data files). Primary-
        key tables yield audit-log style rows (leading ``rowkind``
        '+I'/'-D'); append tables without DVs yield plain rows. Cost is
        O(files + positions changed in range), never a full scan.
        """
        if isinstance(start_snapshot, str):
            start_snapshot = self.tag_snapshot(start_snapshot).snapshot_id
        if isinstance(end_snapshot, str):
            end_snapshot = self.tag_snapshot(end_snapshot).snapshot_id
        end = (
            end_snapshot
            if end_snapshot is not None
            else (self.snapshot().snapshot_id if self.snapshot() else 0)
        )
        if start_snapshot > end:
            raise ValueError(f"start {start_snapshot} > end {end}")
        ids = [i for i in self.snapshot_ids() if start_snapshot < i <= end]
        new_entries: list[dict] = []
        dv_added: list[DataFrame] = []  # (path,pos) marked deleted in range
        path_entry: dict[str, dict] = {}  # any manifest entry per file path
        def resolve(sid: int) -> Snapshot | None:
            """A snapshot by id, or — after expiry — any TAG pinning it
            (the tag file carries the full payload, so tag-bounded
            incremental reads keep working once history is expired)."""
            if sid in self.snapshot_ids():
                return self.snapshot(sid)
            for name in self.list_tags():
                pinned = self.tag_snapshot(name)
                if pinned.snapshot_id == sid:
                    return pinned
            return None

        prev_paths: set[str] | None = None
        prev_dv: str | None = None
        start_resolved = resolve(start_snapshot) if ids else None
        if start_resolved is not None:
            prev_dv = start_resolved.dv_index
        for sid in ids:
            snap = self.snapshot(sid)
            cur = self.manifest_entries(snap)
            for e in cur:
                path_entry.setdefault(e["path"], e)
            if snap.commit_kind != "COMPACT":
                if prev_paths is None:
                    parent = resolve(sid - 1)
                    prev_paths = (
                        {e["path"] for e in self.manifest_entries(parent)}
                        if parent is not None
                        else set()
                    )
                new_entries += [e for e in cur if e["path"] not in prev_paths]
                if snap.dv_index and snap.dv_index != prev_dv:
                    step = self.dv_df(snap)
                    if prev_dv:
                        step = step.exceptAll(
                            self.spark.read.parquet(
                                os.path.join(self._dv_root(), prev_dv)
                            )
                        )
                    dv_added.append(step)
            prev_paths = {e["path"] for e in cur}
            prev_dv = snap.dv_index
        schema = self.schema()
        spark = self.spark
        # stable output schema per table: DV-enabled append tables always
        # get a rowkind column (any range may contain position deletes)
        emit_kind = (
            self.is_primary_keyed
            or schema.options.get("deletion-vectors.enabled") == "true"
        )

        def _read_group(entries: list[dict], extra=()) -> DataFrame | None:
            by_schema: dict[int, list[str]] = {}
            for e in entries:
                by_schema.setdefault(e["schema_id"], []).append(
                    os.path.join(self.path, e["path"])
                )
            parts = []
            for wsid, files in sorted(by_schema.items()):
                writer_schema = self.schema(wsid)
                fmt = writer_schema.options.get("file.format", "parquet")
                df = _read_data_files(spark, fmt, files)
                if extra:
                    pcol, poscol = self._file_pos_cols()
                    df = df.select("*", pcol, poscol)
                parts.append(
                    _project_to(df, writer_schema, schema, self.is_primary_keyed,
                                extra=extra)
                )
            if not parts:
                return None
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
            return df

        data_names = schema.field_names()
        out = None
        inserts = _read_group(new_entries)
        if inserts is not None:
            if KIND_COL in inserts.columns:
                kind = F.concat(
                    F.when(F.col(KIND_COL) == "D", F.lit("-")).otherwise(F.lit("+")),
                    F.col(KIND_COL),
                )
                out = inserts.select(kind.alias("rowkind"), *data_names)
            elif emit_kind:
                out = inserts.select(F.lit("+I").alias("rowkind"), *data_names)
            else:
                out = inserts
        if dv_added:
            added = dv_added[0]
            for d in dv_added[1:]:
                added = added.unionByName(d)
            added = added.distinct()
            # rows a DV commit deleted still exist in their (immutable)
            # files — re-read exactly those positions for the -D payload
            paths = [r["path"] for r in added.select("path").distinct().collect()]
            touched = _read_group([path_entry[p] for p in paths if p in path_entry],
                                  extra=[DV_PATH_COL, DV_POS_COL])
            if touched is not None:
                deletes = (
                    touched.join(
                        F.broadcast(added),
                        on=(touched[DV_PATH_COL] == added["path"])
                        & (touched[DV_POS_COL] == added["pos"]),
                        how="left_semi",
                    )
                    .select(F.lit("-D").alias("rowkind"), *data_names)
                )
                out = deletes if out is None else out.unionByName(deletes)
        if out is None:
            base = schema.spark_schema()
            if emit_kind:
                base = T.StructType(
                    [T.StructField("rowkind", T.StringType(), False)] + list(base)
                )
            return spark.createDataFrame([], base)
        return out

    def rescale_bucket(self, num_buckets: int) -> Snapshot:
        """Change a primary-key table's bucket count (Paimon's offline
        bucket-rescale action): writes a new schema version with the new
        ``bucket`` option, then compacts so every data file lands in its
        new bucket. One full rewrite — the explicit cost of re-hashing; all
        snapshots before the rescale keep reading under their old layout.
        Undersized buckets are THE write-amplification trap at 100 TB
        (every upsert rewrites a bucket's worth of data), so rescaling must
        be cheap to reach for."""
        if num_buckets < 1:
            raise ValueError("num_buckets must be >= 1")
        if not self.is_primary_keyed:
            raise ValueError("bucket rescale applies to primary-key tables")
        if self.is_dynamic_bucket:
            raise ValueError(
                "dynamic-bucket tables (bucket=-1) grow buckets automatically; "
                "rescale applies to fixed-bucket tables"
            )
        s = self.schema()
        if s.num_buckets == num_buckets:
            return self.snapshot()
        s.options = dict(s.options, bucket=str(num_buckets))
        s.schema_id += 1
        spath = self._schema_path(s.schema_id)
        if os.path.exists(spath):
            raise CommitConflict(f"concurrent schema change on {self.path}")
        with open(spath, "w") as fh:
            json.dump(s.to_json(), fh, indent=2)
        return self.compact()

    def remove_orphan_files(self, older_than_ms: int | None = None) -> list[str]:
        """Delete data files no lineage references (Paimon's
        remove-orphan-files action): files stranded by deleted branches,
        crashed writers, or interrupted commits.

        `older_than_ms` (epoch millis) guards in-flight writers: only files
        modified before it are candidates (default: one hour ago). Scans
        every snapshot and tag of every lineage — O(metadata), one listdir
        walk over data/. Returns the deleted paths (table-relative)."""
        if older_than_ms is None:
            older_than_ms = int((time.time() - 3600) * 1000)
        main = Table(self.spark, self.path)
        lineages = [main] + [main.branch(n) for n in main.list_branches()]
        live = set()
        live_dv = set()
        for t in lineages:
            snaps = [t.snapshot(sid) for sid in t.snapshot_ids()] + [
                t.tag_snapshot(nm) for nm in t.list_tags()
            ]
            for snap in snaps:
                if snap.dv_index:
                    live_dv.add(snap.dv_index)
                if snap.bucket_index:
                    live_dv.add(snap.bucket_index)
                for e in t.manifest_entries(snap):
                    live.add(e["path"])
        data_dir = os.path.join(self.path, "data")
        removed = []
        for root, _dirs, files in os.walk(data_dir):
            for fn in files:
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, self.path)
                if rel in live:
                    continue
                if os.path.getmtime(full) * 1000 >= older_than_ms:
                    continue  # too fresh — may belong to an in-flight commit
                os.remove(full)
                removed.append(rel)
        # deletion-vector index datasets no snapshot of any lineage points at
        dv_root = self._dv_root()
        if os.path.isdir(dv_root):
            for name in os.listdir(dv_root):
                full = os.path.join(dv_root, name)
                if name in live_dv:
                    continue
                if os.path.getmtime(full) * 1000 >= older_than_ms:
                    continue
                _rmtree_quiet(full)
                removed.append(os.path.relpath(full, self.path))
        # staging dirs abandoned by crashed writers (a completed commit
        # removes its staging dir; anything old enough here is dead weight)
        staging_root = os.path.join(self.path, "staging")
        if os.path.isdir(staging_root):
            for name in os.listdir(staging_root):
                full = os.path.join(staging_root, name)
                if os.path.getmtime(full) * 1000 >= older_than_ms:
                    continue
                _rmtree_quiet(full)
                removed.append(os.path.relpath(full, self.path))
        # DataSource writers stage under .staging-ds-* at the table root
        for name in os.listdir(self.path):
            if name.startswith(".staging-ds-"):
                full = os.path.join(self.path, name)
                if os.path.getmtime(full) * 1000 >= older_than_ms:
                    continue
                _rmtree_quiet(full)
                removed.append(name)
        return sorted(removed)

    def _commit_meta(
        self, kind: str, entries: list[dict], dv_index: str | None,
        expect: int | None = None, changelog: str | None = None,
    ) -> Snapshot:
        """Metadata-only commit (no new data files) — DV deletes. `expect`
        guards against committing positions computed on a stale snapshot:
        a concurrent commit means the positions may be wrong, so conflict
        instead of stacking."""
        schema = self.schema()
        prev = self.snapshot()
        cur = prev.snapshot_id if prev else 0
        if expect is not None and cur != expect:
            raise CommitConflict(
                f"deletion-vector commit computed against snapshot {expect}, "
                f"but latest is now {cur} — recompute and retry"
            )
        return self._commit_manifest(
            schema, cur + 1, kind, entries, dv_index=dv_index,
            bucket_index=prev.bucket_index if prev else None,
            changelog=changelog,
        )

    def _commit_write(
        self,
        df: DataFrame,
        kind: str,
        row_kind: str | Column | None,
        replace: bool | str = False,
        dv_index: str | None = None,
        bucket_index: str | None = None,
        expect: int | None = None,
        changelog: str | None = None,
        commit_identifier: int | None = None,
    ) -> Snapshot:
        """`replace`: False stacks on the previous manifest, True replaces it
        entirely, "dynamic" replaces only the partitions the new files touch.

        `dv_index` attaches a deletion-vector index to the new snapshot;
        when absent and not replacing, the previous snapshot's index is
        carried forward (old files keep their deletions). A full replace
        rewrites from the merged state, so the index resets.
        `bucket_index` likewise attaches a dynamic-bucket key index; when
        absent it ALWAYS carries forward (bucket assignments outlive any
        rewrite — a key's bucket never changes). `expect` conflicts if the
        latest snapshot moved past it (DV/bucket commits compute state
        against a specific snapshot and cannot be re-stacked)."""
        schema = self.schema()
        expected = schema.field_names()
        missing = [c for c in expected if c.lower() not in {x.lower() for x in df.columns}]
        if missing:
            raise ValueError(f"input is missing columns {missing}")
        # case-insensitive resolution, declared order + declared types;
        # a pre-assigned dynamic-bucket column (and a per-row kind column
        # for mixed CDC batches, dropped after stamping) rides along
        by_lower = {c.lower(): c for c in df.columns}
        passthrough = [
            F.col(c) for c in ("__bucket", "__rk") if c in df.columns
        ]

        def _conform(col, ddl: str):
            # COMPACT rewrites re-write rows already IN the table; bound
            # enforcement there would brick compaction of legacy/foreign
            # over-length data that reads deliberately tolerate
            # (test_preexisting_overlength_varchar_stays_readable). Only
            # genuinely new rows (append/upsert/delete) hit the ANSI error.
            col = _apply_char_padding(col, ddl)
            return col if kind == "COMPACT" else _apply_varchar_bound(col, ddl)

        df = df.select(
            *[
                _conform(
                    F.col(by_lower[f["name"].lower()]).cast(_parse_type(f["type"])),
                    f["type"],
                ).alias(f["name"])
                for f in schema.fields
            ],
            *passthrough,
        )

        prev = self.snapshot()
        next_id = (prev.snapshot_id + 1) if prev else 1
        staging = os.path.join(self.path, "staging", uuid.uuid4().hex)
        # compaction rewrites carry a distinct name prefix so streaming
        # changelog readers (file-glob based) never re-consume a rewrite
        new_entries = self._write_data_files(
            df, schema, next_id, row_kind, staging,
            prefix="cpt" if kind == "COMPACT" else "data",
        )
        # Data files are written once; only the metadata commit retries. A
        # conflict means another writer claimed our snapshot id — re-read the
        # new latest manifest and stack our entries on top of it.
        touched = {json.dumps(e["partition"], sort_keys=True) for e in new_entries}
        for _attempt in range(5):
            prev = self.snapshot()
            next_id = (prev.snapshot_id + 1) if prev else 1
            if expect is not None and (prev.snapshot_id if prev else 0) != expect:
                raise CommitConflict(
                    f"deletion-vector commit computed against snapshot {expect}, "
                    f"but latest is now {prev.snapshot_id if prev else 0}"
                )
            dv = dv_index
            if dv is None and replace is not True and prev is not None:
                dv = prev.dv_index  # carry existing deletions forward
            bidx = bucket_index
            if bidx is None and prev is not None:
                bidx = prev.bucket_index  # assignments survive any rewrite
            if prev is None or replace is True:
                base = []
            elif replace == "dynamic":
                base = [
                    e
                    for e in self.manifest_entries(prev)
                    if json.dumps(e["partition"], sort_keys=True) not in touched
                ]
            else:
                base = self.manifest_entries(prev)
            try:
                return self._commit_manifest(
                    schema, next_id, kind, base + new_entries, dv_index=dv,
                    bucket_index=bidx, changelog=changelog,
                    commit_identifier=commit_identifier,
                )
            except CommitConflict:
                if expect is not None:
                    raise
                continue
        raise CommitConflict("gave up after 5 retries")

    def _write_data_files(
        self,
        df: DataFrame,
        schema: TableSchema,
        snapshot_id: int,
        row_kind: str | Column | None,
        staging: str,
        prefix: str = "data",
    ) -> list[dict]:
        import pyarrow.parquet as pq

        part_cols = schema.partition_keys
        out = df
        if row_kind is not None:
            # __pos disambiguates rows of the same key within one commit.
            # row_kind may be a per-row Column (rowkind.field CDC commits
            # mixing I and D in one atomic snapshot) or a constant.
            kind = F.lit(row_kind) if isinstance(row_kind, str) else row_kind
            out = (
                out.withColumn(SEQ_COL, F.lit(snapshot_id).cast("long"))
                .withColumn(POS_COL, F.monotonically_increasing_id())
                .withColumn(KIND_COL, kind)
            )
            if "__rk" in out.columns:  # consumed by the KIND stamp above
                out = out.drop("__rk")
        dir_cols = []
        if part_cols:
            for k in part_cols:
                out = out.withColumn(PART_DIR_PREFIX + k, F.col(k).cast("string"))
            dir_cols += [PART_DIR_PREFIX + k for k in part_cols]
        if row_kind is not None and schema.primary_keys:
            if "__bucket" not in out.columns:  # dynamic tables pre-assign
                nb = schema.num_buckets
                bucket = F.pmod(
                    F.xxhash64(*[F.col(k) for k in schema.primary_keys]), F.lit(nb)
                ).cast("int")
                out = out.withColumn("__bucket", bucket)
            dir_cols.append("__bucket")
        fmt = schema.options.get("file.format", "parquet")
        if fmt not in ("parquet", "orc", "avro"):
            raise ValueError(
                f"unsupported file.format {fmt!r}; expected parquet, orc or avro"
            )
        statable = {
            f["name"]
            for f in schema.fields
            if not f["type"].startswith(("array", "map", "struct", "binary"))
        }
        if fmt == "avro":
            # no JVM avro DataSource in this distribution — executor-side
            # pure-Python container writer, stats computed in the same pass
            # (sources/avroio.py); same staging layout as partitionBy
            from paimon_presto_spark.sources import avroio

            avro_stats = avroio.write_avro_partitioned(
                out, staging, dir_cols, statable
            )
        else:
            writer = out.write.mode("overwrite")
            if dir_cols:
                writer = writer.partitionBy(*dir_cols)
            writer.format(fmt).save(staging)
            avro_stats = {}

        # register written files: move into data/, collect footer stats
        data_dir = os.path.join(self.path, "data")
        os.makedirs(data_dir, exist_ok=True)
        # bloom file index (file-index.bloom-filter.columns): built here in
        # the same registration pass that reads footer stats. Indexable
        # types only (ints/strings/bools — plans.fileindex.bloom_key);
        # avro files stay unindexed (stats-only skipping, never wrong).
        index_cols = fileindex.index_columns(schema.options)
        if index_cols:
            known = {f["name"] for f in schema.fields}
            bad = [c for c in index_cols if c not in known]
            if bad:
                raise ValueError(
                    f"file-index.bloom-filter.columns references unknown "
                    f"columns {bad}"
                )
        entries = []
        orc_stats = (
            _orc_file_stats(self.spark, staging, fmt, statable)
            if fmt == "orc"
            else {}
        )
        blooms = (
            _build_file_blooms(self.spark, staging, fmt, index_cols)
            if index_cols and fmt in ("parquet", "orc")
            else {}
        )
        for root, _dirs, files in os.walk(staging):
            for fn in files:
                if not fn.endswith("." + fmt):
                    continue
                src = os.path.join(root, fn)
                rel_partition = os.path.relpath(root, staging)
                partition: dict[str, Any] = {}
                bucket = 0
                if rel_partition != ".":
                    for comp in rel_partition.split(os.sep):
                        k, _, v = comp.partition("=")
                        if k == "__bucket":
                            bucket = int(v)
                        elif k.startswith(PART_DIR_PREFIX):
                            partition[k[len(PART_DIR_PREFIX) :]] = v
                name = f"{prefix}-{snapshot_id}-{uuid.uuid4().hex}.{fmt}"
                dst_dir = os.path.join(data_dir, rel_partition) if rel_partition != "." else data_dir
                os.makedirs(dst_dir, exist_ok=True)
                dst = os.path.join(dst_dir, name)
                if fmt == "parquet":
                    meta = pq.ParquetFile(src).metadata
                    stats = _footer_stats(meta, statable)
                    n_rows = meta.num_rows
                elif fmt == "avro":
                    stats, n_rows = avro_stats.get(os.path.abspath(src), ({}, 0))
                else:
                    stats, n_rows = orc_stats.get(os.path.abspath(src), ({}, 0))
                if n_rows == 0:
                    # empty task output (the orc writer emits one per empty
                    # partition) — nothing to register
                    continue
                fidx: dict[str, dict] = blooms.get(os.path.abspath(src), {})
                os.rename(src, dst)
                entry = {
                    "path": os.path.relpath(dst, self.path),
                    "partition": partition,
                    "bucket": bucket,
                    "row_count": n_rows,
                    "file_size": os.path.getsize(dst),
                    "schema_id": schema.schema_id,
                    "min_seq": snapshot_id,
                    "max_seq": snapshot_id,
                    "stats": stats,
                }
                if fidx:
                    entry["index"] = fidx
                entries.append(entry)
        _rmtree_quiet(staging)
        return entries

    def _write_manifest(
        self, schema: TableSchema, snapshot_id: int, entries: list[dict]
    ) -> str:
        """Persist a snapshot's file listing, writing O(changed files).

        Callers hand over the FULL entry list (simple to reason about);
        this diffs it against the parent snapshot and persists only a
        delta member plus a tiny manifest-list file — Paimon's base+delta
        manifest design. At 100 TB (~800k files) a commit's manifest I/O
        is a few KB instead of a few hundred MB. When the list reaches
        ``manifest.full-compaction-threshold`` members (default 10), or
        the delta would exceed the full listing, a fresh base is written
        instead — bounding read-side fold cost to ~threshold small files.
        """
        mdir = os.path.join(self.meta_path, "manifest")
        parent = (
            self.snapshot(snapshot_id - 1)
            if (snapshot_id - 1) in self.snapshot_ids()
            else None
        )
        stamp = f"{snapshot_id}-{uuid.uuid4().hex}"

        def write_full() -> str:
            name = f"manifest-{stamp}.json"
            with open(os.path.join(mdir, name), "w") as fh:
                json.dump({"entries": entries}, fh, default=str)
            return name

        if parent is None:
            return write_full()
        prev_by = {e["path"]: e for e in self.manifest_entries(parent)}
        new_by = {e["path"]: e for e in entries}
        adds = [e for p, e in new_by.items() if prev_by.get(p) != e]
        removes = [
            p
            for p in prev_by
            if p not in new_by or prev_by[p] != new_by[p]
        ]
        members = self._manifest_members(parent)
        members = members[1:] if len(members) > 1 else members
        threshold = int(
            schema.options.get("manifest.full-compaction-threshold", "10")
        )
        if (
            len(members) + 1 >= threshold
            or len(adds) + len(removes) >= max(len(entries), 1)
        ):
            return write_full()
        delta_name = f"manifest-delta-{stamp}.json"
        with open(os.path.join(mdir, delta_name), "w") as fh:
            json.dump({"adds": adds, "removes": removes}, fh, default=str)
        list_name = f"manifest-{stamp}.json"
        with open(os.path.join(mdir, list_name), "w") as fh:
            json.dump({"manifests": members + [delta_name]}, fh)
        return list_name

    def _commit_manifest(
        self, schema: TableSchema, snapshot_id: int, kind: str, entries: list[dict],
        dv_index: str | None = None, bucket_index: str | None = None,
        changelog: str | None = None, commit_identifier: int | None = None,
    ) -> Snapshot:
        os.makedirs(os.path.join(self.meta_path, "manifest"), exist_ok=True)
        os.makedirs(os.path.join(self.meta_path, "snapshot"), exist_ok=True)
        manifest_name = self._write_manifest(schema, snapshot_id, entries)
        snap = Snapshot(
            snapshot_id=snapshot_id,
            schema_id=schema.schema_id,
            commit_user=os.environ.get("USER", "spark"),
            commit_identifier=(
                commit_identifier if commit_identifier is not None
                else snapshot_id
            ),
            commit_kind=kind,
            timestamp_ms=int(time.time() * 1000),
            manifest=manifest_name,
            total_rows=sum(e["row_count"] for e in entries),
            dv_index=dv_index,
            bucket_index=bucket_index,
            changelog=changelog,
        )
        spath = os.path.join(self.meta_path, "snapshot", f"snapshot-{snapshot_id}.json")
        try:
            fd = os.open(spath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as exc:  # concurrent commit won this id
            raise CommitConflict(str(exc)) from exc
        with os.fdopen(fd, "w") as fh:
            json.dump(snap.to_json(), fh)
        tmp = os.path.join(self.meta_path, "snapshot", f".LATEST.{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(str(snapshot_id))
        os.replace(tmp, os.path.join(self.meta_path, "snapshot", "LATEST"))
        self._maybe_auto_tag(schema, snapshot_id)
        self._maybe_auto_expire(schema)
        return snap

    def _maybe_auto_expire(self, schema: TableSchema) -> None:
        """Paimon's per-commit snapshot retention: with
        ``snapshot.num-retained.max`` and/or ``snapshot.time-retained``
        set, every commit trims history to the policy (never below
        ``snapshot.num-retained.min``, default 10) — no external cron.
        Both criteria age from the oldest end, so the drop set is a
        prefix and the standard expiry (which already respects tags,
        consumers, and branches) applies. Cost O(#snapshots) metadata,
        only when the options are set."""
        o = schema.options
        mx = o.get("snapshot.num-retained.max")
        tr = o.get("snapshot.time-retained")
        if mx is None and tr is None:
            return
        ids = self.snapshot_ids()
        mn = int(o.get("snapshot.num-retained.min", "10"))
        if mx is not None:
            mn = min(mn, int(mx))
        drop: set[int] = set()
        if mx is not None and len(ids) > int(mx):
            drop.update(ids[: len(ids) - int(mx)])
        if tr is not None:
            cutoff = int(time.time() * 1000) - _parse_duration_ms(tr)
            for sid in ids[: max(0, len(ids) - mn)]:
                if self.snapshot(sid).timestamp_ms < cutoff:
                    drop.add(sid)
        drop -= set(ids[len(ids) - mn:]) if mn > 0 else set()
        if drop:
            self.expire_snapshots(keep_last=len(ids) - len(drop))

    # -- read path ---------------------------------------------------------

    def scan(
        self,
        predicate: Predicate | None = None,
        snapshot_id: int | None = None,
        as_of_timestamp_ms: int | None = None,
        partition_where: str | None = None,
        tag: str | None = None,
    ) -> "TableScan":
        if tag is not None:
            if snapshot_id is not None or as_of_timestamp_ms is not None:
                raise ValueError("tag is exclusive with snapshot_id/as_of_timestamp_ms")
            return TableScan(
                self, predicate, None, None, partition_where, pinned=self.tag_snapshot(tag)
            )
        return TableScan(self, predicate, snapshot_id, as_of_timestamp_ms, partition_where)

    def to_df(self, **scan_kwargs) -> DataFrame:
        return self.scan(**scan_kwargs).to_df()

    def fast_count(
        self,
        predicate: Predicate | None = None,
        snapshot_id: int | None = None,
        tag: str | None = None,
    ) -> int | None:
        """Exact COUNT(*) from manifest metadata alone — zero data I/O
        (the count-from-stats shortcut Trino/Paimon serve for
        ``SELECT count(*)``; at 100 TB this is planning-time vs a full
        scan). Returns None when metadata cannot answer EXACTLY — the
        caller falls back to ``scan().to_df().count()``:

        - primary-key tables (merge-on-read collapses/deletes rows),
        - snapshots carrying deletion vectors (positions are marked
          deleted inside otherwise-live files),
        - a predicate referencing any non-partition column (it filters
          WITHIN files; partition-column predicates are constant per
          file, so whole-file counts stay exact).
        """
        if tag is not None:
            snap = self.tag_snapshot(tag)
        else:
            snap = (
                self.snapshot(snapshot_id)
                if snapshot_id is not None
                else self.snapshot()
            )
        if snap is None:
            return 0
        schema = self.schema(snap.schema_id)
        if schema.primary_keys or snap.dv_index:
            return None
        entries = self.manifest_entries(snap)
        if predicate is not None:
            pks = set(schema.partition_keys)
            if not predicate.references() <= pks:
                return None
            entries = [
                e
                for e in entries
                if predicate.test_row(_typed_partition(e["partition"], schema))
            ]
        return sum(e["row_count"] for e in entries)

    # -- tags: named immutable snapshot references (Paimon TagManager
    #    parity; surfaced through the same catalog `$` resolution the
    #    reference relies on, PrestoMetadata.java:141) -----------------------

    def _tag_path(self, name: str) -> str:
        return os.path.join(self.meta_path, "tag", f"tag-{name}.json")

    def create_tag(
        self, name: str, snapshot_id: int | None = None, _auto: bool = False
    ) -> None:
        """Pin `name` to a snapshot (default: latest). The tag file stores the
        FULL snapshot payload, so the tag keeps working after the snapshot
        itself is expired — Paimon's tags have the same property."""
        if not name or "/" in name or "$" in name:
            raise ValueError(f"invalid tag name {name!r}")
        snap = self.snapshot(snapshot_id)
        if snap is None:
            raise ValueError("table has no snapshots")
        os.makedirs(os.path.join(self.meta_path, "tag"), exist_ok=True)
        path = self._tag_path(name)
        if os.path.exists(path):
            raise ValueError(f"tag {name!r} already exists")
        payload = snap.to_json()
        payload["tag_name"] = name
        payload["tag_create_ms"] = int(time.time() * 1000)
        if _auto:
            payload["tag_auto"] = True
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(payload, fh, indent=2)
        os.rename(tmp, path)

    _TAG_PERIOD_FORMATS = {"daily": "%Y-%m-%d", "hourly": "%Y-%m-%d %H"}

    def _maybe_auto_tag(self, schema: TableSchema, snapshot_id: int) -> None:
        """Paimon ``tag.automatic-creation=process-time``: after a commit,
        ensure the current period (``tag.creation-period`` daily|hourly,
        UTC) has a tag — the first commit of each period pins it, giving a
        reproducible corpus revision per day/hour with zero operator
        involvement. ``tag.num-retained-max`` prunes the OLDEST
        auto-created tags and ``tag.default-time-retained`` expires
        auto tags past their age (Paimon's auto-tag TTL); manual tags
        are never touched by either."""
        if schema.options.get("tag.automatic-creation") != "process-time":
            return
        period = schema.options.get("tag.creation-period", "daily")
        fmt = self._TAG_PERIOD_FORMATS.get(period)
        if fmt is None:
            raise ValueError(f"unsupported tag.creation-period {period!r}")
        name = time.strftime(fmt, time.gmtime())
        if not os.path.exists(self._tag_path(name)):
            self.create_tag(name, snapshot_id, _auto=True)
        retain = schema.options.get("tag.num-retained-max")
        ttl = schema.options.get("tag.default-time-retained")
        if retain is None and ttl is None:
            return
        auto: list[tuple[str, int]] = []
        for tag in self.list_tags():
            with open(self._tag_path(tag)) as fh:
                d = json.load(fh)
            if d.get("tag_auto"):
                auto.append((tag, int(d.get("tag_create_ms", 0))))
        drop: set[str] = set()
        if retain is not None:
            drop.update(
                t for t, _ in sorted(auto)[: max(0, len(auto) - int(retain))]
            )
        if ttl is not None:
            cutoff = int(time.time() * 1000) - _parse_duration_ms(ttl)
            drop.update(t for t, created in auto if created < cutoff)
        for tag in drop:
            self.delete_tag(tag)

    def delete_tag(self, name: str) -> None:
        try:
            os.remove(self._tag_path(name))
        except FileNotFoundError:
            raise ValueError(f"tag {name!r} does not exist") from None

    def list_tags(self) -> list[str]:
        tdir = os.path.join(self.meta_path, "tag")
        if not os.path.isdir(tdir):
            return []
        return sorted(
            f[len("tag-") : -len(".json")]
            for f in os.listdir(tdir)
            if f.startswith("tag-") and f.endswith(".json")
        )

    def tag_snapshot(self, name: str) -> Snapshot:
        try:
            with open(self._tag_path(name)) as fh:
                d = json.load(fh)
        except FileNotFoundError:
            raise ValueError(f"tag {name!r} does not exist") from None
        return Snapshot(
            **{k: d[k] for k in Snapshot.__dataclass_fields__ if k in d}
        )

    # -- system tables (A14) ----------------------------------------------

    def snapshots_df(self) -> DataFrame:
        rows = [self.snapshot(i).to_json() for i in self.snapshot_ids()]
        schema = (
            "snapshot_id bigint, schema_id bigint, commit_user string, "
            "commit_identifier bigint, commit_kind string, timestamp_ms bigint, "
            "manifest string, total_rows bigint"
        )
        return self.spark.createDataFrame(
            [tuple(r[k] for k in (
                "snapshot_id", "schema_id", "commit_user", "commit_identifier",
                "commit_kind", "timestamp_ms", "manifest", "total_rows")) for r in rows],
            schema,
        )

    def files_df(self) -> DataFrame:
        # per-file deleted-position counts from the DV index (0 if none)
        dv = self.dv_df()
        dead: dict[str, int] = {}
        if dv is not None:
            dead = {
                r["path"]: r["n"]
                for r in dv.groupBy("path").agg(F.count("*").alias("n")).collect()
            }
        rows = [
            (
                e["path"],
                json.dumps(e["partition"]),
                e["bucket"],
                e["row_count"],
                e["file_size"],
                e["schema_id"],
                e["min_seq"],
                dead.get(e["path"], 0),
                ",".join(sorted(e.get("index", {}))),
            )
            for e in self.manifest_entries()
        ]
        return self.spark.createDataFrame(
            rows,
            "file_path string, partition string, bucket int, row_count bigint, "
            "file_size bigint, schema_id bigint, seq bigint, "
            "delete_row_count bigint, index_columns string",
        )

    def partitions_df(self) -> DataFrame:
        agg: dict[str, dict] = {}
        for e in self.manifest_entries():
            key = json.dumps(e["partition"], sort_keys=True)
            a = agg.setdefault(key, {"row_count": 0, "file_count": 0, "file_size": 0})
            a["row_count"] += e["row_count"]
            a["file_count"] += 1
            a["file_size"] += e["file_size"]
        rows = [
            (k, v["row_count"], v["file_count"], v["file_size"]) for k, v in sorted(agg.items())
        ]
        return self.spark.createDataFrame(
            rows, "partition string, row_count bigint, file_count bigint, file_size bigint"
        )

    def tags_df(self) -> DataFrame:
        rows = []
        for name in self.list_tags():
            with open(self._tag_path(name)) as fh:
                d = json.load(fh)
            rows.append(
                (
                    name,
                    d["snapshot_id"],
                    d["schema_id"],
                    d["commit_kind"],
                    d["timestamp_ms"],
                    d.get("tag_create_ms"),
                    d["total_rows"],
                )
            )
        return self.spark.createDataFrame(
            rows,
            "tag_name string, snapshot_id bigint, schema_id bigint, "
            "commit_kind string, snapshot_ms bigint, create_ms bigint, "
            "total_rows bigint",
        )

    def options_df(self) -> DataFrame:
        rows = sorted(self.schema().options.items())
        return self.spark.createDataFrame(rows, "key string, value string")

    def manifests_df(self) -> DataFrame:
        rows = []
        for sid in self.snapshot_ids():
            snap = self.snapshot(sid)
            mpath = os.path.join(self.meta_path, "manifest", snap.manifest)
            entries = self.manifest_entries(snap)
            rows.append(
                (
                    snap.manifest,
                    sid,
                    os.path.getsize(mpath),
                    len(entries),
                    sum(e["row_count"] for e in entries),
                )
            )
        return self.spark.createDataFrame(
            rows,
            "manifest string, snapshot_id bigint, manifest_size bigint, "
            "num_files bigint, total_rows bigint",
        )

    def audit_log_df(self, **scan_kwargs) -> DataFrame:
        """Unmerged change rows with a leading ``rowkind`` column ('+I'/'-D')
        — Paimon's ``$audit_log`` view of a primary-key table. Append-only
        tables report every row as '+I'. Accepts the same time-travel kwargs
        as ``scan``."""
        scan = self.scan(**scan_kwargs)
        df = scan.to_df(merge=False)
        if KIND_COL in df.columns:
            kind = F.concat(
                F.when(F.col(KIND_COL) == "D", F.lit("-")).otherwise(F.lit("+")),
                F.col(KIND_COL),
            )
            data_cols = [c for c in df.columns if c not in SYS_COLS]
            return df.select(kind.alias("rowkind"), *data_cols)
        return df.select(F.lit("+I").alias("rowkind"), "*")

    def schemas_df(self) -> DataFrame:
        sdir = os.path.join(self.meta_path, "schema")
        rows = []
        for fn in sorted(os.listdir(sdir)):
            with open(os.path.join(sdir, fn)) as fh:
                d = json.load(fh)
            rows.append(
                (
                    d["schema_id"],
                    json.dumps(d["fields"]),
                    ",".join(d["primary_keys"]),
                    ",".join(d["partition_keys"]),
                    json.dumps(d.get("options", {})),
                )
            )
        return self.spark.createDataFrame(
            rows, "schema_id bigint, fields string, primary_keys string, "
            "partition_keys string, options string"
        )


class TableScan:
    """Scan planning: snapshot selection → partition pruning → file skipping
    → Spark parquet read → schema-evolution projection → merge-on-read.

    The planned Spark job reads ONLY surviving files; the predicate is
    re-applied as a DataFrame filter (advisory pushdown, reference keeps the
    Filter node too), and pushed further into parquet row groups by Spark.
    """

    def __init__(self, table, predicate, snapshot_id, as_of_ts, partition_where,
                 pinned: Snapshot | None = None):
        self.table = table
        self.predicate = predicate
        self.snapshot_id = snapshot_id
        self.as_of_ts = as_of_ts
        self.partition_where = partition_where
        self.pinned = pinned  # tag reads: snapshot payload came from the tag
        self.last_plan: dict[str, Any] = {}

    def _snapshot(self) -> Snapshot | None:
        t = self.table
        if self.pinned is not None:
            return self.pinned
        if self.snapshot_id is not None:
            return t.snapshot(self.snapshot_id)
        if self.as_of_ts is not None:
            return t.snapshot_as_of(self.as_of_ts)
        return t.snapshot()

    def plan_files(self) -> list[dict]:
        t = self.table
        snap = self._snapshot()
        if snap is None:
            return []
        entries = t.manifest_entries(snap)
        total = len(entries)
        schema = t.schema(snap.schema_id)

        # A21 session toggles (PrestoSessionProperties.java:35-79). Both
        # only WIDEN the file list — the predicate is re-applied as a
        # DataFrame filter, so results are invariant, exactly like the
        # reference's toggles (the engine Filter node stays on top).
        prune_on = properties.partition_prune_enabled(t.spark)
        pushdown_on = properties.pushdown_enabled(t.spark)

        # 1) partition pruning from the structured predicate (A10 first
        #    half). Only the partition-column CONJUNCTS may prune: testing
        #    the full predicate against a partition-only row would evaluate
        #    value-column comparisons as False (missing column) and drop
        #    every partition — AND(pt='X', val=5) must still scan pt='X'.
        if prune_on and self.predicate is not None and schema.partition_keys:
            pp = skip_safe_predicate(
                self.predicate, set(schema.partition_keys)
            )
            if pp is not None:
                entries = [
                    e
                    for e in entries
                    if pp.test_row(_typed_partition(e["partition"], schema))
                ]
        # 2) expression-over-partition-value pruning (A10 flagship:
        #    `upper(pt)='20241103'` — evaluate arbitrary SQL on the driver
        #    against one row per partition; evaluation errors keep the
        #    partition, mirroring the recoverable-error whitelist
        #    (PrestoComputePushdown.java:499-509))
        if prune_on and self.partition_where and schema.partition_keys:
            keep = self._eval_partition_where(entries, schema)
            if keep is not None:
                entries = [
                    e for e in entries if json.dumps(e["partition"], sort_keys=True) in keep
                ]
        pruned_partitions = len(entries)

        # 3) per-file stats skipping (A7/A8). Merge-on-read safety: for a
        #    pk table without deletion vectors, only key/partition columns
        #    may skip files — a value-column skip could drop the file
        #    holding a key's NEWEST version and resurrect a stale row
        #    (see plans.predicate.skip_safe_predicate).
        if pushdown_on and self.predicate is not None:
            dv_on = schema.options.get("deletion-vectors.enabled") == "true"
            safe = (
                None
                if (not schema.primary_keys or dv_on)
                else set(schema.primary_keys) | set(schema.partition_keys)
            )
            sp = skip_safe_predicate(self.predicate, safe)
            if sp is not None:
                # stats/bloom are writer-name-keyed; translate through
                # field ids (see fileindex.translate_entry_metadata)
                cur_by_id = {f["id"]: f["name"] for f in schema.fields}
                ws_fields: dict[int, list] = {}

                def survives(e: dict) -> bool:
                    sid = e["schema_id"]
                    wf = ws_fields.get(sid)
                    if wf is None:
                        wf = t.schema(sid).fields
                        ws_fields[sid] = wf
                    stats, idx = fileindex.translate_entry_metadata(
                        e, cur_by_id, wf
                    )
                    return sp.test_stats(stats, e["row_count"]) and (
                        sp.test_index(idx)
                    )

                entries = [e for e in entries if survives(e)]
        self.last_plan = {
            "snapshot_id": snap.snapshot_id,
            "total_files": total,
            "after_partition_prune": pruned_partitions,
            "after_stats_skip": len(entries),
        }
        return entries

    def _eval_partition_where(self, entries, schema) -> set[str] | None:
        """Evaluate the residual SQL expression against one row per partition.

        Conjunct-wise, like the reference (``PrestoComputePushdown.java:
        234-252`` decomposes the filter and evaluates *remaining
        deterministic conjuncts* per partition): each top-level AND conjunct
        prunes independently; a conjunct that cannot be evaluated on
        partition values alone (references non-partition columns, unknown
        function) is skipped — recoverable-error semantics (``:499-509``).
        """
        parts = {}
        for e in entries:
            parts[json.dumps(e["partition"], sort_keys=True)] = _typed_partition(
                e["partition"], schema
            )
        if not parts:
            return set()
        part_fields = [f for f in schema.fields if f["name"] in schema.partition_keys]
        sschema = T.StructType(
            [
                T.StructField(f["name"], _parse_type(f["type"]), True)
                for f in part_fields
            ]
            + [T.StructField("__pkey", T.StringType(), False)]
        )
        rows = [
            tuple(v[f["name"]] for f in part_fields) + (k,) for k, v in parts.items()
        ]
        df = self.table.spark.createDataFrame(rows, sschema)
        keep = set(parts)
        any_applied = False
        for conjunct in _split_conjuncts(self.partition_where):
            try:
                kept = df.filter(F.expr(conjunct)).select("__pkey").collect()
            except Exception:
                continue  # recoverable: this conjunct can't prune
            keep &= {r["__pkey"] for r in kept}
            any_applied = True
        return keep if any_applied else None

    def to_df(self, merge: bool = True, keep_pos: bool = False) -> DataFrame:
        """`merge=False` keeps the raw change rows (system columns included)
        for the ``$audit_log`` view instead of collapsing them; `keep_pos`
        additionally keeps each row's (file, position) identity columns —
        the DV write path uses this to locate rows to mark deleted."""
        t = self.table
        snap = self._snapshot()
        # Current reads render with the latest schema (DDL changes don't
        # create snapshots); time-travel reads render with the schema the
        # snapshot was committed under (TestPrestoSqlTCase.java:319-387).
        time_travel = (
            self.snapshot_id is not None
            or self.as_of_ts is not None
            or self.pinned is not None
        )
        schema_latest = (
            t.schema(snap.schema_id) if (snap and time_travel) else t.schema()
        )
        entries = self.plan_files()
        spark = t.spark
        if not entries:
            empty_schema = schema_latest.spark_schema()
            if keep_pos:
                empty_schema = T.StructType(
                    list(empty_schema)
                    + [T.StructField(DV_PATH_COL, T.StringType(), True),
                       T.StructField(DV_POS_COL, T.LongType(), True)]
                )
            return spark.createDataFrame([], empty_schema)

        is_pk = bool(schema_latest.primary_keys)
        dv_mode = schema_latest.options.get("deletion-vectors.enabled") == "true"
        dv = t.dv_df(snap)
        # group by writer schema for evolution-aware projection (A18)
        by_schema: dict[int, list[str]] = {}
        for e in entries:
            by_schema.setdefault(e["schema_id"], []).append(
                os.path.join(t.path, e["path"])
            )
        parts = []
        for sid, files in sorted(by_schema.items()):
            writer_schema = t.schema(sid)
            fmt = writer_schema.options.get("file.format", "parquet")
            df = _read_data_files(spark, fmt, files)
            if dv is not None or keep_pos:
                # row identity for position-delete filtering, from the
                # hidden _metadata struct (parquet row index)
                pcol, poscol = t._file_pos_cols()
                df = df.select("*", pcol, poscol)
            df = _project_to(
                df, writer_schema, schema_latest, is_pk,
                extra=[DV_PATH_COL, DV_POS_COL] if (dv is not None or keep_pos) else (),
            )
            parts.append(df)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)

        if dv is not None:
            # Drop deleted positions: broadcast anti-join against the DV
            # index. The index is bounded by deletions-since-compaction
            # (regular compact() folds it into the files), so broadcast is
            # the right default at scale; no key shuffle happens here.
            df = df.join(
                F.broadcast(dv),
                on=(df[DV_PATH_COL] == dv["path"]) & (df[DV_POS_COL] == dv["pos"]),
                how="left_anti",
            )
        if not keep_pos and (dv is not None):
            df = df.drop(DV_PATH_COL, DV_POS_COL)

        if is_pk and merge:
            if dv_mode:
                # DV invariant: every key has exactly one live position —
                # the merge already happened at write time, so a merged
                # read is just the scan minus system columns.
                df = df.drop(*SYS_COLS)
            else:
                df = _merge_on_read(df, schema_latest)
        if self.predicate is not None:
            df = df.filter(self.predicate.to_spark())
        if self.partition_where:
            df = df.filter(F.expr(self.partition_where))
        return df


def _commit_sorted(c: str) -> str:
    """SQL fragment: non-null values of `c` as struct(s,p,v) sorted by the
    commit sequence via an explicit comparator — payload type need not be
    orderable (array_sort's default struct comparison would reject maps)."""
    return (
        f"array_sort(collect_list(IF(`{c}` IS NOT NULL,"
        f" struct(`{SEQ_COL}` AS s, `{POS_COL}` AS p, `{c}` AS v), NULL)),"
        f" (l, r) -> CASE WHEN l.s < r.s OR (l.s = r.s AND l.p < r.p) THEN -1"
        f" WHEN l.s = r.s AND l.p = r.p THEN 0 ELSE 1 END)"
    )


def _sequence_fields(schema: TableSchema) -> list[str]:
    """Parse + validate the ``sequence.field`` option (Paimon's
    user-defined merge ordering: the row with the LARGEST sequence value
    wins, commit order only breaking ties — so out-of-order ingestion,
    e.g. a CDC replay or late-arriving partition, can never regress a
    fresher row). Comma-separated multi-field keys compare
    lexicographically; NULL sorts lowest (a row that doesn't carry the
    sequence column never beats one that does)."""
    raw = schema.options.get("sequence.field", "")
    fields = [c.strip() for c in raw.split(",") if c.strip()]
    if not fields:
        return []
    names = set(schema.field_names())
    for f in fields:
        if f not in names:
            raise ValueError(f"sequence.field references unknown column {f!r}")
        if f in schema.primary_keys:
            raise ValueError(f"sequence.field {f!r} cannot be a primary key")
    engine = schema.options.get("merge-engine", "deduplicate")
    if engine in ("first-row", "aggregation"):
        raise ValueError(
            f"sequence.field is not supported with merge-engine {engine!r}"
        )
    if any(o.endswith(".sequence-group") for o in schema.options):
        raise ValueError(
            "sequence.field cannot be combined with fields.*.sequence-group "
            "(pick whole-row or per-group ordering, not both)"
        )
    return fields


def _merge_on_read(df: DataFrame, schema: TableSchema) -> DataFrame:
    """Collapse the change rows of a primary-key table into its current
    state, per the table's ``merge-engine`` option (A13; engine surface
    exposed by the reference at ``PrestoSqlTableOptionUtils.java:96-128``):

    - ``deduplicate`` (default): latest row per key wins; a latest DELETE
      removes the key (``TestPrestoITCase.java:94-96,392-393``).
    - ``first-row``: earliest row per key wins (deletes ignored).
    - ``partial-update``: per column, the latest NON-NULL value wins —
      upserts patch individual columns without erasing the rest.
    - ``aggregation``: per column, rows combine under
      ``fields.<name>.aggregate-function`` (sum/max/min/count;
      default last_non_null).

    ``sequence.field`` (deduplicate / group-less partial-update) replaces
    "latest commit" with "largest sequence value" as the merge order —
    including for DELETE tombstones, so a stale delete cannot remove a
    fresher row.

    All variants are one shuffle on the key: a single window or hash
    aggregate, so at scale the cost is the same as the deduplicate path
    (bounded further by bucketing + ``compact()``).
    """
    pks = schema.primary_keys
    engine = schema.options.get("merge-engine", "deduplicate")
    seqf = _sequence_fields(schema)
    if engine == "deduplicate":
        w = Window.partitionBy(*pks).orderBy(
            *[F.desc_nulls_last(f) for f in seqf],
            F.desc(SEQ_COL), F.desc(POS_COL),
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .filter(F.col(KIND_COL) != "D")
            .drop("__rn", *SYS_COLS)
        )
    if engine == "first-row":
        w = Window.partitionBy(*pks).orderBy(F.asc(SEQ_COL), F.asc(POS_COL))
        return (
            df.filter(F.col(KIND_COL) != "D")
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", *SYS_COLS)
        )
    data_cols = [n for n in schema.field_names() if n not in pks]
    if engine == "partial-update":
        df = df.filter(F.col(KIND_COL) != "D")  # ignore-delete semantics
        # Sequence groups (Paimon `fields.<seq>.sequence-group=a,b`): the
        # group's columns take their latest non-null value ordered by the
        # GROUP's sequence column (commit order only breaks ties), and
        # rows where the sequence column is null never update the group —
        # so out-of-order arrivals can't regress a fresher value.
        groups: dict[str, list[str]] = {}
        for opt, val in schema.options.items():
            if opt.startswith("fields.") and opt.endswith(".sequence-group"):
                seq_col = opt[len("fields."):-len(".sequence-group")]
                cols = [c.strip() for c in val.split(",") if c.strip()]
                for c in cols + [seq_col]:
                    if c not in data_cols:
                        raise ValueError(
                            f"sequence-group references unknown column {c!r}")
                groups[seq_col] = cols
        if groups:
            # aggregation form: one hash aggregate on the key (same single
            # shuffle as the window form), max_by per column
            owner = {c: s for s, cols in groups.items() for c in cols}
            aggs = []
            for c in data_cols:
                if c in groups:  # a sequence column: advances monotonically
                    aggs.append(F.max(c).alias(c))
                    continue
                s = owner.get(c)
                order = (
                    f"struct(`{s}`, `{SEQ_COL}`, `{POS_COL}`)"
                    if s is not None
                    else f"struct(`{SEQ_COL}`, `{POS_COL}`)"
                )
                guard = f"`{c}` IS NOT NULL" + (
                    f" AND `{s}` IS NOT NULL" if s is not None else ""
                )
                aggs.append(
                    F.expr(f"max_by(`{c}`, IF({guard}, {order}, NULL))").alias(c)
                )
            return df.groupBy(*pks).agg(*aggs).select(*schema.field_names())
        # Latest non-null per column, then one surviving row per key. Both
        # windows share the same partitioning -> one shuffle. With
        # sequence.field, "latest" means largest sequence value (nulls
        # lowest), commit order breaking ties.
        wa = (
            Window.partitionBy(*pks)
            .orderBy(
                *[F.asc_nulls_first(f) for f in seqf],
                F.asc(SEQ_COL), F.asc(POS_COL),
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in data_cols:
            df = df.withColumn(c, F.last(c, ignorenulls=True).over(wa))
        wd = Window.partitionBy(*pks).orderBy(
            *[F.desc_nulls_last(f) for f in seqf],
            F.desc(SEQ_COL), F.desc(POS_COL),
        )
        return (
            df.withColumn("__rn", F.row_number().over(wd))
            .filter(F.col("__rn") == 1)
            .drop("__rn", *SYS_COLS)
        )
    if engine == "aggregation":
        df = df.filter(F.col(KIND_COL) != "D")
        aggs = []
        for c in data_cols:
            fn = schema.options.get(f"fields.{c}.aggregate-function", "last_non_null")
            if fn == "sum":
                aggs.append(F.sum(c).alias(c))
            elif fn == "max":
                aggs.append(F.max(c).alias(c))
            elif fn == "min":
                aggs.append(F.min(c).alias(c))
            elif fn == "count":
                aggs.append(F.count(c).alias(c))
            elif fn == "last_non_null":
                aggs.append(
                    F.expr(
                        f"max_by(`{c}`, IF(`{c}` IS NOT NULL,"
                        f" struct(`{SEQ_COL}`, `{POS_COL}`), NULL))"
                    ).alias(c)
                )
            elif fn == "last_value":
                aggs.append(
                    F.expr(f"max_by(`{c}`, struct(`{SEQ_COL}`, `{POS_COL}`))")
                    .alias(c)
                )
            elif fn == "first_value":
                aggs.append(
                    F.expr(f"min_by(`{c}`, struct(`{SEQ_COL}`, `{POS_COL}`))")
                    .alias(c)
                )
            elif fn == "first_non_null":
                aggs.append(
                    F.expr(
                        f"min_by(`{c}`, IF(`{c}` IS NOT NULL,"
                        f" struct(`{SEQ_COL}`, `{POS_COL}`), NULL))"
                    ).alias(c)
                )
            elif fn == "bool_and":
                aggs.append(F.bool_and(c).alias(c))
            elif fn == "bool_or":
                aggs.append(F.bool_or(c).alias(c))
            elif fn == "product":
                aggs.append(F.product(c).alias(c))
            elif fn == "listagg":
                # commit-ordered concatenation (deterministic: sorted by the
                # commit sequence, not arrival order)
                aggs.append(
                    F.expr(
                        f"array_join(transform(array_sort(collect_list("
                        f"IF(`{c}` IS NOT NULL, struct(`{SEQ_COL}` AS s,"
                        f" `{POS_COL}` AS p, `{c}` AS v), NULL))),"
                        f" x -> x.v), ',')"
                    ).alias(c)
                )
            elif fn == "collect":
                # commit-ordered array concatenation; fields.<c>.distinct
                # keeps first occurrences (Paimon's collect agg). The sort
                # comparator touches only (seq, pos) so the payload type
                # needn't be orderable (maps/structs welcome).
                inner = (
                    f"flatten(transform({_commit_sorted(c)}, x -> x.v))"
                )
                if schema.options.get(f"fields.{c}.distinct") == "true":
                    inner = f"array_distinct({inner})"
                aggs.append(F.expr(inner).alias(c))
            elif fn == "merge_map":
                # later commits' entries overwrite earlier ones key-wise
                # (Paimon's merge_map agg). Fold over commit-sorted maps,
                # replacing same-key entries — map sizes are per-row small,
                # so the quadratic fold is driver-irrelevant and stays in
                # one hash aggregate.
                ftype = next(f["type"] for f in schema.fields if f["name"] == c)
                mt = _parse_type(ftype)
                if not isinstance(mt, T.MapType):
                    raise ValueError(
                        f"merge_map needs a map column, got {ftype!r} for {c!r}")
                kd = mt.keyType.simpleString()
                vd = mt.valueType.simpleString()
                maps_sorted = f"transform({_commit_sorted(c)}, x -> x.v)"
                folded = (
                    f"aggregate(flatten(transform({maps_sorted},"
                    f" m -> map_entries(m))),"
                    f" cast(array() as array<struct<key:{kd},value:{vd}>>),"
                    f" (acc, e) -> concat(filter(acc,"
                    f" a -> NOT (a.key <=> e.key)), array(e)))"
                )
                aggs.append(
                    F.expr(
                        f"IF(size({maps_sorted}) = 0, NULL,"
                        f" map_from_entries({folded}))"
                    ).alias(c)
                )
            else:
                raise ValueError(
                    f"unsupported aggregate-function {fn!r} for field {c!r}"
                )
        return df.groupBy(*pks).agg(*aggs).select(*schema.field_names())
    raise ValueError(f"unknown merge-engine {engine!r}")


def _hilbert_index(coords: list[F.Column], bits: int) -> F.Column:
    """Hilbert index of n pre-scaled coordinates (each in [0, 2^bits)),
    as one long column.

    Skilling's axes→transpose algorithm ("Programming the Hilbert curve",
    AIP 2004), vectorized over numpy arrays in an Arrow-batched pandas
    UDF. The state-dependent bit transforms defeat Catalyst expression
    sharing (a pure-column unrolling grows the tree exponentially and
    overflows canonicalization), and the key is computed exactly once per
    compaction rewrite — so the batched-UDF cost is a one-off
    memory-bandwidth pass, not a hot-path concern. n*bits must fit a long
    (n<=4, bits<=10 for clustering keys).
    """
    import pandas as pd

    n = len(coords)

    def calc(cols) -> pd.Series:
        import numpy as np

        X = [c.to_numpy(dtype=np.int64, copy=True) for c in cols]
        M = 1 << (bits - 1)
        # inverse undo excess work
        Q = M
        while Q > 1:
            P = Q - 1
            for i in range(n):
                mask = (X[i] & Q) != 0
                X[0][mask] ^= P
                t = (X[0] ^ X[i]) & P
                t[mask] = 0
                X[0] ^= t
                X[i] ^= t
            Q >>= 1
        # Gray encode
        for i in range(1, n):
            X[i] ^= X[i - 1]
        t = np.zeros_like(X[0])
        Q = M
        while Q > 1:
            t[(X[n - 1] & Q) != 0] ^= Q - 1
            Q >>= 1
        X = [x ^ t for x in X]
        # interleave the transposed bits: bit q of X[i] -> q*n + (n-1-i)
        out = np.zeros_like(X[0])
        for q in range(bits):
            for i in range(n):
                out += ((X[i] >> q) & 1) << (q * n + (n - 1 - i))
        return pd.Series(out)

    # pandas_udf infers arity from type hints (no *args support): one
    # fixed-arity wrapper per supported dimensionality, annotated with
    # real class objects (module-level `from __future__ import
    # annotations` would stringify inline hints beyond the resolver)
    if n == 2:
        def hkey(c0, c1):
            return calc([c0, c1])
    elif n == 3:
        def hkey(c0, c1, c2):
            return calc([c0, c1, c2])
    else:
        def hkey(c0, c1, c2, c3):
            return calc([c0, c1, c2, c3])
    hkey.__annotations__ = {
        **{f"c{i}": pd.Series for i in range(n)}, "return": pd.Series
    }

    return F.pandas_udf(hkey, "long")(*[c.cast("long") for c in coords])


def _project_to(
    df: DataFrame, writer_schema: TableSchema, reader_schema: TableSchema,
    keep_sys: bool, extra: Iterable[str] = (),
) -> DataFrame:
    """Project a file written under `writer_schema` to `reader_schema`.

    Field-ID based: renames follow the id, dropped columns disappear, added
    columns materialize as typed NULLs — the standard lakehouse evolution
    contract (reference applies SchemaChange server-side and Paimon readers
    do this projection; we do it with one Spark select).
    """
    by_id = {f["id"]: f for f in writer_schema.fields}
    cols = []
    for f in reader_schema.fields:
        w = by_id.get(f["id"])
        target_t = _parse_type(f["type"])
        if w is not None and w["name"] in df.columns:
            cols.append(F.col(w["name"]).cast(target_t).alias(f["name"]))
        else:
            cols.append(F.lit(None).cast(target_t).alias(f["name"]))
    if keep_sys:
        sys_types = {SEQ_COL: "long", POS_COL: "long", KIND_COL: "string"}
        for c in SYS_COLS:
            cols.append(
                F.col(c) if c in df.columns else F.lit(None).cast(sys_types[c]).alias(c)
            )
    for c in extra:
        cols.append(F.col(c))
    return df.select(*cols)


def _parse_duration_ms(spec: str) -> int:
    """Paimon-style duration strings: ``7 d``, ``24 h``, ``30 min``,
    ``45 s``, ``500 ms`` (unit optional whitespace, default ms)."""
    s = spec.strip().lower()
    units = [("ms", 1), ("min", 60_000), ("s", 1000), ("m", 60_000),
             ("h", 3_600_000), ("d", 86_400_000)]
    for suffix, mult in units:
        if s.endswith(suffix):
            num = s[: -len(suffix)].strip()
            if num:
                return int(float(num) * mult)
    return int(float(s))


def _split_conjuncts(expr: str) -> list[str]:
    """Split a SQL boolean expression on top-level ANDs (depth-0, outside
    string literals). Conservative: anything unsplittable stays whole."""
    out, depth, in_str, start = [], 0, False, 0
    i, n = 0, len(expr)
    upper = expr.upper()
    while i < n:
        ch = expr[i]
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif (
            depth == 0
            and upper[i : i + 3] == "AND"
            and (i == 0 or not expr[i - 1].isalnum() and expr[i - 1] != "_")
            and (i + 3 >= n or not expr[i + 3].isalnum() and expr[i + 3] != "_")
        ):
            out.append(expr[start:i].strip())
            i += 3
            start = i
            continue
        i += 1
    out.append(expr[start:].strip())
    return [c for c in out if c]


def _typed_partition(partition: dict[str, str], schema: TableSchema) -> dict[str, Any]:
    """Partition dir values (strings) → typed python values per schema."""
    out: dict[str, Any] = {}
    for f in schema.fields:
        if f["name"] not in partition:
            continue
        raw = partition[f["name"]]
        t = f["type"]
        if raw is None or raw == "__HIVE_DEFAULT_PARTITION__":
            out[f["name"]] = None
        elif t in ("tinyint", "smallint", "int", "bigint") or _is_time_type(t):
            # TIME partitions by its physical micros-since-midnight long
            out[f["name"]] = int(raw)
        elif t in ("float", "double"):
            out[f["name"]] = float(raw)
        elif t == "boolean":
            out[f["name"]] = raw.lower() == "true"
        else:
            out[f["name"]] = raw
    return out


def _orc_file_stats(
    spark: SparkSession, staging: str, fmt: str, statable: set[str]
) -> dict[str, tuple[dict, int]]:
    """Per-file column min/max/null-count + row count for formats whose
    footers pyarrow can't mine (ORC): one distributed aggregation grouped by
    ``input_file_name()`` over the just-staged files. At scale this is a
    single extra columnar scan of data already in page cache, done once per
    commit — the ORC twin of the parquet footer walk (and the same stats
    contract: values normalized via ``_plain`` so pruning is format-blind).
    """
    from urllib.parse import unquote, urlparse

    rd = spark.read.format(fmt).load(staging)
    phys = [
        c
        for c in rd.columns
        if c in statable and not c.startswith(PART_DIR_PREFIX) and c != "__bucket"
    ]
    aggs = [F.count(F.lit(1)).alias("__rc")]
    for c in phys:
        aggs += [
            F.min(c).alias(f"__mn_{c}"),
            F.max(c).alias(f"__mx_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nc_{c}"),
        ]
    out: dict[str, tuple[dict, int]] = {}
    for r in rd.groupBy(F.input_file_name().alias("__f")).agg(*aggs).collect():
        d = r.asDict()
        path = os.path.abspath(unquote(urlparse(d["__f"]).path))
        stats = {}
        for c in phys:
            mn, mx, nc = d[f"__mn_{c}"], d[f"__mx_{c}"], d[f"__nc_{c}"]
            stats[c] = {
                "min": _plain(mn) if mn is not None else None,
                "max": _plain(mx) if mx is not None else None,
                "null_count": int(nc or 0),
            }
        out[path] = (stats, int(d["__rc"]))
    return out


def _build_file_blooms(
    spark: SparkSession, staging: str, fmt: str, index_cols: list[str]
) -> dict[str, dict]:
    """Per-file bloom descriptors {abs_path: {col: bloom}} built
    EXECUTOR-side in one distributed pass over the just-staged files —
    the index twin of ``_orc_file_stats``. The previous driver path read
    every indexed column of every written file sequentially through
    pyarrow (O(rows) driver I/O and memory), serializing large commits on
    bloom-indexed tables; here each file's values ship to one task
    (grouped by ``input_file_name()``, only the indexed columns shuffle)
    and only the ~1.2-bytes-per-distinct descriptors return to the driver.
    """
    import json as _json

    from urllib.parse import unquote, urlparse

    rd = spark.read.format(fmt).load(staging)
    # Canonical bloom KEYS are built JVM-side (the exact strings
    # plans.fileindex.bloom_key would produce), so values never round-trip
    # through pandas dtypes: Arrow→pandas floatifies a nullable int64
    # column, and int64 values past 2^53 would come back rounded — keys
    # silently wrong, files wrongly skipped. String keys are immune.
    types = {f.name: f.dataType.simpleString() for f in rd.schema.fields}
    key_exprs, cols = [], []
    for c in index_cols:
        t = types.get(c)
        if t in ("tinyint", "smallint", "int", "bigint"):
            k = F.concat(F.lit("i:"), F.col(c).cast("string"))
        elif t in ("string", "char", "varchar") or (
            t and (t.startswith("char(") or t.startswith("varchar("))
        ):
            k = F.concat(F.lit("s:"), F.col(c))
        elif t == "boolean":
            # two explicit whens: NULL must stay NULL (unindexed), not
            # fall through an otherwise() into 'b:0'
            k = F.when(F.col(c), "b:1").when(~F.col(c), "b:0")
        else:  # unindexable type (float/date/binary/...) — stats-only
            continue
        cols.append(c)
        key_exprs.append(k.alias(f"__k_{c}"))
    if not cols:
        return {}

    def _build(pdf):
        import pandas as pd

        fname = pdf["__f"].iloc[0]
        out = {}
        for c in cols:
            bl = fileindex.build_bloom_from_keys(
                pdf[f"__k_{c}"].dropna().tolist()
            )
            if bl is not None:
                out[c] = bl
        return pd.DataFrame({"__f": [fname], "__idx": [_json.dumps(out)]})

    rows = (
        rd.select(F.input_file_name().alias("__f"), *key_exprs)
        .groupBy("__f")
        .applyInPandas(_build, schema="__f string, __idx string")
        .collect()
    )
    out: dict[str, dict] = {}
    for r in rows:
        path = os.path.abspath(unquote(urlparse(r["__f"]).path))
        idx = _json.loads(r["__idx"])
        if idx:
            out[path] = idx
    return out


def _footer_stats(meta, statable: set[str]) -> dict[str, dict]:
    """Column min/max/null_count from a parquet footer (metadata only)."""
    agg: dict[str, dict] = {}
    for rg in range(meta.num_row_groups):
        g = meta.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if name not in statable:
                continue
            try:
                st = col.statistics
            except Exception:
                # pyarrow cannot extract stats for some physical types
                # (e.g. fixed-len-byte-array decimals); no stats → no
                # skipping for this column, which is always safe
                continue
            if st is None:
                continue
            a = agg.setdefault(name, {"min": None, "max": None, "null_count": 0})
            try:
                if st.has_min_max:
                    mn, mx = _plain(st.min), _plain(st.max)
                    a["min"] = mn if a["min"] is None else min(a["min"], mn)
                    a["max"] = mx if a["max"] is None else max(a["max"], mx)
            except Exception:
                # pyarrow raises lazily on .min/.max for unsupported
                # physical types (fixed-len-byte-array decimals)
                pass
            a["null_count"] += st.null_count or 0
    return agg


def _plain(v):
    import datetime
    import decimal

    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v


def _read_data_files(spark: SparkSession, fmt: str, files: list) -> DataFrame:
    """Load registered data files in their writer schema's format.

    parquet/orc go through the vectorized JVM readers; avro (no JVM
    DataSource in this distribution) through the executor-side pure-Python
    container decoder (``sources/avroio.py``). Deletion vectors require
    parquet (guarded at enable time), so the ``_metadata`` position columns
    are never requested on the avro path.
    """
    if fmt == "avro":
        from paimon_presto_spark.sources import avroio

        return avroio.read_avro(spark, files)
    return spark.read.format(fmt).load(files)


def _rmtree_quiet(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def _copyfile(src: str, dst: str) -> None:
    import shutil

    shutil.copyfile(src, dst)
