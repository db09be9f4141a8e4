"""Engine session properties (A21).

The reference exposes per-session knobs through Presto's session-property
mechanism (``PrestoSessionProperties.java:35-79``): ``query_pushdown_enabled``,
``partition_prune_enabled``, ``range_filters_on_subscripts_enabled`` and
``scan_version``, with catalog-level defaults from ``PaimonConfig.java:25-84``.
Spark's analog of a session property is the runtime conf, so this engine
surfaces the same knobs under the ``spark.paimon.*`` namespace:

    spark.conf.set("spark.paimon.scan_version", "3")
    spark.conf.set("spark.paimon.query_pushdown_enabled", "false")

Semantics parity:

- ``query_pushdown_enabled`` gates manifest-stats FILE skipping. Turning it
  off never changes results — the predicate is always re-applied as a
  DataFrame filter (the reference likewise keeps the engine Filter node on
  top of the pushed scan, ``PrestoComputePushdown.java:174-285``); it only
  widens the file list, which is exactly what Presto's toggle does.
- ``partition_prune_enabled`` gates partition pruning (both structured
  pruning and expression-over-partition-value evaluation, A10).
- ``scan_version`` accepts the reference's two formats
  (``PrestoPropertyUtils.java:30-60``): a global version, or
  ``db.table.version|db.table.version`` entries where db/table may be
  ``*``. The resolved version is a snapshot id or a tag name — the same
  duality Paimon's ``scan.version`` core option has (the reference copies
  the resolved value into that option, ``PrestoMetadata.java:137-165``).
  Explicit scan arguments (``snapshot_id=... / tag=...``) take precedence,
  mirroring per-table over global precedence.
- ``range_filters_on_subscripts_enabled`` is accepted for compatibility but
  is advisory here: Catalyst already evaluates subscript predicates
  (``element_at``/``getItem``) engine-side, and structural columns carry no
  manifest stats to skip on (the reference never pushes structural types
  either, ``PrestoFilterConverter.java:121-127``).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

NAMESPACE = "spark.paimon."

QUERY_PUSHDOWN_ENABLED = NAMESPACE + "query_pushdown_enabled"
PARTITION_PRUNE_ENABLED = NAMESPACE + "partition_prune_enabled"
RANGE_FILTERS_ON_SUBSCRIPTS_ENABLED = (
    NAMESPACE + "range_filters_on_subscripts_enabled"
)
SCAN_VERSION = NAMESPACE + "scan_version"

_SPLITTER = "|"


def _get(spark: SparkSession, key: str, default: str | None) -> str | None:
    try:
        return spark.conf.get(key, default)
    except Exception:  # pragma: no cover - static conf edge
        return default


def _get_bool(spark: SparkSession, key: str, default: bool) -> bool:
    raw = _get(spark, key, None)
    if raw is None:
        return default
    return str(raw).strip().lower() not in ("false", "0", "no")


def pushdown_enabled(spark: SparkSession) -> bool:
    """Presto ``query_pushdown_enabled`` (default true, PaimonConfig)."""
    return _get_bool(spark, QUERY_PUSHDOWN_ENABLED, True)


def partition_prune_enabled(spark: SparkSession) -> bool:
    """Presto ``partition_prune_enabled`` (default true, PaimonConfig)."""
    return _get_bool(spark, PARTITION_PRUNE_ENABLED, True)


def resolve_scan_version(
    scan_version: str | None, db: str, table: str
) -> str | None:
    """Resolve the effective scan version for ``db.table``.

    Port of the reference's format contract (``PrestoPropertyUtils.java:
    32-61``): a value with no dot is a GLOBAL version applying to every
    table; otherwise it is ``|``-separated ``db.table.version`` entries,
    where db/table may be the wildcard ``*``, first match wins, and a
    version may itself contain dots (the template captures ``(.+)``).
    Returns None when no entry matches.
    """
    if scan_version is None or not scan_version.strip():
        return None
    scan_version = scan_version.strip()
    if "." not in scan_version:
        return scan_version
    pattern = re.compile(
        r"^(%s|\*)\.(%s|\*)\.(.+)$" % (re.escape(db), re.escape(table))
    )
    for entry in scan_version.split(_SPLITTER):
        m = pattern.match(entry.strip())
        if m:
            return m.group(3).strip()
    return None


def session_scan_version(spark: SparkSession, db: str, table: str) -> str | None:
    """The session-level scan version applying to ``db.table``, if any."""
    return resolve_scan_version(_get(spark, SCAN_VERSION, None), db, table)


def scan_kwargs_for_version(version: str, table) -> dict:
    """Translate a resolved scan version into TableScan arguments.

    Paimon's ``scan.version`` accepts a snapshot id or a tag name; an
    all-digit version that exists as a snapshot is a snapshot id,
    anything else must be a tag (matching Paimon's resolution order).
    """
    if version.isdigit() and int(version) in table.snapshot_ids():
        return {"snapshot_id": int(version)}
    if version in table.list_tags():
        return {"tag": version}
    raise ValueError(
        f"scan_version {version!r} is neither a snapshot id nor a tag"
    )
