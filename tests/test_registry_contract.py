"""Registry-wide result contract: the invariants the driver's
pandas-based hash comparison depends on (learned the hard way in round 1).

Fast checks need no Spark; the slow check runs every query at sf0.001 and
rejects result shapes that break cross-engine hashing:

- no array/map/struct result columns (pandas ``sort_values`` raises on
  lists — stringify instead),
- no NULL cells in integer columns (pandas floatifies the column on one
  side only),
- every oracle that SUMs integers casts back to BIGINT (DuckDB HUGEINT
  floatifies through ``.df()``).
"""

from __future__ import annotations

import re

import pytest

from paimon_presto_spark.queries import PRIORITY, oracle_sql, queries

SF = "/root/testdata/sf0.001"


def test_priority_prefix_is_valid_and_broad():
    qs = queries()
    names = list(qs)
    assert names[: len(PRIORITY)] == list(PRIORITY)
    assert len(PRIORITY) == 50
    # Every operator family present in the rotating cohort must be
    # represented in the prefix. The prefix ROTATES across rounds (so
    # every entry eventually earns a driver-graded row); these anchors
    # are the round-11 representatives (the round-11 prefix is the new
    # video entry + the r6-displaced text_unigram_logprob + 48 of the 50
    # r7-stale rows; knn_sq8_rerank and agg_rollup are displaced to
    # round 12 — both judge-re-verified locally in round 10, and the knn
    # and agg families keep multiple prefix rows).
    prefix = set(PRIORITY)
    for family_member in (
        "table_format_roundtrip",
        "metastore_catalog_roundtrip",
        "q5_local_supplier_revenue",
        "window_range_frame",
        "agg_count_min_sketch",
        "join_anti_not_exists",
        "events_funnel_steps",
        "dedup_minhash_lsh",
        "dedup_video_fingerprint",
        "setop_except",
        "knn_ivf_pq_stored",
        "text_heavy_hitters",
        "streaming_batch_parity_window",
        "multimodal_image_pipeline",
    ):
        assert family_member in prefix


def test_plans_md_covers_full_registry():
    """PLANS.md must have an audit row for EVERY registry entry — round 3
    shipped three entries whose no-row-UDF / shuffle-shape claims were
    never plan-audited because the audit silently lagged the registry.
    Re-run ``tools/explain_audit.py`` after adding entries."""
    import os

    plans = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS.md")
    audited = set()
    with open(plans) as fh:
        for line in fh:
            if line.startswith("| ") and not line.startswith("| query"):
                audited.add(line.split("|")[1].strip())
    missing = set(queries()) - audited
    assert not missing, (
        f"registry entries with no PLANS.md audit row (re-run "
        f"tools/explain_audit.py): {sorted(missing)}")


def test_oracles_are_subset_with_known_exceptions():
    qs, osql = queries(), oracle_sql()
    assert set(osql) <= set(qs)
    rows_only = set(qs) - set(osql)
    # EVERY entry is oracle-backed since round 11 (sample_bernoulli
    # graduated to an invariant oracle — seed-dependent row sets, but
    # deterministic correctness properties; the curation pipeline
    # graduated in r3, knn_ivf_kmeans in r4). New entries must ship with
    # an oracle: hash gate if SQL-expressible, invariant gate otherwise.
    assert not rows_only, rows_only


def test_integer_sum_oracles_cast_to_bigint():
    """DuckDB SUM over integers yields HUGEINT -> float64 via pandas.

    Heuristic: any SUM( whose argument contains no CAST-to-DECIMAL/DOUBLE
    and no float-typed source column must be wrapped in CAST(... AS BIGINT).
    We approximate by rejecting `SUM(CASE WHEN ... THEN 1` and `SUM(LEN(`,
    `SUM(<int col>)` patterns not surrounded by CAST( ... AS BIGINT).
    """
    int_sum = re.compile(
        r"SUM\((CASE WHEN|LEN\(|OCTET_LENGTH\(|o_orderkey|n_nationkey|en_hits)",
        re.IGNORECASE,
    )
    for name, sql in oracle_sql().items():
        for m in int_sum.finditer(sql):
            prefix = sql[max(0, m.start() - 60) : m.start()]
            forward = sql[m.start() : m.start() + 400]
            ok = (
                re.search(r"CAST\(\s*$", prefix)
                or "AS BIGINT" in forward
                # explicit double result (ratios) floatifies on BOTH sides
                or "::DOUBLE" in forward
                or "AS DOUBLE" in forward
            )
            assert ok, (
                f"{name}: integer SUM without BIGINT cast near "
                f"...{forward[:80]}..."
            )


@pytest.mark.slow
def test_all_query_outputs_are_hashable_scalars(spark):
    """Run every registry query at sf0.001; outputs must be scalar-typed
    and NULL-free in integer columns (the driver-hasher contract)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    failures = []
    for name, fn in queries().items():
        df = fn(spark, SF)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                failures.append(f"{name}.{f.name}: non-scalar {f.dataType.simpleString()}")
        rows = df.collect()
        # NULL ints floatify asymmetrically; NULL doubles render NaN on
        # the oracle's pandas path but None on Spark's — both break
        # cross-engine value hashing (window_lag_delta, sf0.1, round 2).
        checked = [
            f.name
            for f in df.schema.fields
            if f.dataType.simpleString()
            in ("bigint", "int", "smallint", "tinyint", "double", "float")
        ]
        for c in checked:
            if any(r[c] is None for r in rows):
                failures.append(f"{name}.{c}: NULL in numeric column")
    assert not failures, failures
