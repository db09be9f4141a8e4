"""Query registry — the engine's tested SQL/DataFrame surface.

Each entry pairs an idiomatic-PySpark implementation with (where
SQL-expressible) an ANSI-SQL oracle that DuckDB runs on the same parquet
inputs. The driver's correctness gate hash-compares the two at sf=0.01;
``tools/check_correctness.py`` replicates that locally.

Determinism rules (cross-engine hash equality demands bit-equal values):

- **Sums/avgs over doubles go through DECIMAL(28,10).** Partial aggregation
  reorders floating-point addition, so a plain double SUM differs between
  engines (and between runs at different parallelism). Casting each addend
  to decimal makes the arithmetic exact and order-independent; the final
  value is cast back to DOUBLE. Same trick in the oracle SQL.
- **No engine-native hash functions in results** — portable md5-derived
  hashes only (``functions/hashing.py``).
- **Every ORDER BY used for top-k carries a unique tie-break key.**
- **Timestamps are returned as DATE / epoch integers**, never raw
  engine-local timestamp reprs.

Registry tags mirror SURVEY.md §2.2 families so coverage is auditable.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryEntry:
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QueryEntry] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryEntry(fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


# The correctness harness grades registry entries in order and may stop at a
# fixed count (rounds 1-4 each recorded exactly the first 50). The prefix
# is ROTATED each round so every registry entry eventually earns a
# driver-graded row. After round 4, every one of the 146 entries has a
# green driver row; the round-5 policy (per VERDICT r4) is pure staleness
# rotation: the 6 rows whose only driver grade came from round 1 (the
# pre-pandas-dtype-hardening harness) plus all 44 rows last graded in
# round 2 — plus every entry ADDED this round (a new entry outside the
# prefix would sit ungraded), displacing the same number of r2 rows whose
# family stays anchored in-prefix — exactly 50. sample_bernoulli is the
# one declared rows-only entry (seed-dependent by design); it rotates in
# with its r1 cohort so its rows-only row is at least re-recorded by the
# current harness.
# Everything outside the prefix is still verified by the local gate
# (tools/check_correctness.py) every session.
PRIORITY: tuple[str, ...] = (
    # -- NEW this round (never graded) -----------------------------------
    # (displaced: q17_small_quantity — correlated-agg family anchored by
    # q2_min_cost_supplier + q21 in-prefix; knn_ivf_probe — knn family
    # anchored by knn_bruteforce_topk + knn_lsh_bucketed in-prefix)
    "text_gopher_quality",
    "knn_pq_adc",
    # -- last driver-graded in ROUND 1 (stalest; q12 FAILED its r1 hash
    # under the old harness and passes the local gate today) -------------
    "q12_priority_shipmode",
    "q14_promo_revenue",
    "case_when_bucketize",
    "filter_in_like",
    "window_lag_delta",
    "sample_bernoulli",
    # -- last driver-graded in ROUND 2 (all 44) --------------------------
    # table format
    "table_format_changelog",
    "table_format_dv_roundtrip",
    "table_format_retraction_changelog",
    # TPC-H shapes
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q6_revenue_forecast",
    "q9_product_profit",
    "q13_customer_distribution",
    "q18_large_orders",
    "q21_suppliers_kept_waiting",
    # joins / subqueries / set ops
    "join_semi_exists",
    "quantified_comparison",
    "null_safe_comparison",
    "setop_union_all",
    "nested_struct_map_access",
    "unnest_word_counts",
    "try_cast_tolerant",
    # aggregates
    "agg_approx_distinct",
    "agg_checksum",
    "agg_collect_reduce",
    "agg_cube",
    "agg_distinct",
    "agg_hll_sketch_merge",
    "agg_minmax_by_n",
    "agg_percentiles",
    # windows
    "window_running_total",
    "window_topn_per_nation",
    # datetime / misc scalars / UDF
    "datetime_functions",
    "custom_functions_udf",
    "events_json_props",
    # event analytics
    "events_asof_join",
    "events_hierarchical_rollup",
    "events_interval_join",
    "events_sessionization",
    # LLM pipeline
    "decontaminate_ngram_overlap",
    "dedup_embedding_cosine",
    "dedup_exact",
    "knn_bruteforce_topk",
    "knn_lsh_bucketed",
    "text_langid_stopword_density",
    "text_token_stats",
)


def _ordered() -> dict[str, QueryEntry]:
    _load()
    missing = [n for n in PRIORITY if n not in REGISTRY]
    if missing:  # registry drift must fail loudly, not silently reorder
        raise KeyError(f"PRIORITY names not in registry: {missing}")
    rest = [n for n in REGISTRY if n not in PRIORITY]
    return {n: REGISTRY[n] for n in (*PRIORITY, *rest)}


def queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in _ordered().items() if e.oracle}


_loaded = False


def _load() -> None:
    global _loaded
    if _loaded:
        return
    # Imported for registration side effects.
    from paimon_presto_spark.queries import relational  # noqa: F401
    from paimon_presto_spark.queries import tpch_extra  # noqa: F401
    from paimon_presto_spark.queries import advanced  # noqa: F401
    from paimon_presto_spark.queries import events  # noqa: F401
    from paimon_presto_spark.queries import llm_ops  # noqa: F401
    from paimon_presto_spark.queries import coverage  # noqa: F401
    from paimon_presto_spark.queries import curation  # noqa: F401

    _loaded = True
