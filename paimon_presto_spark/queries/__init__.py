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


def queries() -> dict[str, QueryFn]:
    _load()
    return {name: e.fn for name, e in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load()
    return {name: e.oracle for name, e in REGISTRY.items() if e.oracle}


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

    _loaded = True
