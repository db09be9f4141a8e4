"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` /``oracle_sql()``
expose the full registry from ``paimon_presto_spark.queries`` (one entry per
implemented operator from SURVEY.md §2, plus the LLM-data-pipeline
extensions). The driver compares each Spark query against its DuckDB oracle
at sf=0.01 (row count + schema + order-insensitive value hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from paimon_presto_spark.queries import (  # noqa: E402
    oracle_sql as _oracle_sql,
    queries as _queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 pricing summary."""
    from paimon_presto_spark.queries.relational import q1_pricing_summary
    from paimon_presto_spark.session import tune_session

    tune_session(spark)
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator from SURVEY.md §2."""
    from paimon_presto_spark.session import tune_session

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        run.__name__ = fn.__name__
        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in _queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each (SQL-expressible) query."""
    return dict(_oracle_sql())
