"""Data sources: testdata loader + table-format reader entry points."""

from paimon_presto_spark.sources.testdata import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
