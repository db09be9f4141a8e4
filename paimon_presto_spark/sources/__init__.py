"""Data sources: testdata loader + table-format reader entry points."""

from paimon_presto_spark.sources.testdata import TABLES, load_table, register_views


def register_datasource(spark):
    """Register the `paimon` Python DataSource on a session, enabling
    ``spark.read.format("paimon").option("path", <table_dir>).load()`` and
    ``df.write.format("paimon")...``. Requires
    ``spark.sql.python.filterPushdown.enabled=true`` (set by
    ``session.get_spark``) for the file-skipping pushdown path."""
    from paimon_presto_spark.sources.datasource import PaimonDataSource

    spark.dataSource.register(PaimonDataSource)
    return spark


__all__ = ["TABLES", "load_table", "register_views", "register_datasource"]
