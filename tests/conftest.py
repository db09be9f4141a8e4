import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("paimon-presto-spark-tests")
        # One session-scoped JVM serves the whole suite (500+ tests, the
        # 150+-entry registry battery, cached intermediates, broadcast
        # refs); PySpark's 1g default heap OOMed once the registry passed
        # ~150 entries. The box has 128 GiB — size the heap for the suite.
        .config("spark.driver.memory", "6g")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "warehouse")


@pytest.fixture()
def catalog(spark, warehouse):
    from paimon_presto_spark.catalog import Catalog

    c = Catalog(spark, warehouse)
    c.create_database("default")
    return c


SF_DIR = "/root/testdata/sf0.001"
