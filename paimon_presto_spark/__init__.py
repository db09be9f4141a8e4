"""paimon_presto_spark — a PySpark-native lakehouse analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``apache/paimon-presto`` (the Presto connector for the Apache Paimon table
format), expressed idiomatically on Spark:

- ``catalog``  — warehouse/database/table catalog with DDL + schema evolution
  (reference: ``PrestoMetadata.java:86-320``).
- ``table``    — snapshot-versioned table format: manifests, append +
  primary-key upsert/delete writes, merge-on-read, time travel, system tables
  (reference: ``PrestoSplitManager.java``, ``PrestoPageSourceProvider.java``).
- ``plans``    — predicate model + manifest-stat file skipping + partition
  pruning incl. expression-over-partition-value
  (reference: ``PrestoFilterConverter.java``, ``PrestoComputePushdown.java``).
- ``operators``— LLM-data-pipeline operators: dedup (exact/minhash/simhash/
  jaccard/embedding), similarity search, text analysis, multimodal plumbing.
- ``streaming``— Structured Streaming over the table changelog.

Spark SQL/Catalyst plays the host-engine role Presto played (joins, aggs,
windows, set ops, scalar functions); everything here is driver-side planning
plus declarative DataFrame programs, so Catalyst/Tungsten/AQE handle physical
execution at cluster scale.
"""

__all__ = ["Catalog", "get_spark"]
__version__ = "0.1.0"


def __getattr__(name):  # lazy imports keep `import paimon_presto_spark` cheap
    if name == "Catalog":
        from paimon_presto_spark.catalog import Catalog

        return Catalog
    if name == "get_spark":
        from paimon_presto_spark.session import get_spark

        return get_spark
    raise AttributeError(name)
