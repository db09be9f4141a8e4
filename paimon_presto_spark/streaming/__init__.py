"""Structured Streaming over the table format's changelog.

The reference connector is batch-only (SURVEY §1.2: Paimon streaming
options are exposed as table DDL passthrough but no streaming read exists
in the connector). This package is the Spark-native extension: the table's
immutable data files ARE a changelog (+I/-D row kinds with commit
sequence), so ``readStream`` over the data directory yields exactly the
stream a Paimon changelog scan would.
"""

from paimon_presto_spark.streaming.dedup import streaming_exact_dedup
from paimon_presto_spark.streaming.lookup import lookup_join
from paimon_presto_spark.streaming.sink import table_sink
from paimon_presto_spark.streaming.source import changelog_stream, track_consumer
from paimon_presto_spark.streaming.windows import sessionized, tumbling_counts

__all__ = [
    "changelog_stream",
    "lookup_join",
    "sessionized",
    "streaming_exact_dedup",
    "table_sink",
    "track_consumer",
    "tumbling_counts",
]
