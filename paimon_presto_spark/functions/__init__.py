"""Engine function library: hashing, vector math, text analysis.

Everything here stays JVM-side (built-in ``pyspark.sql.functions``
compositions → whole-stage codegen); no Python UDFs in hot paths.
"""

from paimon_presto_spark.functions.hashing import md5_long, minhash_exprs
from paimon_presto_spark.functions.vectors import cosine_similarity, dot, l2_norm
from paimon_presto_spark.functions.text import tokens, shingles, token_count
from paimon_presto_spark.functions.timeofday import (
    time_extract,
    time_from_string,
    time_to_string,
)

__all__ = [
    "md5_long",
    "minhash_exprs",
    "time_extract",
    "time_from_string",
    "time_to_string",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "tokens",
    "shingles",
    "token_count",
]
