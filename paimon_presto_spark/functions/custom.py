"""Engine-registered custom functions (SURVEY §2.2 UDF/UDAF surface).

The reference's inherited suite registers custom scalar/aggregate/window
functions with the host engine and runs them over connector tables
(``testCustomAdd``/``testCustomSum``/``testCustomRank``,
``PrestoDistributedQueryTest.java:339-353``). Spark's registration points,
in preference order:

- **SQL UDF** (``CREATE TEMPORARY FUNCTION ... RETURN <expr>``): the body
  inlines into the Catalyst plan — whole-stage codegen, zero Python, the
  fast path for anything expression-shaped. ``custom_add`` lives here.
- **pandas grouped-agg UDF**: Arrow-batched aggregate for genuinely
  imperative reductions. ``custom_sum`` lives here (deliberately spelled
  as a UDAF even though SUM exists — it is the registration-surface test,
  not a new aggregate).
- Custom *window* functions have no public Spark extension point;
  Presto's ``testCustomRank`` maps to the built-in ``rank()`` (SURVEY
  §2.2 marks this delegation as accepted parity).

Registration is idempotent per session — safe to call from every query.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf


def register_custom_functions(spark: SparkSession) -> None:
    """Register ``custom_add`` (SQL UDF) and ``custom_sum`` (pandas UDAF)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION custom_add(a BIGINT, b BIGINT) "
        "RETURNS BIGINT RETURN a + b"
    )

    @pandas_udf("double")
    def custom_sum(v: pd.Series) -> float:
        # exact for integer-valued doubles below 2^53 (the test columns),
        # hence order-independent under partial aggregation
        return float(v.sum())

    spark.udf.register("custom_sum", custom_sum)
