"""Property test: the bucketed weighted-quantile decomposition equals
the one-window SQL spelling on ARBITRARY inputs — groups of any shape,
heavy value ties, zero weights, zero-total groups, quantiles at any
rational threshold, and edge budgets small enough to force multi-level
recursion. The fixed fixtures in test_operators.py pin known shapes;
this pins the algebra.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window

# rows: (group ∈ 4 labels, value from a SMALL float pool so ties are
# common, integer weight ≥ 0 with zeros likely)
rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d"]),
        st.sampled_from([0.0, 1.0, 1.5, 2.0, 2.0, 3.0, 7.5, -4.0, 100.0]),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=60,
)

quantile_strategy = st.sampled_from([(1, 2), (1, 4), (3, 4), (1, 10), (9, 10)])


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=rows_strategy,
    q=quantile_strategy,
    ter=st.sampled_from([2, 7, 100_000]),
)
def test_weighted_quantile_equals_window_spelling(spark, rows, q, ter):
    from paimon_presto_spark.operators.quantile import weighted_quantiles

    q_num, q_den = q
    df = spark.createDataFrame(rows, "g string, v double, w long")

    DEC = "decimal(28,10)"
    wo = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("g")
    c = df.select(
        "g",
        "v",
        F.sum(F.col("w").cast(DEC)).over(wo).alias("cum"),
        F.sum(F.col("w").cast(DEC)).over(wp).alias("tot"),
    )
    ref = {
        r["g"]: r["m"]
        for r in (
            c.filter(
                F.lit(q_den) * F.col("cum") >= F.lit(q_num) * F.col("tot")
            )
            .groupBy("g")
            .agg(F.min("v").alias("m"))
            .collect()
        )
    }
    got = weighted_quantiles(
        df, "v", "w", ["g"], [(q_num, q_den, "qv")], target_edge_rows=ter
    ).collect()
    assert {r["g"] for r in got} == set(ref)
    for r in got:
        assert r["qv"] == ref[r["g"]], (r["g"], ter, q)
