"""Property test: random upsert/delete command sequences replayed through the
table format must equal a plain dict replay (SURVEY §5 — our upgrade over
the reference's fixed-fixture ITCases).
"""

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

commands = st.lists(
    st.tuples(
        st.sampled_from(["upsert", "delete"]),
        st.lists(
            st.tuples(st.integers(0, 6), st.integers(0, 100)), min_size=1, max_size=4
        ),
    ),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cmds=commands)
def test_mor_equals_dict_replay(spark, tmp_path_factory, cmds):
    from paimon_presto_spark.catalog import Catalog

    wh = tmp_path_factory.mktemp("wh")
    c = Catalog(spark, str(wh))
    c.create_database("d", ignore_if_exists=True)
    t = c.create_table("d", "t", "k int, v int", primary_keys=["k"])

    model: dict[int, int] = {}
    for op, kvs in cmds:
        # within one commit, later rows of the same key win — emulate by
        # dropping duplicate keys (keep last) before the write, which is the
        # deterministic contract we promise for a single batch
        dedup = {}
        for k, v in kvs:
            dedup[k] = v
        df = spark.createDataFrame(list(dedup.items()), "k int, v int")
        if op == "upsert":
            t.upsert(df)
            model.update(dedup)
        else:
            t.delete(df)
            for k in dedup:
                model.pop(k, None)

    got = sorted((r["k"], r["v"]) for r in t.to_df().collect())
    assert got == sorted(model.items())
