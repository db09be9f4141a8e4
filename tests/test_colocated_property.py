"""Property test: the co-located bucket join must equal Spark's own join
for arbitrary key universes, bucket counts, overlaps, and join types —
including after a random mutation batch on the right table (upserts +
deletes), so the equivalence holds over MERGED state, not just first
writes. (SURVEY §5 — the same random-replay upgrade over fixed fixtures
the merge-on-read property test applies.)"""

import itertools

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from paimon_presto_spark.sources.colocated import colocated_join

_seq = itertools.count()

cases = st.tuples(
    st.sampled_from([1, 2, 4, 8]),                      # bucket count
    st.sets(st.integers(0, 40), min_size=0, max_size=25),   # left keys
    st.sets(st.integers(0, 40), min_size=0, max_size=25),   # right keys
    st.sampled_from(["inner", "left"]),
    st.lists(                                           # right mutations
        st.tuples(
            st.sampled_from(["upsert", "delete"]),
            st.sets(st.integers(0, 40), min_size=1, max_size=6),
        ),
        min_size=0,
        max_size=3,
    ),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=cases)
def test_colocated_equals_spark_join(spark, tmp_path_factory, case):
    from paimon_presto_spark.catalog import Catalog

    buckets, lkeys, rkeys, how, mutations = case
    n = next(_seq)
    wh = str(tmp_path_factory.mktemp(f"coloc_prop_{n}"))
    cat = Catalog(spark, wh)
    cat.create_database("p")

    def df(keys, valcol, off):
        rows = [(k, k + off) for k in sorted(keys)]
        return spark.createDataFrame(
            rows or [(None, None)], f"k bigint, {valcol} bigint"
        ).filter(F.col("k").isNotNull())

    tl = cat.create_table(
        "p", "l", "k bigint, lv bigint", primary_keys=["k"],
        options={"bucket": str(buckets)},
    )
    tl.upsert(df(lkeys, "lv", 1000))
    tr = cat.create_table(
        "p", "r", "k bigint, rv bigint", primary_keys=["k"],
        options={"bucket": str(buckets)},
    )
    tr.upsert(df(rkeys, "rv", 2000))

    # replay mutations on the right side through table AND dict oracle
    rstate = {k: k + 2000 for k in rkeys}
    for i, (op, keys) in enumerate(mutations):
        if op == "upsert":
            tr.upsert(df(keys, "rv", 3000 + i))
            rstate.update({k: k + 3000 + i for k in keys})
        else:
            tr.delete(df(keys, "rv", 0))
            for k in keys:
                rstate.pop(k, None)

    got = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in colocated_join(spark, tl, tr, left_on="k", how=how).collect()
    )
    if how == "inner":
        exp = sorted(
            (k, k + 1000, rstate[k]) for k in lkeys if k in rstate
        )
    else:
        exp = sorted((k, k + 1000, rstate.get(k)) for k in lkeys)
    assert got == exp


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    case=st.tuples(
        st.sampled_from([2, 4, 8]),                        # bucket count
        st.sets(st.integers(0, 60), min_size=3, max_size=20),  # keys
        st.integers(0, 60),                                # probe key
    )
)
def test_pinned_lookup_equals_filter_and_plans_one_split(
    spark, tmp_path_factory, case
):
    """For ANY bucket count and key universe, a key-equality probe
    through the colocated join (a) plans exactly ONE split and (b)
    returns exactly the rows the unpruned join filtered to that key —
    whether or not the probe key exists on either side. Fresh handle per
    query (tests/test_pushdown_reuse.py explains why)."""
    from paimon_presto_spark.catalog import Catalog

    buckets, keys, probe = case
    n = next(_seq)
    wh = str(tmp_path_factory.mktemp(f"coloc_pin_{n}"))
    cat = Catalog(spark, wh)
    cat.create_database("p")
    left = spark.createDataFrame(
        [(k, k + 1000) for k in sorted(keys)], "k bigint, lv bigint"
    )
    right = spark.createDataFrame(
        [(k, k + 2000) for k in sorted(keys) if k % 2 == 0],
        "k bigint, rv bigint",
    )
    tl = cat.create_table(
        "p", "pl", "k bigint, lv bigint", primary_keys=["k"],
        options={"bucket": str(buckets)},
    )
    tl.upsert(left)
    tr = cat.create_table(
        "p", "pr", "k bigint, rv bigint", primary_keys=["k"],
        options={"bucket": str(buckets)},
    )
    tr.upsert(right)

    def j():
        return colocated_join(spark, tl, tr, left_on="k", how="left")

    pinned = j().filter(F.col("k") == probe)
    assert pinned.rdd.getNumPartitions() == 1
    got = sorted(tuple(r) for r in pinned.collect())
    exp = sorted(
        tuple(r) for r in j().collect() if r["k"] == probe
    )
    assert got == exp
