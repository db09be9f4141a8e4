"""Predicate-model unit tests — per-operator coverage mirroring
``PrestoFilterConverterTest.java:48-126`` (isNull/notNull/lt/ltEq/gt/gtEq/
eq/in, AND of columns, OR of ranges, unsupported-shape safety).
"""

from paimon_presto_spark.plans.predicate import P
from paimon_presto_spark.table import _split_conjuncts

STATS = {"a": {"min": 10, "max": 20, "null_count": 0},
         "s": {"min": "bbb", "max": "ddd", "null_count": 3}}
ROWS = 100


def test_eq():
    assert P.eq("a", 15).test_stats(STATS, ROWS)
    assert P.eq("a", 10).test_stats(STATS, ROWS)
    assert not P.eq("a", 9).test_stats(STATS, ROWS)
    assert not P.eq("a", 21).test_stats(STATS, ROWS)


def test_ranges():
    assert not P.lt("a", 10).test_stats(STATS, ROWS)
    assert P.lt("a", 11).test_stats(STATS, ROWS)
    assert P.lte("a", 10).test_stats(STATS, ROWS)
    assert not P.lte("a", 9).test_stats(STATS, ROWS)
    assert not P.gt("a", 20).test_stats(STATS, ROWS)
    assert P.gt("a", 19).test_stats(STATS, ROWS)
    assert P.gte("a", 20).test_stats(STATS, ROWS)
    assert not P.gte("a", 21).test_stats(STATS, ROWS)


def test_in():
    assert P.in_("a", [1, 2, 15]).test_stats(STATS, ROWS)
    assert not P.in_("a", [1, 2, 30]).test_stats(STATS, ROWS)


def test_null():
    assert not P.is_null("a").test_stats(STATS, ROWS)
    assert P.is_null("s").test_stats(STATS, ROWS)
    assert P.not_null("a").test_stats(STATS, ROWS)
    all_null = {"a": {"min": None, "max": None, "null_count": 100}}
    assert P.is_null("a").test_stats(all_null, ROWS)
    assert not P.not_null("a").test_stats(all_null, ROWS)


def test_string_range():
    assert P.eq("s", "ccc").test_stats(STATS, ROWS)
    assert not P.eq("s", "aaa").test_stats(STATS, ROWS)


def test_and_or():
    assert (P.gte("a", 15) & P.lte("a", 18)).test_stats(STATS, ROWS)
    assert not (P.gte("a", 15) & P.lt("a", 12)).test_stats(STATS, ROWS)
    assert (P.eq("a", 5) | P.eq("a", 15)).test_stats(STATS, ROWS)
    assert not (P.eq("a", 5) | P.eq("a", 30)).test_stats(STATS, ROWS)


def test_missing_stats_safe():
    # columns without stats (nested types etc.) must never skip — mirrors
    # the reference refusing to push structural types (:121-127)
    assert P.eq("nope", 1).test_stats(STATS, ROWS)
    assert P.eq("a", "incomparable-type").test_stats(STATS, ROWS)


def test_row_eval():
    row = {"pt": "20241103", "i2": 1}
    assert P.eq("pt", "20241103").test_row(row)
    assert (P.eq("pt", "20241103") & P.eq("i2", 1)).test_row(row)
    assert not P.eq("i2", 2).test_row(row)
    assert P.in_("i2", [1, 5]).test_row(row)
    assert not P.is_null("pt").test_row(row)


def test_to_spark_roundtrip(spark):
    df = spark.createDataFrame([(1, "x"), (5, None), (9, "y")], "a int, s string")
    got = sorted(r["a"] for r in df.filter(
        (P.between("a", 2, 9) & P.not_null("s")).to_spark()).collect())
    assert got == [9]


def test_split_conjuncts():
    assert _split_conjuncts("a = 1 AND b = 2") == ["a = 1", "b = 2"]
    assert _split_conjuncts("upper(x) = 'A AND B' AND y < 3") == [
        "upper(x) = 'A AND B'", "y < 3"]
    assert _split_conjuncts("(a = 1 AND b = 2) OR c = 3") == ["(a = 1 AND b = 2) OR c = 3"]
    assert _split_conjuncts("a and b") == ["a", "b"]
    assert _split_conjuncts("android = 1") == ["android = 1"]


class TestStartsWith:
    """LIKE-prefix predicate: stats skipping on [prefix, successor)."""

    def test_stats_skipping(self):
        from paimon_presto_spark.plans.predicate import P

        pred = P.starts_with("s", "ban")
        hit = {"s": {"min": "apple", "max": "cherry", "null_count": 0}}
        below = {"s": {"min": "aaa", "max": "ba", "null_count": 0}}
        above = {"s": {"min": "bao", "max": "zzz", "null_count": 0}}
        exact = {"s": {"min": "ban", "max": "ban", "null_count": 0}}
        assert pred.test_stats(hit, 10)
        assert not pred.test_stats(below, 10)   # max < 'ban'
        assert not pred.test_stats(above, 10)   # min >= 'bao'
        assert pred.test_stats(exact, 10)
        assert pred.test_stats({}, 10)          # no stats → keep

    def test_row_and_spark(self, spark):
        from paimon_presto_spark.plans.predicate import P

        pred = P.starts_with("s", "ab")
        assert pred.test_row({"s": "abc"}) and not pred.test_row({"s": "xa"})
        assert not pred.test_row({"s": None})
        df = spark.createDataFrame([("abc",), ("xyz",), (None,)], "s string")
        assert [r["s"] for r in df.filter(pred.to_spark()).collect()] == ["abc"]

    def test_file_skipping_end_to_end(self, spark, catalog):
        from paimon_presto_spark.plans.predicate import P

        t = catalog.create_table("default", "swt", "name string, v int")
        for prefix in ("alpha", "beta", "gamma"):
            t.append(spark.createDataFrame(
                [(f"{prefix}_{i}", i) for i in range(10)],
                "name string, v int").coalesce(1))
        scan = t.scan(predicate=P.starts_with("name", "beta"))
        assert scan.to_df().count() == 10
        assert scan.last_plan["after_stats_skip"] == 1  # only the beta file
