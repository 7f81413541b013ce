"""CooccurrenceCounter: hand-computed pair counts, window semantics,
marginals/lift, minCount."""

import pytest

from flink_ml_spark.llmdata import CooccurrenceCounter


def _rows(out):
    return {(r["w1"], r["w2"]): r for r in out.collect()}


def test_cooccurrence_hand_counts(spark):
    # "a b c a b": offset-1 pairs ab,bc,ac(c-a),ab; offset-2 ac,ab(b-a),bc
    # "b a": offset-1 ab
    df = spark.createDataFrame([("a b c a b",), ("b a",)], "text string")
    got = _rows(CooccurrenceCounter(inputCol="text",
                                    windowSize=2).transform(df)[0])
    assert got[("a", "b")]["cnt"] == 4
    assert got[("a", "c")]["cnt"] == 2
    assert got[("b", "c")]["cnt"] == 2
    r = got[("a", "b")]
    assert (r["cnt_w1"], r["cnt_w2"], r["total"]) == (3, 3, 7)
    assert r["lift"] == pytest.approx(4 * 7 / (3 * 3))


def test_cooccurrence_window_one_is_adjacent_only(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    got = _rows(CooccurrenceCounter(inputCol="text",
                                    windowSize=1).transform(df)[0])
    assert set(got) == {("a", "b"), ("b", "c")}


def test_cooccurrence_self_pair_and_min_count(spark):
    df = spark.createDataFrame([("x x y",), ("x y",)], "text string")
    out = CooccurrenceCounter(inputCol="text", windowSize=1,
                              minCount=2).transform(df)[0]
    got = _rows(out)
    # (x,y) appears twice (adjacent in both docs); (x,x) only once -> cut
    assert set(got) == {("x", "y")}
    assert got[("x", "y")]["cnt"] == 2


def test_cooccurrence_short_docs_yield_nothing(spark):
    df = spark.createDataFrame([("solo",), ("",)], "text string")
    out = CooccurrenceCounter(inputCol="text",
                              windowSize=3).transform(df)[0]
    assert out.count() == 0
