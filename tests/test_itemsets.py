"""FrequentItemsets: hand-checkable baskets, prune correctness, rules."""

import pytest
from pyspark.sql import functions as F

from flink_ml_spark.llmdata import FrequentItemsets


@pytest.fixture()
def baskets(spark):
    rows = [
        (1, ["a", "b", "c"]),
        (2, ["a", "b"]),
        (3, ["a", "b", "c"]),
        (4, ["a", "c"]),
        (5, ["b", "c"]),
        (6, ["a"]),
        (7, ["d"]),          # infrequent item
        (8, ["a", "b", "c"]),
    ]
    return spark.createDataFrame(rows, "tid long, items array<string>")


def test_itemsets_hand_counts(spark, baskets):
    sets, rules = FrequentItemsets(minSupport=0.25).transform(baskets)
    got = {tuple(r["items"]): r["support"] for r in sets.collect()}
    # n=8, min count = ceil(0.25*8) = 2
    assert got[("a",)] == 6 and got[("b",)] == 5 and got[("c",)] == 5
    assert ("d",) not in got
    assert got[("a", "b")] == 4 and got[("a", "c")] == 4 \
        and got[("b", "c")] == 4
    assert got[("a", "b", "c")] == 3
    rule = {(r["antecedent"], r["consequent"]):
            (r["support_pair"], r["support_ante"])
            for r in rules.collect()}
    assert rule[("a", "b")] == (4, 6)
    assert rule[("b", "a")] == (4, 5)
    conf = {(r["antecedent"], r["consequent"]): r["confidence"]
            for r in rules.collect()}
    assert conf[("a", "b")] == pytest.approx(4 / 6)


def test_itemsets_support_threshold_and_sizes(spark, baskets):
    # min count = ceil(0.5*8) = 4: the triple (support 3) must vanish
    sets, _ = FrequentItemsets(minSupport=0.5).transform(baskets)
    sizes = {tuple(r["items"]): r["size"] for r in sets.collect()}
    assert all(len(k) == s for k, s in sizes.items())
    assert max(s for s in sizes.values()) == 2
    # maxSize=1 mines only singletons
    s1, r1 = FrequentItemsets(minSupport=0.25, maxSize=1) \
        .transform(baskets)
    assert {len(r["items"]) for r in s1.collect()} == {1}
    assert r1.count() == 0


def test_itemsets_scalar_item_column(spark):
    rows = [(t, i) for t, items in
            [(1, "ab"), (2, "ab"), (3, "b")] for i in items]
    df = spark.createDataFrame(rows, "tid long, item string")
    sets, _ = FrequentItemsets(itemsCol="item", minSupport=0.5) \
        .transform(df)
    got = {tuple(r["items"]): r["support"] for r in sets.collect()}
    assert got[("a",)] == 2 and got[("b",)] == 3 and got[("a", "b")] == 2


def test_itemsets_hot_basket_guard(spark):
    big = spark.createDataFrame(
        [(1, [f"i{k}" for k in range(50)])] * 4,
        "tid long, items array<string>")
    with pytest.raises(ValueError, match="maxItemsPerTransaction"):
        FrequentItemsets(minSupport=0.5, maxItemsPerTransaction=10) \
            .transform(big)


def test_itemsets_empty(spark):
    empty = spark.createDataFrame([], "tid long, items array<string>")
    sets, rules = FrequentItemsets().transform(empty)
    assert sets.count() == 0 and rules.count() == 0
