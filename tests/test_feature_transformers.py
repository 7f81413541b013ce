"""Per-stage tests for stateless transformers, mirroring the reference's
test template (SURVEY §5: testParam / testOutputSchema / testTransform
with inlined golden fixtures)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_ml_spark.feature import (DCT, Binarizer, Bucketizer,
                                    ElementwiseProduct, FeatureHasher,
                                    HashingTF, Interaction, NGram, Normalizer,
                                    PolynomialExpansion, RegexTokenizer,
                                    SQLTransformer, StopWordsRemover,
                                    Tokenizer, VectorAssembler, VectorSlicer)


def rows(df, *cols):
    return [tuple(r[c] for c in cols) for r in df.orderBy(cols[0]).collect()]


def test_tokenizer(spark):
    df = spark.createDataFrame([(1, "Hello  World FOO"), (2, "a b")], ["id", "text"])
    out = Tokenizer(inputCol="text", outputCol="toks").transform(df)[0]
    got = {r["id"]: r["toks"] for r in out.collect()}
    assert got[1] == ["hello", "world", "foo"]
    assert got[2] == ["a", "b"]


def test_regex_tokenizer(spark):
    df = spark.createDataFrame([(1, "a1B2c33")], ["id", "text"])
    t = RegexTokenizer(inputCol="text", outputCol="toks", pattern="[0-9]+")
    assert t.transform(df)[0].collect()[0]["toks"] == ["a", "b", "c"]
    t2 = RegexTokenizer(inputCol="text", outputCol="toks", pattern="[0-9]+", gaps=False)
    assert t2.transform(df)[0].collect()[0]["toks"] == ["1", "2", "33"]


def test_binarizer(spark):
    df = spark.createDataFrame([(1, 0.5, [0.1, 0.9])], ["id", "x", "v"])
    b = Binarizer(inputCols=["x", "v"], outputCols=["xo", "vo"], thresholds=[0.4, 0.5])
    r = b.transform(df)[0].collect()[0]
    assert r["xo"] == 1.0 and r["vo"] == [0.0, 1.0]


def test_bucketizer_keep_skip(spark):
    df = spark.createDataFrame([(1, 0.5), (2, 15.0), (3, float("nan"))], ["id", "x"])
    b = Bucketizer(inputCols=["x"], outputCols=["o"],
                   splitsArray=[[0.0, 1.0, 10.0]], handleInvalid="keep")
    got = {r["id"]: r["o"] for r in b.transform(df)[0].collect()}
    assert got == {1: 0.0, 2: 2.0, 3: 2.0}
    b2 = Bucketizer(inputCols=["x"], outputCols=["o"],
                    splitsArray=[[0.0, 1.0, 10.0]], handleInvalid="skip")
    assert b2.transform(df)[0].count() == 1


def test_elementwise_product(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], ["id", "v"])
    t = ElementwiseProduct(inputCol="v", outputCol="o", scalingVec=[2.0, 0.5, 1.0])
    assert t.transform(df)[0].collect()[0]["o"] == [2.0, 1.0, 3.0]


def test_normalizer(spark):
    df = spark.createDataFrame([(1, [3.0, 4.0])], ["id", "v"])
    t = Normalizer(inputCol="v", outputCol="o", p=2.0)
    assert t.transform(df)[0].collect()[0]["o"] == [0.6, 0.8]
    t1 = Normalizer(inputCol="v", outputCol="o", p=1.0)
    out = t1.transform(df)[0].collect()[0]["o"]
    assert out == pytest.approx([3 / 7, 4 / 7])


def test_vector_slicer(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0, 4.0])], ["id", "v"])
    t = VectorSlicer(inputCol="v", outputCol="o", indices=[3, 1])
    assert t.transform(df)[0].collect()[0]["o"] == [4.0, 2.0]


def test_interaction(spark):
    df = spark.createDataFrame([(1, 2.0, [3.0, 4.0], [5.0])], ["id", "x", "v", "w"])
    t = Interaction(inputCols=["x", "v", "w"], outputCol="o")
    assert t.transform(df)[0].collect()[0]["o"] == [30.0, 40.0]


def test_ngram(spark):
    df = spark.createDataFrame([(1, ["a", "b", "c", "d"]), (2, ["x"])], ["id", "t"])
    t = NGram(inputCol="t", outputCol="o", n=2)
    got = {r["id"]: r["o"] for r in t.transform(df)[0].collect()}
    assert got[1] == ["a b", "b c", "c d"]
    assert got[2] == []


def test_stop_words_remover(spark):
    df = spark.createDataFrame([(1, ["The", "quick", "fox", "of", "doom"])], ["id", "t"])
    t = StopWordsRemover(inputCols=["t"], outputCols=["o"])
    assert t.transform(df)[0].collect()[0]["o"] == ["quick", "fox", "doom"]


def test_vector_assembler_keep(spark):
    df = spark.createDataFrame(
        [(1, 1.0, [2.0, 3.0]), (2, None, [4.0, 5.0]), (3, 6.0, None)],
        "id long, x double, v array<double>")
    t = VectorAssembler(inputCols=["x", "v"], outputCol="o",
                        inputSizes=[1, 2], handleInvalid="keep")
    got = {r["id"]: r["o"] for r in t.transform(df)[0].collect()}
    assert got[1] == [1.0, 2.0, 3.0]
    assert math.isnan(got[2][0]) and got[2][1:] == [4.0, 5.0]
    assert got[3][0] == 6.0 and all(math.isnan(x) for x in got[3][1:])
    t2 = VectorAssembler(inputCols=["x", "v"], outputCol="o",
                         inputSizes=[1, 2], handleInvalid="skip")
    assert t2.transform(df)[0].count() == 1


def test_sql_transformer(spark):
    df = spark.createDataFrame([(1, -2.0)], ["id", "v1"])
    t = SQLTransformer(statement="SELECT *, ABS(v1) AS v2 FROM __THIS__")
    assert t.transform(df)[0].collect()[0]["v2"] == 2.0


def test_hashingtf(spark):
    df = spark.createDataFrame([(1, ["a", "b", "a", "c"])], ["id", "t"])
    t = HashingTF(inputCol="t", outputCol="o", numFeatures=16, hashAlgorithm="poly")
    r = t.transform(df)[0].collect()[0]["o"]
    assert r["size"] == 16
    assert sorted(r["values"]) == [1.0, 1.0, 2.0]
    # poly hash is reproducible: h('a') = 97 % 16
    assert (97 % 16) in r["indices"]


def test_feature_hasher(spark):
    df = spark.createDataFrame([(1, 2.5, "x")], ["id", "num", "cat"])
    t = FeatureHasher(inputCols=["num", "cat"], outputCol="o",
                      categoricalCols=["cat"], numFeatures=32, hashAlgorithm="poly")
    r = t.transform(df)[0].collect()[0]["o"]
    assert r["size"] == 32 and sorted(r["values"]) == [1.0, 2.5]


def test_dct(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0, 4.0])], ["id", "v"])
    out = DCT(inputCol="v", outputCol="o").transform(df)[0].collect()[0]["o"]
    x = np.array([1.0, 2.0, 3.0, 4.0])
    from flink_ml_spark.feature.dct import dct2_matrix
    expected = dct2_matrix(4) @ x
    assert np.allclose(out, expected)
    # round-trip via inverse
    df2 = spark.createDataFrame([(1, [float(v) for v in expected])], ["id", "v"])
    back = DCT(inputCol="v", outputCol="o", inverse=True).transform(df2)[0].collect()[0]["o"]
    assert np.allclose(back, x)


def test_polynomial_expansion(spark):
    df = spark.createDataFrame([(1, [2.0, 3.0])], ["id", "v"])
    out = PolynomialExpansion(inputCol="v", outputCol="o", degree=2) \
        .transform(df)[0].collect()[0]["o"]
    assert sorted(out) == sorted([2.0, 4.0, 3.0, 9.0, 6.0])


def test_feature_hasher_high_cardinality_fallback(spark, monkeypatch):
    # a categorical column with more distincts than the poly-map cap must
    # fall back to the expression hash with IDENTICAL outputs (and never
    # materialize its full distinct set driver-side)
    import flink_ml_spark.feature.hashingtf as H
    df = spark.createDataFrame(
        [(i, f"u{i}", "c%d" % (i % 3)) for i in range(300)],
        "id long, uid string, cat string")

    def run():
        h = H.FeatureHasher(inputCols=["uid", "cat"], outputCol="f",
                            numFeatures=64).set_(hashAlgorithm="poly")
        return {r["id"]: (r["f"]["indices"], r["f"]["values"])
                for r in h._transform(df).select("id", "f").collect()}

    full = run()                      # cap 4096: both columns poly-mapped
    monkeypatch.setattr(H, "MAX_MAP_DISTINCTS", 8)
    capped = run()                    # uid (300 distincts) trips the cap
    assert capped == full


def test_winsorizer(spark, tmp_path):
    import pytest
    from flink_ml_spark.api import Stage
    from flink_ml_spark.feature import Winsorizer
    # values 1..100; p10/p90 exact-interpolated bounds
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)],
                               "x double")
    m = Winsorizer(inputCols=["x"], outputCols=["xc"], lower=0.1, upper=0.9,
                   exactQuantiles=True).fit(df)
    lo, hi = m.model_data["bounds"]["x"]
    # PERCENTILE_CONT on 1..100: p10 = 10.9, p90 = 90.1
    assert lo == pytest.approx(10.9) and hi == pytest.approx(90.1)
    vals = {r["x"]: r["xc"] for r in m.transform(df)[0].collect()}
    assert vals[1.0] == pytest.approx(10.9)      # clipped up
    assert vals[100.0] == pytest.approx(90.1)    # clipped down
    assert vals[50.0] == 50.0                    # interior untouched
    # transform_local parity
    import pandas as pd
    loc = m.transform_local(pd.DataFrame({"x": [1.0, 50.0, 100.0]}))
    assert list(loc["xc"]) == pytest.approx([10.9, 50.0, 90.1])
    # save/load
    p = str(tmp_path / "w")
    m.save(p)
    back = Stage.load(spark, p)
    # JSON round-trip stores the tuple as a list
    assert list(back.model_data["bounds"]["x"]) == pytest.approx([10.9, 90.1])
    # invalid quantile ordering fails fast
    with pytest.raises(ValueError, match="must be <"):
        Winsorizer(inputCols=["x"], lower=0.9, upper=0.1).fit(df)
    # all-null column fails loudly
    nulls = spark.createDataFrame([(None,), (None,)], "x double")
    with pytest.raises(ValueError, match="no non-null"):
        Winsorizer(inputCols=["x"], exactQuantiles=True).fit(nulls)


def test_rare_category_collapser(spark, tmp_path):
    import pytest
    from flink_ml_spark.api import Stage
    from flink_ml_spark.feature import RareCategoryCollapser
    rows = [("a",)] * 10 + [("b",)] * 5 + [("c",)] * 1 + [("d",)] * 1
    df = spark.createDataFrame(rows, "category string")
    m = RareCategoryCollapser(inputCol="category", outputCol="c2",
                              minCount=3).fit(df)
    got = {(r["category"], r["c2"]) for r in m.transform(df)[0].collect()}
    assert got == {("a", "a"), ("b", "b"), ("c", "__other__"),
                   ("d", "__other__")}
    assert m.model_data["threshold"] == 3
    # minFraction is scale-invariant: same keep set after duplication
    df3 = df.union(df).union(df)
    mf = RareCategoryCollapser(inputCol="category", minFraction=0.2).fit(df3)
    got3 = {(r["category"], r["collapsed"]) for r in
            mf.transform(df3)[0].collect()}
    assert got3 == {("a", "a"), ("b", "b"), ("c", "__other__"),
                    ("d", "__other__")}
    # unseen category at transform time collapses (not in keep set)
    new = spark.createDataFrame([("zzz",)], "category string")
    assert m.transform(new)[0].first()["c2"] == "__other__"
    # transform_local parity + save/load
    import pandas as pd
    loc = m.transform_local(pd.DataFrame({"category": ["a", "c", "zzz"]}))
    assert list(loc["c2"]) == ["a", "__other__", "__other__"]
    p = str(tmp_path / "rc")
    m.save(p)
    back = Stage.load(spark, p)
    got_b = {(r["category"], r["c2"]) for r in back.transform(df)[0].collect()}
    assert got_b == got
    # ceil semantics at the exact fraction boundary (ADVICE r05: floor
    # kept categories strictly BELOW the documented count/n >= minFraction
    # rule): n=20, minFraction=0.25 -> threshold 5; a count-4 category
    # (4/20 = 0.2 < 0.25) collapses, a count-5 one (exactly 0.25) stays
    edge = spark.createDataFrame(
        [("x",)] * 11 + [("y",)] * 5 + [("z",)] * 4, "category string")
    me = RareCategoryCollapser(inputCol="category", minCount=0,
                               minFraction=0.25).fit(edge)
    assert me.model_data["threshold"] == 5
    gote = {(r["category"], r["collapsed"]) for r in
            me.transform(edge)[0].collect()}
    assert gote == {("x", "x"), ("y", "y"), ("z", "__other__")}
    # numeric category column: keep set is string-keyed and survives
    # save/load (ADVICE r05: load forced strings, fresh fit did not)
    num = spark.createDataFrame([(1,)] * 5 + [(2,)] * 1, "category int")
    mn = RareCategoryCollapser(inputCol="category", minCount=3).fit(num)
    mn.save(str(tmp_path / "rcn"))
    backn = Stage.load(spark, str(tmp_path / "rcn"))
    for mm in (mn, backn):
        gn = {(r["category"], r["collapsed"])
              for r in mm.transform(num)[0].collect()}
        assert gn == {(1, "1"), (2, "__other__")}
