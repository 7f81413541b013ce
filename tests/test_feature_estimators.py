"""Estimator (+Model) tests with hand-computed fixtures + save/load round
trips, mirroring KMeansTest.java's 8-case template (SURVEY §5)."""

import math
import os

import numpy as np
import pytest

from flink_ml_spark.feature import (IDF, CountVectorizer, Imputer,
                                    KBinsDiscretizer, MaxAbsScaler,
                                    MinMaxScaler, OneHotEncoder, RobustScaler,
                                    StandardScaler, StringIndexer,
                                    IndexToStringModel, VarianceThresholdSelector,
                                    VectorIndexer)
from flink_ml_spark.api import Stage


@pytest.fixture()
def dense_df(spark):
    return spark.createDataFrame(
        [(1, [1.0, 10.0]), (2, [2.0, 20.0]), (3, [3.0, 30.0]), (4, [4.0, 40.0])],
        "id long, features array<double>")


def test_standard_scaler(spark, dense_df):
    model = StandardScaler(inputCol="features", outputCol="scaled",
                           withMean=True, withStd=True).fit(dense_df)
    got = {r["id"]: r["scaled"] for r in model.transform(dense_df)[0].collect()}
    mean, std = 2.5, np.std([1, 2, 3, 4], ddof=1)
    assert got[1][0] == pytest.approx((1 - mean) / std)
    assert got[4][1] == pytest.approx((40 - 25) / np.std([10, 20, 30, 40], ddof=1))


def test_standard_scaler_save_load(spark, dense_df, tmp_path):
    model = StandardScaler(inputCol="features", outputCol="scaled").fit(dense_df)
    p = str(tmp_path / "ss")
    model.save(p)
    loaded = Stage.load(spark, p)
    a = model.transform(dense_df)[0].collect()
    b = loaded.transform(dense_df)[0].collect()
    assert [r["scaled"] for r in a] == [r["scaled"] for r in b]


def test_minmax_scaler(spark, dense_df):
    model = MinMaxScaler(inputCol="features", outputCol="o").fit(dense_df)
    got = {r["id"]: r["o"] for r in model.transform(dense_df)[0].collect()}
    assert got[1] == pytest.approx([0.0, 0.0])
    assert got[4] == pytest.approx([1.0, 1.0])
    assert got[2] == pytest.approx([1 / 3, 1 / 3])


def test_minmax_constant_dim(spark):
    df = spark.createDataFrame([(1, [5.0]), (2, [5.0])], "id long, features array<double>")
    model = MinMaxScaler(inputCol="features", outputCol="o").fit(df)
    # Emax==Emin → 0.5*(max+min) of target range (MinMaxScaler.java:67)
    assert model.transform(df)[0].collect()[0]["o"] == [0.5]


def test_maxabs_scaler(spark):
    df = spark.createDataFrame([(1, [-4.0, 1.0]), (2, [2.0, -2.0])],
                               "id long, features array<double>")
    model = MaxAbsScaler(inputCol="features", outputCol="o").fit(df)
    got = {r["id"]: r["o"] for r in model.transform(df)[0].collect()}
    assert got[1] == pytest.approx([-1.0, 0.5])


def test_robust_scaler(spark):
    data = [(i, [float(i)]) for i in range(1, 101)]
    df = spark.createDataFrame(data, "id long, features array<double>")
    model = RobustScaler(inputCol="features", outputCol="o",
                         withCentering=True).fit(df)
    med = model.model_data["median"][0]
    rng = model.model_data["range"][0]
    assert med == pytest.approx(50, abs=2)
    assert rng == pytest.approx(50, abs=3)


def test_imputer_mean(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0), (4, float("nan"))], "id long, x double")
    model = Imputer(inputCols=["x"], outputCols=["o"], strategy="mean").fit(df)
    assert model.model_data["surrogates"] == [2.0]
    got = {r["id"]: r["o"] for r in model.transform(df)[0].collect()}
    assert got[2] == 2.0 and got[4] == 2.0 and got[1] == 1.0


def test_imputer_most_frequent(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 3.0), (4, None)], "id long, x double")
    model = Imputer(inputCols=["x"], outputCols=["o"], strategy="most_frequent").fit(df)
    assert model.model_data["surrogates"] == [5.0]


def test_string_indexer_freq_desc(spark):
    df = spark.createDataFrame(
        [(1, "b"), (2, "b"), (3, "a"), (4, "c"), (5, "c"), (6, "c")], ["id", "s"])
    model = StringIndexer(inputCols=["s"], outputCols=["i"],
                          stringOrderType="freqDesc").fit(df)
    assert model.model_data["stringArrays"][0] == ["c", "b", "a"]
    got = {r["id"]: r["i"] for r in model.transform(df)[0].collect()}
    assert got[4] == 0.0 and got[1] == 1.0 and got[3] == 2.0


def test_string_indexer_keep_unseen(spark):
    train = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "s"])
    test = spark.createDataFrame([(1, "a"), (2, "zz")], ["id", "s"])
    model = StringIndexer(inputCols=["s"], outputCols=["i"],
                          stringOrderType="alphabetAsc", handleInvalid="keep").fit(train)
    got = {r["id"]: r["i"] for r in model.transform(test)[0].collect()}
    assert got[1] == 0.0 and got[2] == 2.0


def test_string_indexer_driver_vocab_guard(spark):
    """A high-cardinality column on an uncapped order fails fast with an
    actionable message instead of collecting the whole vocabulary to the
    driver (VERDICT r04 item 6; the reference streams the sort where we
    collect, so this guard is a documented superset)."""
    import pytest
    df = spark.range(500).selectExpr("id", "cast(id as string) AS s")
    with pytest.raises(ValueError, match="maxDriverVocabSize"):
        StringIndexer(inputCols=["s"], outputCols=["i"],
                      stringOrderType="freqAsc",
                      maxDriverVocabSize=100).fit(df)
    # freqDesc with a cap under the guard still fits fine
    m = StringIndexer(inputCols=["s"], outputCols=["i"],
                      stringOrderType="freqDesc", maxIndexNum=50,
                      maxDriverVocabSize=100).fit(df)
    assert len(m.model_data["stringArrays"][0]) == 50


def test_random_splitter_group_split_leakage_safe(spark):
    """String hashCol = leakage-safe group split: every group lands in
    exactly one split, the assignment is repartition-invariant, and the
    proportions roughly follow the weights."""
    from flink_ml_spark.feature import RandomSplitter
    df = spark.range(1000).selectExpr(
        "id", "concat('dom', cast(id % 97 as string)) AS domain")
    s = RandomSplitter(weights=[4.0, 1.0], seed=7,
                       splitStrategy="hash", hashCol="domain")
    tr, ev = s.transform(df)
    tr_doms = {r["domain"] for r in tr.select("domain").distinct().collect()}
    ev_doms = {r["domain"] for r in ev.select("domain").distinct().collect()}
    assert not (tr_doms & ev_doms)          # no group straddles
    assert len(tr_doms) + len(ev_doms) == 97
    n_tr, n_ev = tr.count(), ev.count()
    assert n_tr + n_ev == 1000
    assert 0.6 < n_tr / 1000 < 0.95         # ~80/20 at 97-group granularity
    # pure row function: identical under repartitioning
    tr2, _ = s.transform(df.repartition(13))
    assert {r["id"] for r in tr2.collect()} == {r["id"] for r in tr.collect()}
    # null group keys coalesce to one group instead of vanishing
    dfn = spark.createDataFrame([(1, None), (2, None)],
                                "id long, domain string")
    a, b = s.transform(dfn)
    assert a.count() + b.count() == 2
    assert a.count() in (0, 2)              # both nulls in the same split


def test_index_to_string(spark):
    df = spark.createDataFrame([(1, 0.0), (2, 1.0)], ["id", "i"])
    m = IndexToStringModel(inputCols=["i"], outputCols=["s"]) \
        .set_model_data_arrays([["x", "y"]])
    got = {r["id"]: r["s"] for r in m.transform(df)[0].collect()}
    assert got == {1: "x", 2: "y"}


def test_one_hot_encoder(spark):
    df = spark.createDataFrame([(1, 0.0), (2, 1.0), (3, 2.0)], ["id", "c"])
    model = OneHotEncoder(inputCols=["c"], outputCols=["v"]).fit(df)
    got = {r["id"]: r["v"] for r in model.transform(df)[0].collect()}
    assert got[1]["size"] == 2 and got[1]["indices"] == [0]
    assert got[3]["indices"] == []  # dropLast: last category = all zeros


def test_count_vectorizer(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "a"]), (2, ["b", "c"]), (3, ["b"])], ["id", "t"])
    model = CountVectorizer(inputCol="t", outputCol="v").fit(df)
    # vocab by total term frequency desc: b(3), a(2), c(1)
    assert model.model_data["vocabulary"] == ["b", "a", "c"]
    got = {r["id"]: r["v"] for r in model.transform(df)[0].collect()}
    assert got[1]["indices"] == [0, 1] and got[1]["values"] == [1.0, 2.0]


def test_idf(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 2.0])], "id long, v array<double>")
    model = IDF(inputCol="v", outputCol="o").fit(df)
    idf0 = math.log(3 / 3)
    idf1 = math.log(3 / 2)
    assert model.model_data["idf"] == pytest.approx([idf0, idf1])
    got = {r["id"]: r["o"] for r in model.transform(df)[0].collect()}
    assert got[2] == pytest.approx([0.0, 2 * idf1])


def test_kbins_uniform(spark):
    df = spark.createDataFrame([(i, [float(i)]) for i in range(10)],
                               "id long, features array<double>")
    model = KBinsDiscretizer(inputCol="features", outputCol="o",
                             strategy="uniform", numBins=3).fit(df)
    got = {r["id"]: r["o"] for r in model.transform(df)[0].collect()}
    assert got[0] == [0.0] and got[9] == [2.0]


def test_variance_threshold(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 5.0, 1.0]), (2, [2.0, 5.0, 1.0]), (3, [3.0, 5.0, 1.0])],
        "id long, features array<double>")
    model = VarianceThresholdSelector(inputCol="features", outputCol="o") \
        .fit(df)
    assert model.model_data["indices"] == [0]
    assert model.transform(df)[0].collect()[0]["o"] == [1.0]


def test_vector_indexer(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 10.5]), (2, [1.0, 20.5]), (3, [0.0, 30.5]), (4, [2.0, 40.5])],
        "id long, features array<double>")
    model = VectorIndexer(inputCol="features", outputCol="o",
                          maxCategories=3).fit(df)
    got = {r["id"]: r["o"] for r in model.transform(df)[0].collect()}
    # dim0 categorical {0,1,2} → reindex; dim1 has 4 distinct > 3 → passthrough
    assert got[1] == [0.0, 10.5] and got[4] == [2.0, 40.5]


def test_idf_counts_null_vector_docs(spark):
    """IDF's single-pass fit must count rows with NULL tf vectors in
    n_docs (df.count() semantics): idf = ln((n_docs+1)/(dfreq+1))."""
    import math

    from flink_ml_spark.feature import IDF
    rows = [([1.0, 0.0],), ([1.0, 2.0],), (None,), (None,)]
    df = spark.createDataFrame(rows, "tf array<double>")
    m = IDF(inputCol="tf", outputCol="o").fit(df)
    assert m.model_data["numDocs"] == 4
    # term 0 appears in 2 docs of 4
    assert m.model_data["idf"][0] == pytest.approx(math.log(5 / 3))


def test_target_encoder(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F
    from flink_ml_spark.api import Stage
    from flink_ml_spark.feature import TargetEncoder
    # categories: a -> labels (1,1,0), b -> (0,0), prior = 2/5
    rows = [(1, "a", 1.0), (2, "a", 1.0), (3, "a", 0.0),
            (4, "b", 0.0), (5, "b", 0.0)]
    df = spark.createDataFrame(rows, "id long, category string, label double")
    m = TargetEncoder(inputCol="category", labelCol="label",
                      smoothing=10.0).fit(df)
    prior = 2 / 5
    enc = {r["category"]: r["encoded"] for r in m.transform(df)[0].collect()}
    assert enc["a"] == pytest.approx((2 + 10 * prior) / (3 + 10))
    assert enc["b"] == pytest.approx((0 + 10 * prior) / (2 + 10))
    # unseen category -> prior
    new = spark.createDataFrame([(9, "zzz")], "id long, category string")
    assert m.transform(new)[0].first()["encoded"] == pytest.approx(prior)
    # smoothing -> prior as m -> inf, -> raw mean as m -> 0
    m0 = TargetEncoder(inputCol="category", labelCol="label",
                       smoothing=0.0).fit(df)
    e0 = {r["category"]: r["encoded"] for r in m0.transform(df)[0].collect()}
    assert e0["a"] == pytest.approx(2 / 3) and e0["b"] == 0.0
    # out-of-fold: a row's own label never contributes to its encoding.
    # single category, labels differ by row: with k=numFolds greater than
    # n each row is its own fold -> leave-one-out exactly
    rows2 = [(i, "c", float(i % 2)) for i in range(6)]
    df2 = spark.createDataFrame(rows2, "id long, category string, label double")
    m2 = TargetEncoder(inputCol="category", labelCol="label",
                       smoothing=0.0).fit(df2)
    m2.set(type(m2).numFolds, 1009)  # ~one row per fold
    oof = m2.transform_oof(df2).collect()
    tot = sum(r % 2 for r in range(6))  # 3 positives
    for r in oof:
        own = r["label"]
        # leave-one-out mean of the others
        exp = (tot - own) / 5
        assert r["encoded"] == pytest.approx(exp), r
    # save/load round-trip preserves stats and prior
    p = str(tmp_path / "te")
    m.save(p)
    back = Stage.load(spark, p)
    enc2 = {r["category"]: r["encoded"] for r in back.transform(df)[0].collect()}
    assert enc2 == pytest.approx(enc)
    # id-like category guard
    ids = spark.createDataFrame([(i, str(i), 1.0) for i in range(100)],
                                "id long, category string, label double")
    with pytest.raises(ValueError, match="maxCategories"):
        TargetEncoder(inputCol="category", labelCol="label",
                      maxCategories=10).fit(ids)
    # numeric category column: encoding is string-keyed so the model
    # survives save/load unchanged (ADVICE r05: load forced '__cat__
    # string' while a fresh fit kept native dtype — reloads missed)
    numdf = spark.createDataFrame(
        [(1, 10, 1.0), (2, 10, 1.0), (3, 10, 0.0),
         (4, 20, 0.0), (5, 20, 0.0)],
        "id long, category int, label double")
    mnum = TargetEncoder(inputCol="category", labelCol="label",
                         smoothing=0.0).fit(numdf)
    mnum.save(str(tmp_path / "te_num"))
    backn = Stage.load(spark, str(tmp_path / "te_num"))
    for mm in (mnum, backn):
        en = {r["category"]: r["encoded"]
              for r in mm.transform(numdf)[0].collect()}
        assert en[10] == pytest.approx(2 / 3) and en[20] == 0.0
    oofn = mnum.transform_oof(numdf)
    assert oofn.filter(F.col("encoded").isNull()).count() == 0
