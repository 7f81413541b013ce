"""Learner tests with sklearn-equivalent hand-computed expectations
(reference fixture style, e.g. KMeansTest.java:64-85)."""

import numpy as np
import pytest

from flink_ml_spark.classification import (Knn, LinearSVC, LogisticRegression,
                                           NaiveBayes)
from flink_ml_spark.clustering import KMeans
from flink_ml_spark.regression import LinearRegression
from flink_ml_spark.api import Stage


def test_kmeans_two_clusters(spark):
    # the reference's 6-point two-cluster golden set (KMeansTest.java:64-72)
    pts = [(0.0, 0.0), (0.0, 0.3), (0.3, 0.0), (9.0, 0.0), (9.0, 0.6), (9.6, 0.0)]
    df = spark.createDataFrame([(i, list(p)) for i, p in enumerate(pts)],
                               "id long, features array<double>")
    model = KMeans(k=2, maxIter=20, initMode="first_distinct", seed=1).fit(df)
    out = {r["id"]: r["prediction"] for r in model.transform(df)[0].collect()}
    assert out[0] == out[1] == out[2]
    assert out[3] == out[4] == out[5]
    assert out[0] != out[3]
    centers = sorted(np.array(model.model_data["centroids"]).tolist())
    assert centers[0] == pytest.approx([0.1, 0.1])
    assert centers[1] == pytest.approx([9.2, 0.2])


def test_kmeans_save_load(spark, tmp_path):
    pts = [(0.0, 0.0), (0.0, 0.3), (9.0, 0.0), (9.0, 0.6)]
    df = spark.createDataFrame([(i, list(p)) for i, p in enumerate(pts)],
                               "id long, features array<double>")
    model = KMeans(k=2, maxIter=5, initMode="first_distinct").fit(df)
    model.save(str(tmp_path / "km"))
    loaded = Stage.load(spark, str(tmp_path / "km"))
    assert loaded.model_data["centroids"] == model.model_data["centroids"]


def test_logistic_regression_separable(spark):
    rng = np.random.RandomState(0)
    x0 = rng.randn(60, 2) + [-2, -2]
    x1 = rng.randn(60, 2) + [2, 2]
    rows = ([(list(map(float, p)), 0.0) for p in x0] +
            [(list(map(float, p)), 1.0) for p in x1])
    df = spark.createDataFrame(rows, "features array<double>, label double")
    model = LogisticRegression(featuresCol="features", labelCol="label",
                               maxIter=30, learningRate=1.0,
                               globalBatchSize=1000).fit(df)
    out = model.transform(df)[0].collect()
    acc = np.mean([r["prediction"] == r["label"] for r in out])
    assert acc >= 0.95
    # local servable path agrees with the distributed path
    import pandas as pd
    pdf = pd.DataFrame({"features": [np.array(r) for r, _ in rows],
                        "label": [l for _, l in rows]})
    local = model.transform_local(pdf)
    assert list(local["prediction"]) == [r["prediction"] for r in out]


def test_linear_svc(spark):
    rng = np.random.RandomState(1)
    x0 = rng.randn(50, 2) + [-3, 0]
    x1 = rng.randn(50, 2) + [3, 0]
    rows = ([(list(map(float, p)), 0.0) for p in x0] +
            [(list(map(float, p)), 1.0) for p in x1])
    df = spark.createDataFrame(rows, "features array<double>, label double")
    model = LinearSVC(maxIter=30, learningRate=0.5, globalBatchSize=1000).fit(df)
    out = model.transform(df)[0].collect()
    acc = np.mean([r["prediction"] == r["label"] for r in out])
    assert acc >= 0.95


def test_linear_regression(spark):
    rng = np.random.RandomState(2)
    x = rng.rand(200, 2)
    y = x @ np.array([2.0, -1.0])
    rows = [(list(map(float, xi)), float(yi)) for xi, yi in zip(x, y)]
    df = spark.createDataFrame(rows, "features array<double>, label double")
    model = LinearRegression(maxIter=100, learningRate=0.5,
                             globalBatchSize=10000, tol=1e-12).fit(df)
    w = np.array(model.model_data["coefficient"])
    assert w == pytest.approx([2.0, -1.0], abs=0.15)


def test_naive_bayes(spark):
    rows = [([0.0, 0.0], 0.0)] * 10 + [([1.0, 1.0], 1.0)] * 10 + [([0.0, 1.0], 0.0)] * 3
    df = spark.createDataFrame(rows, "features array<double>, label double")
    model = NaiveBayes(featuresCol="features", labelCol="label").fit(df)
    out = model.transform(df)[0].collect()
    got = {(tuple(r["features"]), r["prediction"]) for r in out}
    assert ((0.0, 0.0), 0.0) in got
    assert ((1.0, 1.0), 1.0) in got


def test_knn(spark):
    train = [([0.0, 0.0], 0.0), ([0.1, 0.0], 0.0), ([0.0, 0.1], 0.0),
             ([5.0, 5.0], 1.0), ([5.1, 5.0], 1.0), ([5.0, 5.1], 1.0)]
    df = spark.createDataFrame(train, "features array<double>, label double")
    model = Knn(k=3).fit(df)
    test = spark.createDataFrame([(1, [0.2, 0.2]), (2, [4.8, 4.9])],
                                 "id long, features array<double>")
    got = {r["id"]: r["prediction"] for r in model.transform(test)[0].collect()}
    assert got == {1: 0.0, 2: 1.0}


def test_knn_fit_model_size_guard(spark):
    """Brute-force kNN broadcasts the packed train set; past
    maxModelValues (rows x dim) fit must fail fast with a pointer to
    the ANN indexes instead of OOM-ing executors later."""
    train = [([float(i), float(i + 1), float(i + 2)], float(i % 2))
             for i in range(10)]
    df = spark.createDataFrame(train,
                               "features array<double>, label double")
    with pytest.raises(ValueError, match="maxModelValues"):
        Knn(k=3, maxModelValues=20).fit(df)  # 10 rows x dim 3 = 30 > 20
    # at the boundary it still fits
    model = Knn(k=3, maxModelValues=30).fit(df)
    assert model.transform(df)[0].count() == 10


def test_sparse_struct_input_acceptance(spark):
    """Learners and scalers accept the sparse {size,indices,values} struct
    anywhere array<double> is accepted (reference testInputTypeConversion,
    KMeansTest.java:191) — dense and sparse encodings of the same data must
    produce identical models/outputs."""
    import numpy as np
    from flink_ml_spark.feature import StandardScaler

    dense_rows = [([0.0, 2.0, 0.0, 1.0], 1.0), ([3.0, 0.0, 0.0, 0.0], 0.0),
                  ([0.0, 0.0, 5.0, 1.0], 1.0), ([1.0, 1.0, 0.0, 0.0], 0.0)] * 5
    dd = spark.createDataFrame(dense_rows, "features array<double>, label double")

    def sparsify(v):
        idx = [i for i, x in enumerate(v) if x != 0.0]
        return (len(v), idx, [v[i] for i in idx])

    sparse_rows = [(sparsify(v), y) for v, y in dense_rows]
    sd = spark.createDataFrame(
        sparse_rows,
        "features struct<size:int,indices:array<int>,values:array<double>>, "
        "label double")

    kw = dict(featuresCol="features", labelCol="label", maxIter=5,
              learningRate=0.5, tol=0.0, globalBatchSize=1 << 40)
    w_dense = LogisticRegression(**kw).fit(dd).model_data["coefficient"]
    w_sparse = LogisticRegression(**kw).fit(sd).model_data["coefficient"]
    np.testing.assert_allclose(w_dense, w_sparse, rtol=1e-12)
    # model transform over sparse input (sparse-native margin)
    m = LogisticRegression(**kw).fit(sd)
    preds = [r["prediction"] for r in m.transform(sd)[0].collect()]
    assert preds == [y for _, y in dense_rows]

    sc_d = StandardScaler(inputCol="features", outputCol="s").fit(dd)
    sc_s = StandardScaler(inputCol="features", outputCol="s").fit(sd)
    np.testing.assert_allclose(sc_d.model_data["std"], sc_s.model_data["std"])
    out = sc_s.transform(sd)[0].select("s").first()[0]
    out_d = sc_d.transform(dd)[0].select("s").first()[0]
    np.testing.assert_allclose(out, out_d)

    km_d = KMeans(k=2, maxIter=3, initMode="first_distinct").fit(dd)
    km_s = KMeans(k=2, maxIter=3, initMode="first_distinct").fit(sd)
    np.testing.assert_allclose(km_d.model_data["centroids"],
                               km_s.model_data["centroids"])

    knn_d = Knn(k=3).fit(dd)
    knn_s = Knn(k=3).fit(sd)
    pd_ = [r["prediction"] for r in knn_d.transform(dd)[0].collect()]
    ps_ = [r["prediction"] for r in knn_s.transform(sd)[0].collect()]
    assert pd_ == ps_


def test_knn_distributed_pack_and_persistence(spark, tmp_path):
    """fit never collects raw rows (packed-block model data); save/load
    round-trips the block table through parquet."""
    from pyspark.sql import functions as F
    from flink_ml_spark.classification.knn import KnnModel

    data = [([float(i), float(i)], float(i % 2)) for i in range(40)]
    df = spark.createDataFrame(data, "features array<double>, label double")
    model = Knn(k=3).fit(df)
    assert set(model.model_df.columns) == {"x", "y", "n", "dim"}
    assert model.model_df.agg(F.sum("n")).first()[0] == 40
    test = spark.createDataFrame([([2.0, 2.1],), ([31.0, 30.9],)],
                                 "features array<double>")
    before = [r["prediction"] for r in model.transform(test)[0].collect()]
    p = str(tmp_path / "knn_model")
    model.save(p)
    loaded = KnnModel.load(spark, p)
    after = [r["prediction"] for r in loaded.transform(test)[0].collect()]
    # (2,2.1): neighbors (2,2)->0,(3,3)->1,(1,1)->1 => 1
    # (31,30.9): neighbors (31,31)->1,(30,30)->0,(32,32)->0 => 0
    assert before == after == [1.0, 0.0]


def test_sgd_distributed_matches_local(spark, monkeypatch):
    """The distributed DF-agg rounds and the tiny-input local loop are the
    same algorithm — force both on one fixture and compare coefficients."""
    import numpy as np
    from flink_ml_spark.common import optimizer
    from flink_ml_spark.classification import LogisticRegression

    data = [([float(i % 7) / 7, 1.0], float(i % 2)) for i in range(200)]
    df = spark.createDataFrame(data, "features array<double>, label double")
    kw = dict(featuresCol="features", labelCol="label", maxIter=5,
              learningRate=0.5, tol=0.0, globalBatchSize=1 << 40)
    m_local = LogisticRegression(**kw).fit(df)
    monkeypatch.setattr(optimizer, "LOCAL_SOLVE_MAX_VALUES", 0)
    m_dist = LogisticRegression(**kw).fit(df)
    np.testing.assert_allclose(m_local.model_data["coefficient"],
                               m_dist.model_data["coefficient"], rtol=1e-9)


def test_sgd_minibatch_slices_match_local(spark, monkeypatch):
    """Mini-batch revisits (maxIter > numBatches) hit the persisted batch
    slices; membership and arithmetic must be identical to the local loop."""
    import numpy as np
    from flink_ml_spark.common import optimizer
    from flink_ml_spark.classification import LogisticRegression

    data = [([float(i % 7) / 7, 1.0], float(i % 2)) for i in range(200)]
    df = spark.createDataFrame(data, "features array<double>, label double")
    # 200 rows / 60 per batch -> 4 batches; 9 rounds revisit each slice
    kw = dict(featuresCol="features", labelCol="label", maxIter=9,
              learningRate=0.5, tol=0.0, globalBatchSize=60)
    m_local = LogisticRegression(**kw).fit(df)
    monkeypatch.setattr(optimizer, "LOCAL_SOLVE_MAX_VALUES", 0)
    m_dist = LogisticRegression(**kw).fit(df)
    np.testing.assert_allclose(m_local.model_data["coefficient"],
                               m_dist.model_data["coefficient"], rtol=1e-9)


def test_kmeans_distributed_matches_local(spark, monkeypatch):
    import numpy as np
    from flink_ml_spark.common import optimizer
    from flink_ml_spark.clustering import KMeans

    data = [([float(i % 10), float((i * 3) % 7)],) for i in range(300)]
    df = spark.createDataFrame(data, "features array<double>")
    kw = dict(k=3, maxIter=5, initMode="first_distinct", tol=0.0)
    c_local = KMeans(**kw).fit(df).model_data["centroids"]
    monkeypatch.setattr(optimizer, "LOCAL_SOLVE_MAX_VALUES", 0)
    c_dist = KMeans(**kw).fit(df).model_data["centroids"]
    np.testing.assert_allclose(c_local, c_dist, rtol=1e-9)


def test_isotonic_regression_known_fits(spark):
    import numpy as np
    from flink_ml_spark.regression import (IsotonicRegression,
                                           IsotonicRegressionModel)
    # classic violator case: [1,3,2,4] -> [1,2.5,2.5,4]
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 4.0)],
        "feature double, label double")
    m = IsotonicRegression(featureCol="feature").fit(df)
    assert np.allclose(m.model_data["values"], [1.0, 2.5, 2.5, 4.0])
    # fully decreasing input pools to the global mean
    dec = spark.createDataFrame(
        [(float(i), float(3 - i)) for i in range(4)],
        "feature double, label double")
    m2 = IsotonicRegression(featureCol="feature").fit(dec)
    assert np.allclose(m2.model_data["values"], [1.5] * 4)
    # weighted pooling: (y=1,w=1) then (y=0,w=3) -> both 0.25
    wdf = spark.createDataFrame(
        [(0.0, 1.0, 1.0), (1.0, 0.0, 3.0)],
        "feature double, label double, w double")
    m3 = IsotonicRegression(featureCol="feature", weightCol="w").fit(wdf)
    assert np.allclose(m3.model_data["values"], [0.25, 0.25])
    # duplicate feature values aggregate before PAVA
    dup = spark.createDataFrame(
        [(1.0, 0.0), (1.0, 1.0), (2.0, 1.0)], "feature double, label double")
    m4 = IsotonicRegression(featureCol="feature").fit(dup)
    assert np.allclose(m4.model_data["boundaries"], [1.0, 2.0])
    assert np.allclose(m4.model_data["values"], [0.5, 1.0])
    # null score/label rows carry no signal and must not poison the fit
    nul = spark.createDataFrame(
        [(1.0, 1.0), (None, 0.0), (2.0, None), (2.0, 3.0)],
        "feature double, label double")
    m5 = IsotonicRegression(featureCol="feature").fit(nul)
    assert np.allclose(m5.model_data["boundaries"], [1.0, 2.0])
    assert np.allclose(m5.model_data["values"], [1.0, 3.0])


def test_isotonic_regression_predict_interpolates(spark, tmp_path):
    import numpy as np
    import pandas as pd
    from flink_ml_spark.regression import (IsotonicRegression,
                                           IsotonicRegressionModel)
    df = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 1.0)], "feature double, label double")
    m = IsotonicRegression(featureCol="feature").fit(df)
    probe = spark.createDataFrame(
        [(-1.0,), (0.0,), (0.25,), (1.0,), (5.0,)], "feature double")
    got = [r["prediction"] for r in m.transform(probe)[0]
           .orderBy("feature").collect()]
    assert np.allclose(got, [0.0, 0.0, 0.25, 1.0, 1.0])  # clamp + lerp
    # save/load + local parity
    p = str(tmp_path / "iso")
    m.save(p)
    back = IsotonicRegressionModel.load(spark, p)
    pdf = back.transform_local(pd.DataFrame({"feature": [-1, 0.25, 5]}))
    assert np.allclose(pdf["prediction"], [0.0, 0.25, 1.0])
    # monotonicity property on a noisy fit
    import random
    rnd = random.Random(7)
    noisy = spark.createDataFrame(
        [(i / 50.0, float(i / 50.0 + rnd.uniform(-0.3, 0.3) > 0.5))
         for i in range(200)], "feature double, label double")
    mf = IsotonicRegression(featureCol="feature").fit(noisy)
    vals = mf.model_data["values"]
    assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))


def test_quantile_regressor_tracks_quantiles(spark):
    """Constant-feature data with an asymmetric label distribution:
    the tau-quantile fit must land near the empirical tau-quantile,
    and tau=0.9 must sit above tau=0.5."""
    from flink_ml_spark.regression import QuantileRegressor
    rows = [([1.0], float(v)) for v in
            [0, 0, 0, 0, 0, 0, 0, 1, 2, 10] * 40]
    df = spark.createDataFrame(rows, "features array<double>, label double")
    preds = {}
    for tau in (0.5, 0.9):
        m = QuantileRegressor(tau=tau, maxIter=200, learningRate=0.5,
                              tol=0.0, globalBatchSize=1 << 40).fit(df)
        preds[tau] = float(m.model_data["coefficient"][0])
    # empirical: q50 = 0, q90 in (2, 10]
    assert abs(preds[0.5]) < 0.3, preds
    assert 1.0 < preds[0.9] < 10.0, preds
    assert preds[0.9] > preds[0.5]


def test_huber_regressor_bounds_outlier_influence(spark):
    """y = 2x with 5% wild outliers: the Huber fit must stay near slope
    2 while plain least squares is dragged away."""
    from flink_ml_spark.regression import HuberRegressor, LinearRegression
    rows = []
    for i in range(400):
        x = (i % 100) / 100.0
        y = 2.0 * x if i % 20 != 7 else 200.0
        rows.append(([x], float(y)))
    df = spark.createDataFrame(rows, "features array<double>, label double")
    hub = HuberRegressor(delta=0.5, maxIter=300, learningRate=0.5,
                         tol=0.0, globalBatchSize=1 << 40).fit(df)
    ols = LinearRegression(maxIter=300, learningRate=0.5, tol=0.0,
                           globalBatchSize=1 << 40).fit(df)
    w_h = float(hub.model_data["coefficient"][0])
    w_o = float(ols.model_data["coefficient"][0])
    assert abs(w_h - 2.0) < 1.0, (w_h, w_o)
    assert abs(w_o - 2.0) > 5.0, (w_h, w_o)  # OLS dragged by outliers
