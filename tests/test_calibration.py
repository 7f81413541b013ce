"""8-case template tests (SURVEY §5, KMeansTest.java's canonical case
set) for the round-7 learner additions: PlattCalibrator,
QuantileRegressor, HuberRegressor.

Cases per stage: param defaults + setters / output schema / an
algorithm-specific edge case / fit-and-predict / input type conversion /
save-load-and-predict / get_model_data / set_model_data.
"""

import numpy as np
import pytest

from flink_ml_spark.api import Stage
from flink_ml_spark.regression import (HuberRegressor, PlattCalibrator,
                                       QuantileRegressor)


# ---------------------------------------------------------------- fixtures

@pytest.fixture()
def score_df(spark):
    """Monotone-but-miscalibrated scores: label 1 iff score > 0, scores
    span [-2, 2] — a sigmoid with positive A must fit."""
    rows = [(float(s) / 5.0, 1.0 if s > 0 else 0.0)
            for s in range(-10, 11) if s != 0]
    return spark.createDataFrame(rows, "score double, label double")


@pytest.fixture()
def line_df(spark):
    """y = 2x + 1 exactly (no noise) on x in [0, 4] — every quantile and
    the Huber fit coincide with the line."""
    rows = [([float(x), 1.0], 2.0 * x + 1.0) for x in range(5) for _ in (0, 1)]
    return spark.createDataFrame(rows, "features array<double>, label double")


def _sparse(spark, rows):
    data = [({"size": 2, "indices": [0, 1], "values": list(f)}, y)
            for f, y in rows]
    return spark.createDataFrame(
        data, "features struct<size:int,indices:array<int>,"
              "values:array<double>>, label double")


# ------------------------------------------------------- PlattCalibrator

def test_platt_param(spark):
    est = PlattCalibrator()
    assert est.get_("scoreCol") == "score"
    assert est.get_("outputCol") == "calibrated"
    assert est.get_("targetSmoothing") is True
    assert est.get_("weightRounding") == 0
    est.set_(scoreCol="s", outputCol="p", targetSmoothing=False,
             maxIter=7, learningRate=0.25)
    assert est.get_("scoreCol") == "s"
    assert est.get_("outputCol") == "p"
    assert est.get_("targetSmoothing") is False
    assert est.get_("maxIter") == 7
    assert est.get_("learningRate") == 0.25


def test_platt_output_schema(spark, score_df):
    model = PlattCalibrator(maxIter=5).fit(score_df)
    out = model.transform(score_df)[0]
    assert out.columns == ["score", "label", "calibrated"]
    assert dict(out.dtypes)["calibrated"] == "double"


def test_platt_edge_non_binary_label_raises(spark):
    df = spark.createDataFrame([(0.5, 2.0)], "score double, label double")
    with pytest.raises(ValueError, match="0/1"):
        PlattCalibrator(maxIter=2).fit(df)


def test_platt_fit_and_predict(spark, score_df):
    model = PlattCalibrator(maxIter=60, learningRate=0.5).fit(score_df)
    a, b = model.model_data["a"], model.model_data["b"]
    assert a > 0  # calibrated probability increases with the score
    got = {r["score"]: r["calibrated"]
           for r in model.transform(score_df)[0].collect()}
    assert got[2.0] > 0.5 > got[-2.0]
    # monotone by construction
    ordered = [got[k] for k in sorted(got)]
    assert ordered == sorted(ordered)
    # MAP smoothing keeps probabilities off the 0/1 rails
    assert 0.0 < min(ordered) and max(ordered) < 1.0


def test_platt_input_type_conversion(spark, score_df):
    """Integer score / integer label columns are accepted and match the
    double encoding of the same data."""
    int_df = spark.createDataFrame(
        [(int(r["score"] * 5), int(r["label"]))
         for r in score_df.collect()], "score long, label long")
    scaled = int_df.selectExpr("CAST(score AS DOUBLE)/5.0 AS score",
                               "CAST(label AS DOUBLE) AS label")
    m1 = PlattCalibrator(maxIter=10).fit(scaled)
    m2 = PlattCalibrator(maxIter=10).fit(
        score_df.selectExpr("score", "CAST(label AS DOUBLE) label"))
    assert m1.model_data["a"] == pytest.approx(m2.model_data["a"])
    assert m1.model_data["b"] == pytest.approx(m2.model_data["b"])


def test_platt_save_load_and_predict(spark, score_df, tmp_path):
    model = PlattCalibrator(maxIter=10).fit(score_df)
    p = str(tmp_path / "platt")
    model.save(p)
    loaded = Stage.load(spark, p)
    a = [r["calibrated"] for r in model.transform(score_df)[0].collect()]
    b = [r["calibrated"] for r in loaded.transform(score_df)[0].collect()]
    assert a == b
    # servable path agrees with the cluster path
    local = loaded.transform_local(score_df.toPandas())
    assert local["calibrated"].tolist() == pytest.approx(a)


def test_platt_get_model_data(spark, score_df):
    model = PlattCalibrator(maxIter=5).fit(score_df)
    (md,) = model.get_model_data(spark)
    row = md.first()
    assert row["a"] == pytest.approx(model.model_data["a"])
    assert row["b"] == pytest.approx(model.model_data["b"])


def test_platt_set_model_data(spark, score_df):
    model = PlattCalibrator(maxIter=5).fit(score_df)
    (md,) = model.get_model_data(spark)
    from flink_ml_spark.regression import PlattCalibratorModel
    fresh = PlattCalibratorModel(scoreCol="score", outputCol="calibrated")
    fresh.set_model_data(md)
    a = [r["calibrated"] for r in model.transform(score_df)[0].collect()]
    b = [r["calibrated"] for r in fresh.transform(score_df)[0].collect()]
    assert a == b


# ---------------------------------------- QuantileRegressor / HuberRegressor

def test_quantile_param(spark):
    est = QuantileRegressor()
    assert est.get_("tau") == 0.5
    assert est.get_("featuresCol") == "features"
    assert est.get_("maxIter") == 20
    est.set_(tau=0.9, maxIter=5, learningRate=0.05, reg=0.01)
    assert est.get_("tau") == 0.9
    assert est.get_("maxIter") == 5
    with pytest.raises(Exception):
        QuantileRegressor(tau=1.0)  # open interval


def test_huber_param(spark):
    est = HuberRegressor()
    assert est.get_("delta") == 1.0
    est.set_(delta=2.5, maxIter=9)
    assert est.get_("delta") == 2.5
    assert est.get_("maxIter") == 9
    with pytest.raises(Exception):
        HuberRegressor(delta=0.0)


@pytest.mark.parametrize("cls", [QuantileRegressor, HuberRegressor])
def test_qh_output_schema(spark, line_df, cls):
    model = cls(maxIter=5).fit(line_df)
    out = model.transform(line_df)[0]
    assert out.columns == ["features", "label", "prediction"]
    assert dict(out.dtypes)["prediction"] == "double"


def test_quantile_edge_tau_ordering(spark):
    """On an asymmetric-noise fixture, higher tau fits a higher line —
    the algorithm-specific invariant (pinball loss targets quantiles)."""
    rng = np.random.RandomState(3)
    rows = [([1.0], float(rng.exponential(2.0))) for _ in range(400)]
    spark_df = spark.createDataFrame(rows,
                                     "features array<double>, label double")
    lo = QuantileRegressor(tau=0.2, maxIter=120, learningRate=0.3) \
        .fit(spark_df).model_data["coefficient"][0]
    hi = QuantileRegressor(tau=0.8, maxIter=120, learningRate=0.3) \
        .fit(spark_df).model_data["coefficient"][0]
    assert lo < hi


def test_huber_edge_outlier_bounded_influence(spark):
    """5% wild outliers: Huber's slope stays near the true line while
    OLS is dragged away — the defining robustness property."""
    from flink_ml_spark.regression import LinearRegression
    rows = [([float(x)], 3.0 * x) for x in range(1, 41)]
    rows += [([float(x)], 3.0 * x + 500.0) for x in (10, 30)]
    df = spark.createDataFrame(rows, "features array<double>, label double")
    hub = HuberRegressor(delta=1.0, maxIter=200, learningRate=0.002) \
        .fit(df).model_data["coefficient"][0]
    ols = LinearRegression(maxIter=200, learningRate=0.002) \
        .fit(df).model_data["coefficient"][0]
    assert abs(hub - 3.0) < abs(ols - 3.0)
    assert abs(hub - 3.0) < 0.2


@pytest.mark.parametrize("cls", [QuantileRegressor, HuberRegressor])
def test_qh_input_type_conversion(spark, line_df, cls):
    """Sparse-struct features produce the same model as dense arrays."""
    rows = [(list(r["features"]), r["label"]) for r in line_df.collect()]
    dense_m = cls(maxIter=8, learningRate=0.05).fit(line_df)
    sparse_m = cls(maxIter=8, learningRate=0.05).fit(_sparse(spark, rows))
    assert dense_m.model_data["coefficient"] == pytest.approx(
        sparse_m.model_data["coefficient"])


@pytest.mark.parametrize("cls", [QuantileRegressor, HuberRegressor])
def test_qh_save_load_and_predict(spark, line_df, tmp_path, cls):
    model = cls(maxIter=8).fit(line_df)
    p = str(tmp_path / cls.__name__)
    model.save(p)
    loaded = Stage.load(spark, p)
    a = [r["prediction"] for r in model.transform(line_df)[0].collect()]
    b = [r["prediction"] for r in loaded.transform(line_df)[0].collect()]
    assert a == b
    local = loaded.transform_local(line_df.toPandas())
    assert local["prediction"].tolist() == pytest.approx(a)


@pytest.mark.parametrize("cls", [QuantileRegressor, HuberRegressor])
def test_qh_get_set_model_data(spark, line_df, cls):
    model = cls(maxIter=8).fit(line_df)
    (md,) = model.get_model_data(spark)
    assert list(md.first()["coefficient"]) == pytest.approx(
        model.model_data["coefficient"])
    from flink_ml_spark.classification.linear import LinearRegressionModel
    fresh = LinearRegressionModel(featuresCol="features",
                                  predictionCol="prediction")
    fresh.set_model_data(md)
    a = [r["prediction"] for r in model.transform(line_df)[0].collect()]
    b = [r["prediction"] for r in fresh.transform(line_df)[0].collect()]
    assert a == pytest.approx(b)
