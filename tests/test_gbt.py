"""GBTRegressor: boosting improves on a single tree, determinism,
persistence + servable parity."""

import pytest
from pyspark.sql import functions as F

from flink_ml_spark.regression import DecisionTreeRegressor, GBTRegressor


def _curve_data(spark):
    """Smooth nonlinear target a depth-2 tree underfits: y = sin-ish
    polynomial of x0 plus an interaction."""
    rows = []
    for i in range(600):
        x0, x1 = (i % 30) / 30.0, (i // 30) / 20.0
        y = 4.0 * x0 * x0 - 3.0 * x0 + 2.0 * x0 * x1 + 1.0
        rows.append(([x0, x1], y))
    return spark.createDataFrame(rows,
                                 "features array<double>, label double")


def _rmse(scored):
    return float(scored.agg(F.sqrt(F.avg(
        (F.col("label") - F.col("prediction")) ** 2))).first()[0])


def test_gbt_beats_single_tree(spark):
    df = _curve_data(spark)
    single = _rmse(DecisionTreeRegressor(maxDepth=2, maxBins=16)
                   .fit(df).transform(df)[0])
    boosted = _rmse(GBTRegressor(numTrees=8, maxDepth=2, maxBins=16,
                                 learningRate=0.5).fit(df).transform(df)[0])
    assert boosted < 0.5 * single, (boosted, single)


def test_gbt_more_rounds_fit_tighter(spark):
    df = _curve_data(spark)
    r2 = _rmse(GBTRegressor(numTrees=2, maxDepth=2, learningRate=0.5)
               .fit(df).transform(df)[0])
    r8 = _rmse(GBTRegressor(numTrees=8, maxDepth=2, learningRate=0.5)
               .fit(df).transform(df)[0])
    assert r8 < r2


def test_gbt_bit_deterministic_across_partitioning(spark):
    df = _curve_data(spark)
    m1 = GBTRegressor(numTrees=4, maxDepth=3).fit(df)
    m2 = GBTRegressor(numTrees=4, maxDepth=3).fit(df.repartition(19))
    assert m1.model_data["trees"] == m2.model_data["trees"]
    assert m1.model_data["f0"] == m2.model_data["f0"]


def test_gbt_persistence_and_local_parity(spark, tmp_path):
    import pandas as pd
    from flink_ml_spark.api import Stage
    df = _curve_data(spark)
    m = GBTRegressor(numTrees=3, maxDepth=2).fit(df)
    m.save(str(tmp_path / "gbt"))
    back = Stage.load(spark, str(tmp_path / "gbt"))
    a = [round(r["prediction"], 9) for r in m.transform(df)[0].collect()]
    b = [round(r["prediction"], 9)
         for r in back.transform(df)[0].collect()]
    assert a == b
    pdf = pd.DataFrame({"features": [[0.1, 0.5], [0.9, 0.2]]})
    loc = back.transform_local(pdf)
    cluster = back.transform(spark.createDataFrame(
        [([0.1, 0.5],), ([0.9, 0.2],)], "features array<double>"))[0]
    want = [r["prediction"] for r in cluster.collect()]
    assert list(loc["prediction"]) == pytest.approx(want, abs=1e-12)


def test_gbt_empty_raises(spark):
    empty = spark.createDataFrame([], "features array<double>, label double")
    with pytest.raises(ValueError, match="no training rows"):
        GBTRegressor().fit(empty)


def test_gbt_nan_features_fail_fast(spark):
    """_tree_pred_bins routes NaN left, the fitted model routes NaN
    right — fit must refuse NaN features instead of silently training
    against residuals the model cannot replay (r09 VERDICT item 3)."""
    df = spark.createDataFrame(
        [([0.1, 0.5], 1.0), ([float("nan"), 0.2], 2.0), ([0.4, 0.9], 3.0)],
        "features array<double>, label double")
    with pytest.raises(ValueError, match="NaN feature"):
        GBTRegressor(numTrees=2, maxDepth=2).fit(df)


def test_gbt_residual_fold_parity(spark, monkeypatch):
    """Forcing the residual-chain fold (accumulated-node limit 1 ⇒ a
    checkpoint after every round) must yield the identical ensemble:
    the stored residual prefix is the same left-fold double the lazy
    expression evaluates."""
    from flink_ml_spark.regression import gbt as gbt_mod
    df = _curve_data(spark)
    plain = GBTRegressor(numTrees=5, maxDepth=2, learningRate=0.5).fit(df)
    monkeypatch.setattr(gbt_mod, "_RESID_EXPR_LIMIT", 1)
    folded = GBTRegressor(numTrees=5, maxDepth=2, learningRate=0.5).fit(df)
    assert folded.model_data["trees"] == plain.model_data["trees"]
    assert folded.model_data["f0"] == plain.model_data["f0"]
