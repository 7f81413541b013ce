"""RandomForestRegressor: variance reduction vs one tree, determinism,
bagging coverage, persistence."""

import pytest
from pyspark.sql import functions as F

from flink_ml_spark.regression import (DecisionTreeRegressor,
                                       RandomForestRegressor)


def _noisy_data(spark):
    rows = []
    for i in range(800):
        x0, x1 = (i % 40) / 40.0, (i // 40) / 20.0
        noise = ((i * 2654435761) % 97 - 48) / 97.0
        y = 3.0 * x0 + 2.0 * x1 * x1 + noise
        rows.append((i, [x0, x1], y))
    return spark.createDataFrame(rows,
                                 "id long, features array<double>, "
                                 "label double")


def _rmse(scored):
    return float(scored.agg(F.sqrt(F.avg(
        (F.col("label") - F.col("prediction")) ** 2))).first()[0])


def test_forest_fits_and_beats_nothing_fancy(spark):
    df = _noisy_data(spark)
    m = RandomForestRegressor(numTrees=5, maxDepth=4, maxBins=16,
                              idCol="id").fit(df)
    rmse = _rmse(m.transform(df)[0])
    mean = df.agg(F.avg("label")).first()[0]
    base = df.agg(F.sqrt(F.avg((F.col("label") - mean) ** 2))).first()[0]
    assert rmse < 0.45 * base, (rmse, base)


def test_forest_deterministic_and_trees_differ(spark):
    df = _noisy_data(spark)
    m1 = RandomForestRegressor(numTrees=3, maxDepth=3, idCol="id").fit(df)
    m2 = RandomForestRegressor(numTrees=3, maxDepth=3, idCol="id") \
        .fit(df.repartition(13))
    assert m1.model_data["trees"] == m2.model_data["trees"]
    # different bagging salts -> genuinely different trees
    t = m1.model_data["trees"]
    assert not (t[0] == t[1] == t[2])


def test_forest_sqrt_feature_subset_remaps(spark):
    df = _noisy_data(spark)
    m = RandomForestRegressor(numTrees=4, maxDepth=2, idCol="id",
                              featureSubset="sqrt").fit(df)
    feats = {info["feat"] for nodes in m.model_data["trees"]
             for info in nodes.values() if "feat" in info}
    assert feats <= {0, 1}  # remapped to ORIGINAL indices
    # scoring consumes the full feature array without error
    assert m.transform(df)[0].filter(
        F.col("prediction").isNull()).count() == 0


def test_forest_persistence_and_local_parity(spark, tmp_path):
    import pandas as pd
    from flink_ml_spark.api import Stage
    df = _noisy_data(spark)
    m = RandomForestRegressor(numTrees=3, maxDepth=3, idCol="id").fit(df)
    m.save(str(tmp_path / "rf"))
    back = Stage.load(spark, str(tmp_path / "rf"))
    a = [round(r["prediction"], 9) for r in m.transform(df)[0].collect()]
    b = [round(r["prediction"], 9)
         for r in back.transform(df)[0].collect()]
    assert a == b
    pdf = pd.DataFrame({"features": [[0.5, 0.5], [0.0, 1.0]]})
    loc = back.transform_local(pdf)
    want = [r["prediction"] for r in back.transform(
        spark.createDataFrame([([0.5, 0.5],), ([0.0, 1.0],)],
                              "features array<double>"))[0].collect()]
    assert list(loc["prediction"]) == pytest.approx(want, abs=1e-12)


def test_forest_parallel_fit_identical(spark):
    rows = []
    for i in range(400):
        x0, x1 = (i % 20) / 20.0, (i // 20) / 20.0
        rows.append((i, [x0, x1],
                     10.0 if x0 <= 0.5 else (20.0 if x1 <= 0.3 else 30.0)))
    df = spark.createDataFrame(
        rows, "id long, features array<double>, label double")
    from flink_ml_spark.regression import RandomForestRegressor
    seq = RandomForestRegressor(numTrees=4, maxDepth=2, maxBins=8).fit(df)
    par = RandomForestRegressor(numTrees=4, maxDepth=2, maxBins=8,
                                parallelism=4).fit(df)
    assert seq.model_data["trees"] == par.model_data["trees"]
