"""DecisionTreeRegressor: recovery of planted structure, exactness,
determinism, persistence, servable parity."""

import math

import pytest
from pyspark.sql import functions as F

from flink_ml_spark.regression import DecisionTreeRegressor


def _step_data(spark):
    """Piecewise-constant target over a 2-D grid: a depth-2 tree can
    fit it EXACTLY (y = 10 if x0<=0.5 else (20 if x1<=0.3 else 30))."""
    rows = []
    for i in range(400):
        x0, x1 = (i % 20) / 20.0, (i // 20) / 20.0
        y = 10.0 if x0 <= 0.5 else (20.0 if x1 <= 0.3 else 30.0)
        rows.append(([x0, x1], y))
    return spark.createDataFrame(rows,
                                 "features array<double>, label double")


def test_tree_fits_piecewise_constant_exactly(spark):
    df = _step_data(spark)
    m = DecisionTreeRegressor(maxDepth=3, maxBins=20).fit(df)
    scored = m.transform(df)[0]
    resid = scored.agg(F.max(F.abs(F.col("label")
                                   - F.col("prediction")))).first()[0]
    assert resid < 1e-9, resid
    # root split must be on feature 0 (it explains the most variance)
    assert m.model_data["nodes"]["0"]["feat"] == 0


def test_tree_depth_and_min_instances(spark):
    df = _step_data(spark)
    m1 = DecisionTreeRegressor(maxDepth=1, maxBins=20).fit(df)
    nodes = m1.model_data["nodes"]
    assert set(nodes) == {"0", "1", "2"}  # one split, two leaves
    assert "value" in nodes["1"] and "value" in nodes["2"]
    # a huge min-instances bound forbids any split -> single leaf
    m2 = DecisionTreeRegressor(maxDepth=3,
                               minInstancesPerNode=1000).fit(df)
    assert set(m2.model_data["nodes"]) == {"0"}
    assert m2.model_data["nodes"]["0"]["value"] == pytest.approx(
        df.agg(F.avg("label")).first()[0])


def test_tree_bit_deterministic_across_partitioning(spark):
    df = _step_data(spark)
    # noisy target so gains are non-trivial rationals
    noisy = df.withColumn(
        "label", F.col("label")
        + (F.crc32(F.concat_ws(",", F.col("features")
                               .cast("array<string>"))) % 7)
        .cast("double") / 3.0)
    m1 = DecisionTreeRegressor(maxDepth=4, maxBins=16).fit(noisy)
    m2 = DecisionTreeRegressor(maxDepth=4, maxBins=16) \
        .fit(noisy.repartition(13))
    assert m1.model_data["nodes"] == m2.model_data["nodes"]


def test_tree_quantile_bins_on_skewed_feature(spark):
    rows = []
    for i in range(300):
        x = 10.0 ** (i % 6)  # 1..100000, heavily skewed
        y = 1.0 if x <= 100 else 5.0
        rows.append(([x], y))
    df = spark.createDataFrame(rows, "features array<double>, label double")
    # uniform bins squash 1..1000 into one bin at maxBins=4 — quantile
    # bins still separate the step
    m = DecisionTreeRegressor(maxDepth=2, maxBins=4,
                              binStrategy="quantile").fit(df)
    resid = m.transform(df)[0].agg(
        F.max(F.abs(F.col("label") - F.col("prediction")))).first()[0]
    assert resid < 1e-9


def test_tree_persistence_and_local_parity(spark, tmp_path):
    from flink_ml_spark.api import Stage
    df = _step_data(spark)
    m = DecisionTreeRegressor(maxDepth=3, maxBins=20).fit(df)
    m.save(str(tmp_path / "dt"))
    back = Stage.load(spark, str(tmp_path / "dt"))
    a = [r["prediction"] for r in m.transform(df)[0].collect()]
    b = [r["prediction"] for r in back.transform(df)[0].collect()]
    assert a == b
    import pandas as pd
    pdf = pd.DataFrame({"features": [[0.2, 0.9], [0.9, 0.1], [0.9, 0.9]]})
    loc = back.transform_local(pdf)
    assert list(loc["prediction"]) == [10.0, 20.0, 30.0]


def test_tree_empty_input_raises(spark):
    empty = spark.createDataFrame([],
                                  "features array<double>, label double")
    with pytest.raises(ValueError, match="no training rows"):
        DecisionTreeRegressor().fit(empty)


def test_tree_classifier_binary(spark, tmp_path):
    from flink_ml_spark.api import Stage
    from flink_ml_spark.regression import DecisionTreeClassifier
    rows = []
    for i in range(300):
        x0, x1 = (i % 20) / 20.0, (i // 20) / 15.0
        y = 1.0 if (x0 > 0.4 and x1 <= 0.6) else 0.0
        rows.append(([x0, x1], y))
    df = spark.createDataFrame(rows, "features array<double>, label double")
    m = DecisionTreeClassifier(maxDepth=3, maxBins=20).fit(df)
    got = m.transform(df)[0]
    wrong = got.filter(F.col("label") != F.col("prediction")).count()
    assert wrong == 0
    probs = got.select("probability").distinct().collect()
    assert all(0.0 <= r["probability"] <= 1.0 for r in probs)
    # non-binary labels fail fast
    bad = spark.createDataFrame([([0.1], 2.0)],
                                "features array<double>, label double")
    with pytest.raises(ValueError, match="0/1"):
        DecisionTreeClassifier().fit(bad)
    # save/load + servable parity
    m.save(str(tmp_path / "dtc"))
    back = Stage.load(spark, str(tmp_path / "dtc"))
    import pandas as pd
    loc = back.transform_local(pd.DataFrame(
        {"features": [[0.9, 0.2], [0.1, 0.2]]}))
    assert list(loc["prediction"]) == [1.0, 0.0]


def test_tree_arrow_bin_path_matches_expr_path(spark):
    """Past _CODEGEN_BIN_LIMIT the bins come from an Arrow searchsorted
    UDF; at a shape where both paths are feasible the fitted tree must
    be byte-identical."""
    from flink_ml_spark.regression import tree as tree_mod
    df = _step_data(spark)
    m_expr = DecisionTreeRegressor(maxDepth=3, maxBins=20).fit(df)
    saved = tree_mod._CODEGEN_BIN_LIMIT
    tree_mod._CODEGEN_BIN_LIMIT = 0  # force the Arrow path
    try:
        m_arrow = DecisionTreeRegressor(maxDepth=3, maxBins=20).fit(df)
    finally:
        tree_mod._CODEGEN_BIN_LIMIT = saved
    assert m_expr.model_data["nodes"] == m_arrow.model_data["nodes"]


def test_tree_quantile_defaults_to_sketch_exact_opt_in(spark):
    """binStrategy='quantile' defaults to approx_percentile (scale
    path); exactQuantiles=True opts into exact percentile.  Both must
    recover the planted skewed step (sketch is exact at this size)."""
    rows = []
    for i in range(300):
        x = 10.0 ** (i % 6)
        y = 1.0 if x <= 100 else 5.0
        rows.append(([x], y))
    df = spark.createDataFrame(rows, "features array<double>, label double")
    for exact in (False, True):
        m = DecisionTreeRegressor(maxDepth=2, maxBins=4,
                                  binStrategy="quantile",
                                  exactQuantiles=exact).fit(df)
        resid = m.transform(df)[0].agg(
            F.max(F.abs(F.col("label") - F.col("prediction")))).first()[0]
        assert resid < 1e-9, (exact, resid)


def test_tree_splits_df_and_feature_importances(spark):
    df = _step_data(spark)
    m = DecisionTreeRegressor(maxDepth=3, maxBins=20).fit(df)
    sp = m.splits_df(spark).collect()
    assert len(sp) >= 2
    root = [r for r in sp if r["node"] == 0][0]
    # planted structure: root splits x0 at 0.5, a child splits x1 at 0.3
    assert root["feat"] == 0 and abs(root["thr"] - 0.5) < 0.05
    imp = m.feature_importances()
    assert len(imp) == 2 and abs(sum(imp) - 1.0) < 1e-12
    # x0 separates 10 vs {20,30}; x1 only refines — x0 dominates
    assert imp[0] > imp[1] > 0.0


def test_ensemble_feature_importances(spark):
    from flink_ml_spark.regression import (GBTRegressor,
                                           RandomForestRegressor)
    rows = []
    for i in range(300):
        x0, x1 = (i % 20) / 20.0, (i // 20) / 15.0
        rows.append((i, [x0, x1], 10.0 if x0 <= 0.5 else 30.0))
    df = spark.createDataFrame(
        rows, "id long, features array<double>, label double")
    for est in (RandomForestRegressor(numTrees=3, maxDepth=2, maxBins=8),
                GBTRegressor(numTrees=3, maxDepth=2, maxBins=8)):
        m = est.fit(df)
        imp = m.feature_importances()
        assert len(imp) == 2 and abs(sum(imp) - 1.0) < 1e-12
        assert imp[0] > 0.9, (type(est).__name__, imp)


def test_tree_sketch_split_rank_drift_within_epsilon(spark):
    """Pins the scale default's accuracy (VERDICT r07 item 5): on a
    heavily right-skewed column, the fitted split threshold under the
    default approx_percentile sketch may differ from the exact-quantile
    fit only within the sketch's rank-error bound — Spark's GK variant
    guarantees rank error <= N/accuracy per quantile, so the chosen
    thresholds' EMPIRICAL RANKS (not values — value gaps are huge under
    skew) must agree within 2*N/accuracy (+1 interpolation slack)."""
    import math
    N, acc = 2000, 200
    xs = [math.exp(12.0 * i / (N - 1)) for i in range(N)]
    step = xs[1399]  # label steps exactly at the p=0.7 bin-edge rank
    rows = [([x], 1.0 if x <= step else 5.0) for x in xs]
    df = spark.createDataFrame(rows, "features array<double>, label double")
    thr = {}
    for exact in (False, True):
        m = DecisionTreeRegressor(maxDepth=1, maxBins=10,
                                  binStrategy="quantile",
                                  exactQuantiles=exact,
                                  quantileAccuracy=acc).fit(df)
        (root,) = m.splits_df(spark).collect()
        thr[exact] = float(root["thr"])
    rank = {k: sum(1 for x in xs if x <= t) for k, t in thr.items()}
    drift = abs(rank[False] - rank[True])
    assert drift <= 2 * N // acc + 1, (thr, rank, drift)


def test_tree_deep_fold_parity(spark, monkeypatch):
    """The _NODE_EXPR_LIMIT fold path (deep trees: the node walk folds
    into a stored column and the split accumulator resets) must produce
    the identical tree to the pure-expression walk (r09 VERDICT item
    4).  Limit 2 forces a fold after nearly every level."""
    from flink_ml_spark.regression import tree as tree_mod
    rows = []
    for i in range(800):
        x0, x1 = (i * 37 % 100) / 100.0, (i * 61 % 83) / 83.0
        y = round(3.0 * x0 - 2.0 * x1 + x0 * x1 * 4.0, 3)
        rows.append(([x0, x1], y))
    df = spark.createDataFrame(rows,
                               "features array<double>, label double")
    est = lambda: DecisionTreeRegressor(maxDepth=6, maxBins=16)
    plain = est().fit(df)
    monkeypatch.setattr(tree_mod, "_NODE_EXPR_LIMIT", 2)
    folded = est().fit(df)
    assert folded.model_data["nodes"] == plain.model_data["nodes"]
