"""Graph / GraphBuilder / GraphModel DAG tests (SURVEY §2.1 —
GraphBuilder.java:39, Graph.java:153, GraphModel.java:50)."""

import pytest

from flink_ml_spark import Graph, GraphBuilder, GraphModel
from flink_ml_spark.feature import MinMaxScaler, SQLTransformer, StandardScaler


@pytest.fixture()
def dense_df(spark):
    return spark.createDataFrame(
        [(1, [1.0, 10.0]), (2, [2.0, 20.0]), (3, [3.0, 30.0]), (4, [4.0, 40.0])],
        "id long, features array<double>")


def test_graph_linear_dag(spark, dense_df):
    b = GraphBuilder()
    src = b.new_table_id()
    scaled = b.add_estimator(
        StandardScaler(inputCol="features", outputCol="std"), [src])
    out = b.add_estimator(
        MinMaxScaler(inputCol="std", outputCol="mm"), scaled)
    graph = b.build_estimator([src], out)
    model = graph.fit(dense_df)
    assert isinstance(model, GraphModel)
    rows = {r["id"]: r["mm"] for r in model.transform(dense_df)[0].collect()}
    assert rows[1] == pytest.approx([0.0, 0.0])
    assert rows[4] == pytest.approx([1.0, 1.0])


def test_graph_diamond_multi_output(spark, dense_df):
    """Two branches off one source, both surfaced as graph outputs."""
    b = GraphBuilder()
    src = b.new_table_id()
    s1 = b.add_estimator(StandardScaler(inputCol="features", outputCol="a"), [src])
    s2 = b.add_estimator(MinMaxScaler(inputCol="features", outputCol="b"), [src])
    graph = b.build_estimator([src], s1 + s2)
    model = graph.fit(dense_df)
    out_a, out_b = model.transform(dense_df)
    assert "a" in out_a.columns and "b" in out_b.columns
    assert out_a.count() == 4 and out_b.count() == 4


def test_graph_estimator_fit_on_other_table(spark, dense_df):
    """fit on the train table, transform a different table (estimator_inputs)."""
    train = dense_df.filter("id <= 2")
    b = GraphBuilder()
    fit_in, apply_in = b.new_table_id(), b.new_table_id()
    out = b.add_estimator(
        StandardScaler(inputCol="features", outputCol="s", withMean=True),
        [fit_in], transform_inputs=[apply_in])
    graph = b.build_estimator([fit_in, apply_in], out)
    model = graph.fit(train, dense_df)
    rows = {r["id"]: r["s"] for r in model.transform(train, dense_df)[0].collect()}
    # mean/std come from rows 1-2 only: mean=1.5, std=sqrt(0.5)
    assert rows[1][0] == pytest.approx((1.0 - 1.5) / 0.5 ** 0.5)
    assert rows[4][0] == pytest.approx((4.0 - 1.5) / 0.5 ** 0.5)


def test_graph_with_algo_operator(spark, dense_df):
    """AlgoOperator node (SQLTransformer) feeding an Estimator node."""
    b = GraphBuilder()
    src = b.new_table_id()
    filtered = b.add_algo_operator(
        SQLTransformer(statement="SELECT * FROM __THIS__ WHERE id <= 3"), [src])
    out = b.add_estimator(MinMaxScaler(inputCol="features", outputCol="m"),
                          filtered)
    model = b.build_estimator([src], out).fit(dense_df)
    rows = {r["id"]: r["m"] for r in model.transform(dense_df)[0].collect()}
    assert rows[3] == pytest.approx([1.0, 1.0])  # max within fit subset


def test_graph_model_save_load(spark, dense_df, tmp_path):
    b = GraphBuilder()
    src = b.new_table_id()
    s = b.add_estimator(StandardScaler(inputCol="features", outputCol="std"), [src])
    out = b.add_estimator(MinMaxScaler(inputCol="std", outputCol="mm"), s)
    model = b.build_estimator([src], out).fit(dense_df)
    p = str(tmp_path / "gm")
    model.save(p)
    from flink_ml_spark import Stage
    loaded = Stage.load(spark, p)
    a = [r["mm"] for r in model.transform(dense_df)[0].collect()]
    c = [r["mm"] for r in loaded.transform(dense_df)[0].collect()]
    assert a == c


def test_pipeline_model_save_load_via_stage(spark, dense_df, tmp_path):
    """Generic Stage.load must defer to PipelineModel.load (stage restore)."""
    from flink_ml_spark import Pipeline, Stage
    pm = Pipeline(stages=[
        StandardScaler(inputCol="features", outputCol="s"),
        MinMaxScaler(inputCol="s", outputCol="m")]).fit(dense_df)
    p = str(tmp_path / "pm")
    pm.save(p)
    loaded = Stage.load(spark, p)
    assert len(loaded.stages) == 2
    a = [r["m"] for r in pm.transform(dense_df)[0].collect()]
    c = [r["m"] for r in loaded.transform(dense_df)[0].collect()]
    assert a == c


def test_graph_cycle_detection():
    b = GraphBuilder()
    src = b.new_table_id()
    dangling = b.new_table_id()  # never produced
    b.add_algo_operator(
        SQLTransformer(statement="SELECT * FROM __THIS__"), [dangling])
    g = b.build_estimator([src], [dangling])
    with pytest.raises(ValueError, match="cycle or unbound"):
        g.fit(None)


def test_graph_model_data_wiring(spark, dense_df):
    """GraphBuilder.java:119-170 parity: one estimator's fitted model data
    feeds another model's setModelData through the DAG."""
    from flink_ml_spark.feature.scalers import StandardScalerModel

    b = GraphBuilder()
    src = b.new_table_id()
    scaler = StandardScaler(inputCol="features", outputCol="std",
                            withMean=True, withStd=True)
    (t1,) = b.add_estimator(scaler, [src])
    (md,) = b.get_model_data(scaler)
    # a fresh, un-fitted model consuming the wired model data
    clone = StandardScalerModel(inputCol="features", outputCol="std2",
                                withMean=True, withStd=True)
    (t2,) = b.add_algo_operator(clone, [src])
    b.set_model_data(clone, md)
    model = b.build_estimator([src], [t1, t2]).fit(dense_df)
    out1, out2 = model.transform(dense_df)
    a = {r["id"]: r["std"] for r in out1.collect()}
    c = {r["id"]: r["std2"] for r in out2.collect()}
    for k in a:
        assert a[k] == pytest.approx(c[k])


def test_graph_get_model_data_as_output(spark, dense_df):
    """getModelData tables are ordinary graph outputs."""
    b = GraphBuilder()
    src = b.new_table_id()
    scaler = StandardScaler(inputCol="features", outputCol="std")
    (t1,) = b.add_estimator(scaler, [src])
    (md,) = b.get_model_data(scaler)
    model = b.build_estimator([src], [t1, md]).fit(dense_df)
    _, md_df = model.transform(dense_df)
    row = md_df.collect()[0].asDict()
    assert list(row["mean"]) == pytest.approx([2.5, 25.0])


def test_graph_build_algo_operator(spark, dense_df):
    """GraphBuilder.java:359 parity: the DAG as an AlgoOperator fits the
    estimator nodes inline on every transform()."""
    from flink_ml_spark import GraphAlgoOperator

    b = GraphBuilder()
    src = b.new_table_id()
    (t1,) = b.add_estimator(
        MinMaxScaler(inputCol="features", outputCol="mm"), [src])
    op = b.build_algo_operator([src], [t1])
    assert isinstance(op, GraphAlgoOperator)
    rows = {r["id"]: r["mm"] for r in op.transform(dense_df)[0].collect()}
    assert rows[1] == pytest.approx([0.0, 0.0])
    assert rows[4] == pytest.approx([1.0, 1.0])
    # refit semantics: a different input re-fits, so min/max adapt
    half = dense_df.filter("id <= 2")
    rows2 = {r["id"]: r["mm"] for r in op.transform(half)[0].collect()}
    assert rows2[2] == pytest.approx([1.0, 1.0])


def test_pipeline_load_local_serves_without_spark(spark, dense_df, tmp_path):
    """PipelineModelServable.java:40-62 parity: a pipeline saved by Spark
    round-trips through Stage.load_local and serves pandas-in/pandas-out
    with no SparkSession involved."""
    import pandas as pd

    from flink_ml_spark import Pipeline
    from flink_ml_spark.api import Stage

    pm = Pipeline([
        StandardScaler(inputCol="features", outputCol="s", withMean=True),
        MinMaxScaler(inputCol="s", outputCol="m")]).fit(dense_df)
    p = str(tmp_path / "pm_local")
    pm.save(p)
    served = Stage.load_local(p)
    pdf = pd.DataFrame({"features": [[1.0, 10.0], [4.0, 40.0]]})
    out = served.transform_local(pdf)
    assert list(out["m"].iloc[0]) == pytest.approx([0.0, 0.0])
    assert list(out["m"].iloc[1]) == pytest.approx([1.0, 1.0])


def test_knn_load_local_parquet_model_data(spark, tmp_path):
    """KnnModel's table-shaped model data (parquet blocks) loads through
    the engine-free path too."""
    import pandas as pd

    from flink_ml_spark.api import Stage
    from flink_ml_spark.classification import Knn

    rows = [([0.0, 0.0], 0.0), ([0.1, 0.1], 0.0),
            ([5.0, 5.0], 1.0), ([5.1, 5.1], 1.0)]
    df = spark.createDataFrame(rows, "features array<double>, label double")
    m = Knn(featuresCol="features", labelCol="label", k=3).fit(df)
    p = str(tmp_path / "knn_local")
    m.save(p)
    served = Stage.load_local(p)
    out = served.transform_local(
        pd.DataFrame({"features": [[0.05, 0.05], [5.05, 5.05]]}))
    assert list(out["prediction"]) == [0.0, 1.0]


def test_graph_model_served_locally(spark, dense_df, tmp_path):
    """A fitted GraphModel saved by Spark serves pandas-locally through
    the DAG (fan-out scalers), engine-free."""
    import pandas as pd

    from flink_ml_spark.graph import GraphModel

    b = GraphBuilder()
    src = b.new_table_id()
    (t1,) = b.add_estimator(
        StandardScaler(inputCol="features", outputCol="std", withMean=True), [src])
    (t2,) = b.add_estimator(MinMaxScaler(inputCol="std", outputCol="mm"), [t1])
    gm = b.build_estimator([src], [t2]).fit(dense_df)
    p = str(tmp_path / "gm_local")
    gm.save(p)
    served = GraphModel.load_local(p)
    pdf = pd.DataFrame({"features": [[1.0, 10.0], [4.0, 40.0]]})
    out = served.transform_local(pdf)
    assert list(out["mm"].iloc[0]) == pytest.approx([0.0, 0.0])
    assert list(out["mm"].iloc[1]) == pytest.approx([1.0, 1.0])
