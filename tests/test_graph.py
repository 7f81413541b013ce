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
