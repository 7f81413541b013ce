"""Dataflow-primitive tests (SURVEY §2.8 — DataStreamUtils parity)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_ml_spark.common import dataflow as D
from flink_ml_spark.streaming.windows import Windows


@pytest.fixture()
def nums(spark):
    return spark.createDataFrame([(i, float(i), [float(i), 1.0]) for i in range(100)],
                                 "id long, x double, v array<double>")


def test_map_partition(spark, nums):
    def add_col(it):
        for pdf in it:
            pdf = pdf[["id"]].copy()
            pdf["twice"] = pdf["id"] * 2
            yield pdf

    out = D.map_partition(nums, add_col, "id long, twice long")
    rows = {r["id"]: r["twice"] for r in out.collect()}
    assert rows[7] == 14 and len(rows) == 100


def test_reduce_rows(spark, nums):
    row = D.reduce_rows(nums, F.sum("x").alias("s"), F.count("*").alias("n"))
    assert row["s"] == pytest.approx(4950.0) and row["n"] == 100


def test_aggregate_keyed(spark, nums):
    out = D.aggregate_keyed(nums.withColumn("k", F.col("id") % 2), ["k"],
                            F.sum("x").alias("s"))
    got = {r["k"]: r["s"] for r in out.collect()}
    assert got[0] == pytest.approx(2450.0) and got[1] == pytest.approx(2500.0)


def test_sample_n(spark, nums):
    got = D.sample_n(nums, 10, seed=7)
    assert len(got) == 10
    assert len({r["id"] for r in got}) == 10  # without replacement


def test_all_reduce_sum(spark, nums):
    s = D.all_reduce_sum(nums, "v")
    assert s == pytest.approx(np.array([4950.0, 100.0]))


def test_co_group(spark):
    left = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k long, s string")
    right = spark.createDataFrame([(1, 10.0), (2, 20.0), (2, 30.0)], "k long, x double")

    def merge(l, r):
        import pandas as pd
        return pd.DataFrame({"k": [l["k"].iloc[0] if len(l) else r["k"].iloc[0]],
                             "n_left": [len(l)], "sum_right": [r["x"].sum()]})

    out = D.co_group(left, right, "k", "k", merge, "k long, n_left long, sum_right double")
    got = {r["k"]: (r["n_left"], r["sum_right"]) for r in out.collect()}
    assert got[1] == (2, 10.0) and got[2] == (1, 50.0)


def test_window_all_global_and_count(spark, nums):
    row = D.window_all_and_process(nums, Windows.global_windows(), None,
                                   F.sum("x").alias("s")).first()
    assert row["s"] == pytest.approx(4950.0)
    out = D.window_all_and_process(nums, Windows.count_tumbling(25), None,
                                   F.count("*").alias("n"))
    assert sorted(r["n"] for r in out.collect()) == [25, 25, 25, 25]


def test_generate_batch_data(spark, nums):
    batches = list(D.generate_batch_data(nums, 30))
    sizes = sorted(b.count() for b in batches)
    assert sum(sizes) == 100 and len(batches) == 4


def test_with_broadcast(spark, nums):
    dim = spark.createDataFrame([(0, "even"), (1, "odd")], "k long, name string")
    out = D.with_broadcast(nums.withColumn("k", F.col("id") % 2), dim, "k")
    assert out.count() == 100
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_window_all_session(spark):
    """EventTimeSessionWindows.withGap → F.session_window groups."""
    from pyspark.sql import functions as F
    from flink_ml_spark.common.dataflow import window_all_and_process
    from flink_ml_spark.streaming import Windows
    rows = [(0.0, 1.0), (1000.0, 2.0), (10000.0, 3.0), (10500.0, 4.0)]
    df = spark.createDataFrame(rows, "ts double, v double") \
        .withColumn("t", F.timestamp_millis(F.col("ts").cast("long")))
    out = window_all_and_process(
        df, Windows.event_time_session(2000), "t",
        F.sum("v").alias("s")).orderBy("window_start").collect()
    assert [r["s"] for r in out] == [3.0, 7.0]


def test_top_k_per_key_matches_single_stage(spark):
    from pyspark.sql import Window, functions as F
    from flink_ml_spark.common.dataflow import top_k_per_key

    rows = [(i % 5, i, float((i * 37) % 101)) for i in range(500)]
    df = spark.createDataFrame(rows, "key int, id int, score double")
    order = [F.desc("score"), F.asc("id")]
    got = top_k_per_key(df, ["key"], order, 7, salt_cols=["id"],
                        rank_col="rank", salt_buckets=8)
    w = Window.partitionBy("key").orderBy(*order)
    want = (df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 7))
    g = {(r["key"], r["id"], r["rank"]) for r in got.collect()}
    e = {(r["key"], r["id"], r["rank"]) for r in want.collect()}
    assert g == e


def test_with_contiguous_id_gap_free(spark):
    from flink_ml_spark.common.dataflow import with_contiguous_id

    df = spark.range(0, 1000).repartition(13)
    out = with_contiguous_id(df, "seq")
    seqs = sorted(r["seq"] for r in out.collect())
    assert seqs == list(range(1, 1001))
    # no unpartitioned Window in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_window_all_sliding(spark):
    from flink_ml_spark.common.dataflow import window_all_and_process
    from flink_ml_spark.streaming.windows import Windows
    import pyspark.sql.functions as F
    rows = [(t * 1000, 1.0) for t in [0, 5, 12, 19, 31]]
    df = spark.createDataFrame(rows, "ms long, v double") \
        .select(F.timestamp_millis("ms").alias("ts"), "v")
    out = window_all_and_process(df, Windows.event_time_sliding(20_000, 10_000),
                                 "ts", F.count("*").alias("n"))
    got = {int(r["window_start"].timestamp()) * 1000: r["n"]
           for r in out.collect()}
    # each event lands in exactly 2 hopping windows
    assert got == {-10_000: 2, 0: 4, 10_000: 2, 20_000: 1, 30_000: 1}


def test_windows_sliding_json_roundtrip():
    from flink_ml_spark.streaming.windows import Windows
    w = Windows.event_time_sliding(60_000, 15_000)
    assert Windows.from_json(w.to_json()) == w
    import pytest
    with pytest.raises(ValueError):
        Windows.event_time_sliding(10, 20)


def test_window_all_processing_time_with_injected_clock(spark):
    # processing-time windows = arrival stamp through the event-time
    # machinery; a deterministic injected clock verifies the window math
    # (wall-clock stamps are inherently non-replayable)
    from flink_ml_spark.streaming.windows import Windows
    import pyspark.sql.functions as F
    rows = [(i, float(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "i long, v double")
    clock = F.timestamp_millis(F.col("i") * 7_000)  # arrivals 7 s apart
    out = D.window_all_and_process(
        df, Windows.processing_time_tumbling(10_000), None,
        F.count("*").alias("n"), clock=clock)
    got = {int(r["window_start"].timestamp()) * 1000: r["n"]
           for r in out.collect()}
    assert got == {0: 2, 10_000: 1, 20_000: 2, 30_000: 1}
    # session flavor: a >gap silence splits the stream
    clock2 = F.timestamp_millis(
        F.when(F.col("i") < 3, F.col("i") * 1_000)
         .otherwise(F.col("i") * 1_000 + 60_000))
    out2 = D.window_all_and_process(
        df, Windows.processing_time_session(5_000), None,
        F.count("*").alias("n"), clock=clock2)
    assert sorted(r["n"] for r in out2.collect()) == [3, 3]


def test_window_all_processing_time_wall_clock_default(spark):
    # default clock: every row of one batch job stamps within the job's
    # wall-clock moment, so a coarse window holds them all
    from flink_ml_spark.streaming.windows import Windows
    df = spark.createDataFrame([(i,) for i in range(10)], "i long")
    out = D.window_all_and_process(
        df, Windows.processing_time_tumbling(3600_000), None,
        F.count("*").alias("n")).collect()
    assert len(out) == 1 and out[0]["n"] == 10


def test_windows_processing_time_json_roundtrip():
    from flink_ml_spark.streaming.windows import Windows
    w = Windows.processing_time_tumbling(10_000)
    assert w.is_processing_time
    assert Windows.from_json(w.to_json()) == w
