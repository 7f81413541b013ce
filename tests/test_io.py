"""Bucketed-table layout tests: the write-once shuffle pays for
exchange-free joins and aggregations afterwards (plan-verified)."""

import pytest

from pyspark.sql import functions as F

from flink_ml_spark.io import BucketedTableSink, read_table, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).alias("score"))
    sigs = spark.range(0, 10_000, 2).select(
        F.col("id").alias("doc_id"),
        F.sha2(F.col("id").cast("string"), 256).alias("sig"))
    write_bucketed(docs, "t_docs", ["doc_id"], 8, sort_cols=["doc_id"],
                   path=str(tmp_path / "docs"))
    write_bucketed(sigs, "t_sigs", ["doc_id"], 8, sort_cols=["doc_id"],
                   path=str(tmp_path / "sigs"))
    yield "t_docs", "t_sigs"
    spark.sql("DROP TABLE IF EXISTS t_docs")
    spark.sql("DROP TABLE IF EXISTS t_sigs")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    t1, t2 = bucketed_pair
    left, right = read_table(spark, t1), read_table(spark, t2)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = left.join(right, "doc_id")
        assert joined.count() == 5_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed scan satisfies the join's distribution: no shuffle
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_bucket_key_aggregation_has_no_exchange(spark, bucketed_pair):
    t1, _ = bucketed_pair
    agg = read_table(spark, t1).groupBy("doc_id").agg(F.sum("score").alias("s"))
    assert agg.count() == 10_000
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_unbucketed_join_does_exchange(spark, bucketed_pair):
    # control: the same join WITHOUT the bucketed layout shuffles — the
    # assertion above is meaningful, not vacuous
    t1, _ = bucketed_pair
    left = read_table(spark, t1)
    right = spark.range(0, 10_000, 2).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("sig"))
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = left.join(right, "doc_id")
        joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_bucketed_sink_stage_roundtrip(spark, tmp_path):
    df = spark.range(1_000).select(F.col("id").alias("doc_id"),
                                   (F.col("id") * 3).alias("v"))
    sink = BucketedTableSink(tableName="t_sink", bucketCols=["doc_id"],
                             numBuckets=4, sortCols=["doc_id"],
                             path=str(tmp_path / "sink"))
    try:
        out = sink.transform(df)[0]
        assert out.count() == 1_000
        assert {r["doc_id"] for r in out.limit(5).collect()} <= set(range(1_000))
        # read-back carries the bucket spec: key agg is exchange-free
        agg = out.groupBy("doc_id").count()
        agg.count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_sink")
