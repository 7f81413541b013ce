"""Swing, MinHashLSH, AgglomerativeClustering tests."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_ml_spark.clustering import AgglomerativeClustering
from flink_ml_spark.clustering.agglomerativeclustering import agglomerate
from flink_ml_spark.feature import MinHashLSH
from flink_ml_spark.recommendation import Swing


def test_swing_hand_computed(spark):
    # 3 users, u0/u1 share items {1,2}, u2 only item 3
    rows = [(0, 1), (0, 2), (1, 1), (1, 2), (2, 3)]
    df = spark.createDataFrame(rows, "user long, item long")
    s = Swing(userCol="user", itemCol="item", minUserBehavior=1,
              alpha1=0, alpha2=0, beta=0.0, k=10)
    out = {(r["item"], r["similar_item"]): r["score"]
           for r in s.transform(df)[0].collect()}
    # w_u = (0+n)^0 = 1; pair (u0,u1): common = {1,2}, c=2 → pw = 1/2
    # sim(1,2) = sim(2,1) = 0.5
    assert out[(1, 2)] == pytest.approx(0.5)
    assert out[(2, 1)] == pytest.approx(0.5)
    assert (3, 1) not in out


def test_swing_weighting(spark):
    rows = [(0, 1), (0, 2), (0, 3), (1, 1), (1, 2)]
    df = spark.createDataFrame(rows, "user long, item long")
    s = Swing(userCol="user", itemCol="item", minUserBehavior=1,
              alpha1=1, alpha2=1, beta=1.0, k=10)
    out = {(r["item"], r["similar_item"]): r["score"]
           for r in s.transform(df)[0].collect()}
    # w_u0 = 1/(1+3) = 0.25, w_u1 = 1/(1+2) ≈ 0.3333; common {1,2}, c=2
    expect = 0.25 * (1 / 3) / (1 + 2)
    assert out[(1, 2)] == pytest.approx(expect)


def test_minhash_lsh_similarity_join(spark):
    # sets with high overlap vs disjoint
    rows_a = [(0, [1.0, 1.0, 1.0, 0.0, 0.0, 0.0]),
              (1, [0.0, 0.0, 0.0, 1.0, 1.0, 1.0])]
    rows_b = [(10, [1.0, 1.0, 1.0, 1.0, 0.0, 0.0]),
              (11, [0.0, 0.0, 0.0, 0.0, 1.0, 1.0])]
    a = spark.createDataFrame(rows_a, "id long, vec array<double>")
    b = spark.createDataFrame(rows_b, "id long, vec array<double>")
    model = MinHashLSH(inputCol="vec", outputCol="hashes", seed=7,
                       numHashTables=8, numHashFunctionsPerTable=1).fit(a)
    joined = model.approx_similarity_join(a, b, threshold=0.6)
    got = {(r["id_a"], r["id_b"]): r["distCol"] for r in joined.collect()}
    # jaccard({0,1,2},{0,1,2,3}) = 3/4 → dist 0.25 ≤ 0.6
    assert got.get((0, 10)) == pytest.approx(0.25)
    # jaccard({3,4,5},{4,5}) = 2/3 → dist 1/3
    assert got.get((1, 11)) == pytest.approx(1 / 3)


def test_minhash_empty_and_zero_length_vectors(spark):
    # all-zero set → reference leaves every min-hash at HASH_PRIME
    # (MinHashLSHModelData.java:135-137); zero-length dense vector must not
    # blow up the active-index sequence
    from flink_ml_spark.llmdata.dedup import MINHASH_PRIME
    rows = [(0, [0.0, 0.0, 0.0]), (1, []), (2, [1.0, 0.0, 1.0])]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    model = MinHashLSH(inputCol="vec", outputCol="h", seed=5,
                       numHashTables=2, numHashFunctionsPerTable=2).fit(df)
    out = {r["id"]: r["h"] for r in model._transform(df).collect()}
    prime_sig = f"{MINHASH_PRIME}_{MINHASH_PRIME}"
    assert out[0] == [prime_sig, prime_sig]
    assert out[1] == [prime_sig, prime_sig]
    assert out[2] != out[0]
    # the join path tolerates the empty sets too (no element_at(col, 0))
    joined = model.approx_similarity_join(df, df, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in joined.collect()}
    assert (2, 2) in got


def test_minhash_lsh_ann(spark):
    rows = [(i, [1.0 if j in (i, i + 1, i + 2) else 0.0 for j in range(10)])
            for i in range(6)]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    model = MinHashLSH(inputCol="vec", outputCol="h", seed=3,
                       numHashTables=6).fit(df)
    nn = model.approx_nearest_neighbors(df, key=[0, 1, 2], k=2).collect()
    assert nn[0]["id"] == 0 and nn[0]["distCol"] == pytest.approx(0.0)


def test_agglomerate_numpy_ward():
    # two tight pairs far apart → 2 clusters
    x = np.array([[0.0, 0.0], [0.0, 1.0], [10.0, 0.0], [10.0, 1.0]])
    labels, merges = agglomerate(x, "ward", 2, None)
    assert labels[0] == labels[1] and labels[2] == labels[3]
    assert labels[0] != labels[2]
    # first two merges at distance 1 (the tight pairs)
    assert merges[0][2] == pytest.approx(1.0)
    assert merges[1][2] == pytest.approx(1.0)


def test_agglomerate_single_linkage_chain():
    x = np.array([[0.0], [1.0], [2.1], [10.0]])
    labels, _ = agglomerate(x, "single", 2, None)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] != labels[0]


def test_agglomerative_spark(spark):
    pts = [(0, [0.0, 0.0]), (1, [0.0, 0.4]), (2, [9.0, 0.0]), (3, [9.0, 0.4])]
    df = spark.createDataFrame(pts, "id long, features array<double>")
    op = AgglomerativeClustering(featuresCol="features", predictionCol="c",
                                 numClusters=2, linkage="average")
    assigned, tree = op.transform(df)
    got = {r["id"]: r["c"] for r in assigned.collect()}
    assert got[0] == got[1] and got[2] == got[3] and got[0] != got[2]
    t = tree.collect()
    assert len(t) == 2  # 4 points → 2 merges to reach 2 clusters


def test_agglomerative_distance_threshold(spark):
    pts = [(0, [0.0]), (1, [0.5]), (2, [100.0])]
    df = spark.createDataFrame(pts, "id long, features array<double>")
    op = AgglomerativeClustering(featuresCol="features", predictionCol="c",
                                 linkage="single").set_(distanceThreshold=1.0)
    assigned, _ = op.transform(df)
    got = {r["id"]: r["c"] for r in assigned.collect()}
    assert got[0] == got[1] and got[2] != got[0]
