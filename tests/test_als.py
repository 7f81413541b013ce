"""ALS matrix factorization: fit quality, bit-determinism, persistence."""

import math

import pytest
from pyspark.sql import functions as F

from flink_ml_spark.recommendation import ALS, ALSModel


def _synthetic(spark, n_users=40, n_items=30):
    """Planted rank-2 structure: r(u,i) = a_u·x_i + b_u·y_i ≥ 0."""
    rows = []
    for u in range(n_users):
        au, bu = 1.0 + (u % 5) * 0.5, 0.5 + (u % 3) * 0.5
        for i in range(n_items):
            if (u + i) % 3 == 0:  # ~1/3 observed
                xi, yi = 1.0 + (i % 4) * 0.4, 0.8 + (i % 7) * 0.2
                rows.append((u, i, au * xi + bu * yi))
    return spark.createDataFrame(rows, "user long, item long, rating double")


def _rmse(scored):
    row = scored.agg(F.sqrt(F.avg(
        (F.col("rating") - F.col("prediction")) ** 2))).first()
    return float(row[0])


def test_als_fits_planted_structure(spark):
    df = _synthetic(spark)
    m = ALS(rank=2, maxIter=6, regParam=0.05).fit(df)
    scored = m.transform(df)[0]
    assert scored.filter(F.col("prediction").isNull()).count() == 0
    rmse = _rmse(scored)
    mean = df.agg(F.avg("rating")).first()[0]
    base = df.agg(F.sqrt(F.avg((F.col("rating") - mean) ** 2))).first()[0]
    # a planted rank-2 matrix should fit far better than the mean
    assert rmse < 0.25 * base, (rmse, base)


def test_als_bit_deterministic_across_partitioning(spark):
    """The decimal-exact normal-equation sums make factors IDENTICAL
    regardless of input partitioning — the whole point of the
    fixed-point design."""
    df = _synthetic(spark)
    m1 = ALS(rank=2, maxIter=3).fit(df)
    m2 = ALS(rank=2, maxIter=3).fit(df.repartition(17))
    f1 = sorted(tuple(r) for r in m1.user_factors.collect())
    f2 = sorted(tuple(r) for r in m2.user_factors.collect())
    assert f1 == f2
    g1 = sorted(tuple(r) for r in m1.item_factors.collect())
    g2 = sorted(tuple(r) for r in m2.item_factors.collect())
    assert g1 == g2


def test_als_general_rank_path(spark):
    df = _synthetic(spark)
    m = ALS(rank=3, maxIter=4, regParam=0.05).fit(df)
    assert len(m.user_factors.columns) == 4  # u + f0..f2
    rmse = _rmse(m.transform(df)[0])
    assert math.isfinite(rmse) and rmse < 1.0
    # determinism holds on the numpy-solve path too
    m2 = ALS(rank=3, maxIter=4, regParam=0.05).fit(df.repartition(11))
    assert (sorted(tuple(r) for r in m.item_factors.collect())
            == sorted(tuple(r) for r in m2.item_factors.collect()))


def test_als_recommend_for_users(spark):
    df = _synthetic(spark)
    m = ALS(rank=2, maxIter=4, regParam=0.05).fit(df)
    users = spark.createDataFrame([(0,), (1,), (7,)], "user long")
    rec = m.recommend_for_users(users, k=5).collect()
    per_u = {}
    for r in rec:
        per_u.setdefault(r["user"], []).append(r)
    assert set(per_u) == {0, 1, 7}
    for u, rows in per_u.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        # top-k agrees with brute-force scoring of all items
        all_items = df.select("item").distinct()
        pairs = all_items.withColumn("user", F.lit(u))
        truth = sorted(((r["prediction"], r["item"]) for r in
                        m.transform(pairs)[0].collect()),
                       key=lambda t: (-t[0], t[1]))[:5]
        assert [r["item"] for r in rows] == [i for _, i in truth]
    # broadcast cap fails fast instead of melting the cluster
    import pytest as _p
    with _p.raises(ValueError, match="broadcast cap"):
        m.recommend_for_users(users, k=2, max_broadcast_items=3)


def test_als_cold_start_and_persistence(spark, tmp_path):
    from flink_ml_spark.api import Stage
    df = _synthetic(spark)
    m = ALS(rank=2, maxIter=3).fit(df)
    # unknown user/item -> null prediction, not a crash
    cold = spark.createDataFrame([(999, 0), (0, 999)],
                                 "user long, item long")
    got = m.transform(cold)[0].collect()
    assert all(r["prediction"] is None for r in got)
    m.save(str(tmp_path / "als"))
    back = Stage.load(spark, str(tmp_path / "als"))
    a = sorted((r["user"], r["item"], round(r["prediction"], 9))
               for r in m.transform(df)[0].collect())
    b = sorted((r["user"], r["item"], round(r["prediction"], 9))
               for r in back.transform(df)[0].collect())
    assert a == b
    # model-data round trip
    tables = m.get_model_data(spark)
    m3 = ALSModel(userCol="user", itemCol="item")
    m3.set(ALSModel.rank, 2)
    m3.set_model_data(*tables)
    c = sorted((r["user"], r["item"], round(r["prediction"], 9))
               for r in m3.transform(df)[0].collect())
    assert a == c


def test_als_long_lane_matches_decimal_lane(spark):
    """The overflow-guard fast lane (plain long sums when the per-half-
    step bound proves no int64 overflow) must be EXACT-equal to the
    decimal lane on data inside the envelope."""
    df = _synthetic(spark)
    fast = ALS(rank=2, maxIter=3)
    m1 = fast.fit(df)
    assert set(fast._lane_log) == {"long"}, fast._lane_log
    slow = ALS(rank=2, maxIter=3)
    slow._force_decimal = True
    m2 = slow.fit(df)
    assert set(slow._lane_log) == {"decimal"}, slow._lane_log
    for a, b in ((m1.user_factors, m2.user_factors),
                 (m1.item_factors, m2.item_factors)):
        assert (sorted(tuple(r) for r in a.collect())
                == sorted(tuple(r) for r in b.collect()))


def test_als_decimal_fallback_on_constructed_overflow(spark):
    """Ratings huge enough that max|f|*max|r|*max_cnt >= 2**62 must
    route through the decimal lane (no silent int64 wrap) and still
    produce finite factors on the grid."""
    rows = [(u, i, 2.0e12 + u + i)
            for u in range(6) for i in range(5) if (u + i) % 2 == 0]
    df = spark.createDataFrame(
        rows, "user long, item long, rating double")
    est = ALS(rank=2, maxIter=2, regParam=0.1)
    m = est.fit(df)
    # rhs sums carry max|r| ~ 2e18 grid units -> the guard must refuse
    # the long lane on every half-step
    assert set(est._lane_log) == {"decimal"}, est._lane_log
    for r in m.user_factors.collect():
        assert r["f0"] is not None and r["f1"] is not None
