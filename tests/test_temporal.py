"""asof_join / range_join semantics, randomized against pandas
merge_asof and a naive O(n^2) containment scan."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_ml_spark.common.temporal import asof_join, range_join


def _rand_frames(seed, n_left=120, n_right=90, n_keys=7):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_left),
        "t": rng.integers(0, 1000, n_left).astype("int64"),
        "lv": rng.normal(size=n_left),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_right),
        # unique (k, rt) so the matched row is well-defined
        "rt": np.arange(n_right, dtype="int64") * 7 + rng.integers(0, 7),
        "rv": rng.normal(size=n_right),
    })
    return left, right


def _pandas_asof(left, right, direction, tolerance=None):
    lo = left.sort_values("t").reset_index(drop=True)
    ro = right.sort_values("rt").reset_index(drop=True)
    kw = {} if tolerance is None else {"tolerance": tolerance}
    return pd.merge_asof(lo, ro, left_on="t", right_on="rt", by="k",
                         direction=direction, **kw)


def _canon(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("seed", [0, 1])
def test_asof_matches_pandas(spark, direction, seed):
    left, right = _rand_frames(seed)
    out = asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                    on="k", left_time="t", right_time="rt",
                    direction=direction).toPandas()
    exp = _pandas_asof(left, right, direction)
    got = out[["k", "t", "lv", "rt_right", "rv"]].rename(
        columns={"rt_right": "rt"})
    pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                  check_dtype=False, atol=1e-12)


def test_asof_tolerance(spark):
    left, right = _rand_frames(3)
    out = asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                    on="k", left_time="t", right_time="rt",
                    direction="backward", tolerance=25).toPandas()
    exp = _pandas_asof(left, right, "backward", tolerance=25)
    got = out[["k", "t", "lv", "rt_right", "rv"]].rename(
        columns={"rt_right": "rt"})
    pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                  check_dtype=False, atol=1e-12)


def test_asof_tie_is_inclusive_and_null_values_carry(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "t": [10, 20], "lv": [0.0, 0.0]}))
    right = spark.createDataFrame(
        [(1, 10, None), (1, 15, 5.0)],
        "k long, rt long, rv double")
    out = {r["t"]: r for r in
           asof_join(left, right, on="k", left_time="t", right_time="rt",
                     direction="backward").collect()}
    # tie at t=10 matches the rt=10 row, whose rv is genuinely NULL —
    # the struct carry must NOT skip to an older row
    assert out[10]["rt_right"] == 10 and out[10]["rv"] is None
    assert out[20]["rt_right"] == 15 and out[20]["rv"] == 5.0


def test_asof_null_keys_never_match(spark):
    left = spark.createDataFrame(
        [(None, 10, 1.0), (1, 10, 2.0)], "k long, t long, lv double")
    right = spark.createDataFrame(
        [(None, 5, 9.0), (1, 5, 7.0)], "k long, rt long, rv double")
    rows = {r["lv"]: r for r in
            asof_join(left, right, on="k", left_time="t",
                      right_time="rt").collect()}
    assert rows[1.0]["rv"] is None          # NULL key stays unmatched
    assert rows[2.0]["rv"] == 7.0
    assert len(rows) == 2                   # left rows all kept


def test_asof_collision_suffix(spark):
    left = spark.createDataFrame([(1, 10, 1.0)], "k long, t long, v double")
    right = spark.createDataFrame([(1, 5, 2.0)], "k long, rt long, v double")
    row = asof_join(left, right, on="k", left_time="t",
                    right_time="rt").collect()[0]
    assert row["v"] == 1.0 and row["v_right"] == 2.0


@pytest.mark.parametrize("width,include_end", [(10, True), (64, False),
                                               (1000, True)])
def test_range_join_matches_naive(spark, width, include_end):
    rng = np.random.default_rng(11)
    pts = pd.DataFrame({"k": rng.integers(0, 5, 150),
                        "pt": rng.integers(0, 500, 150).astype("int64"),
                        "pid": np.arange(150)})
    iv = pd.DataFrame({"k": rng.integers(0, 5, 40),
                       "s": rng.integers(0, 450, 40).astype("int64"),
                       "iid": np.arange(40)})
    iv["e"] = iv["s"] + rng.integers(-5, 120, 40)   # some degenerate
    out = range_join(spark.createDataFrame(pts), spark.createDataFrame(iv),
                     point_time="pt", start_col="s", end_col="e", on=["k"],
                     bucket_width=width, include_end=include_end).toPandas()
    naive = pts.merge(iv, on="k")
    ok = (naive.pt >= naive.s) & ((naive.pt <= naive.e) if include_end
                                  else (naive.pt < naive.e))
    exp = naive[ok]
    assert sorted(zip(out.pid, out.iid)) == sorted(zip(exp.pid, exp.iid))
    # exactly-once per pair
    assert len(out) == len(set(zip(out.pid, out.iid)))


def test_range_join_no_keys(spark):
    pts = spark.createDataFrame([(5,), (25,), (95,)], "pt long")
    iv = spark.createDataFrame([(0, 30), (90, 95)], "s long, e long")
    got = sorted((r["pt"], r["s"]) for r in
                 range_join(pts, iv, "pt", "s", "e",
                            bucket_width=7).collect())
    assert got == [(5, 0), (25, 0), (95, 90)]


@pytest.mark.parametrize("direction,width,tol", [("backward", 50, None),
                                                 ("forward", 37, None),
                                                 ("backward", 100, 25)])
def test_asof_skew_path_matches_default(spark, direction, width, tol):
    left, right = _rand_frames(7, n_left=200, n_right=150, n_keys=4)
    # hot key: one key owns half of both sides
    left.loc[left.index[:100], "k"] = 0
    right.loc[right.index[:75], "k"] = 0
    args = dict(on="k", left_time="t", right_time="rt",
                direction=direction, tolerance=tol)
    sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)
    base = asof_join(sl, sr, **args).toPandas()
    skew = asof_join(sl, sr, skew_bucket_width=width, **args).toPandas()
    pd.testing.assert_frame_equal(_canon(base), _canon(skew),
                                  check_dtype=False, atol=1e-12)


def test_funnel_analyzer_semantics(spark):
    from flink_ml_spark.common.temporal import FunnelAnalyzer
    rows = [
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        (2, "click", 5), (2, "view", 10), (2, "click", 8),  # click precedes view
        (3, "view", 10), (3, "purchase", 15),               # skips click
        (4, "click", 1), (4, "purchase", 2),                # never views
        (5, "view", 10), (5, "click", 40), (5, "purchase", 50),
    ]
    df = spark.createDataFrame(rows, "user long, etype string, ts long")
    f = FunnelAnalyzer("user", "etype", "ts", ["view", "click", "purchase"])
    got = {r["user"]: (r["t1"], r["t2"], r["t3"], r["stages_completed"])
           for r in f.transform(df).collect()}
    assert got == {1: (10, 20, 30, 3),
                   2: (10, None, None, 1),
                   3: (10, None, None, 1),   # strictly ordered funnel
                   5: (10, 40, 50, 3)}       # user 4 never reached stage 1


def test_funnel_analyzer_max_span(spark):
    from flink_ml_spark.common.temporal import FunnelAnalyzer
    rows = [(5, "view", 10), (5, "click", 40), (5, "purchase", 50),
            (6, "view", 0), (6, "click", 10), (6, "purchase", 60)]
    df = spark.createDataFrame(rows, "user long, etype string, ts long")
    f = FunnelAnalyzer("user", "etype", "ts", ["view", "click", "purchase"],
                       max_span_ms=25)
    got = {r["user"]: r["stages_completed"]
           for r in f.transform(df).collect()}
    # user 5: click at 40 > t1+25 -> stops at 1; user 6: purchase at 60
    # outside span -> stops at 2
    assert got == {5: 1, 6: 2}


def test_funnel_analyzer_validation(spark):
    from flink_ml_spark.common.temporal import FunnelAnalyzer
    import pytest as pt
    with pt.raises(ValueError, match="at least 2"):
        FunnelAnalyzer("u", "t", "ts", ["only"])
    with pt.raises(ValueError, match="distinct"):
        FunnelAnalyzer("u", "t", "ts", ["a", "a"])


def test_cohort_retention_hand_triangle(spark):
    from flink_ml_spark.common.temporal import CohortRetention
    rows = [(1, 0), (1, 25), (2, 5), (2, 12), (2, 25), (3, 11)]
    df = spark.createDataFrame(rows, "user long, ts long")
    got = {(r["cohort"], r["k"]): (r["users"], r["cohort_size"], r["rate"])
           for r in CohortRetention("user", "ts", 10).transform(df).collect()}
    assert got == {(0, 0): (2, 2, 1.0), (0, 1): (1, 2, 0.5),
                   (0, 2): (2, 2, 1.0), (1, 0): (1, 1, 1.0)}
    import pytest as pt
    with pt.raises(ValueError, match="period_ms"):
        CohortRetention("user", "ts", 0)
