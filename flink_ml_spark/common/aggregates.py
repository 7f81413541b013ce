"""Distributed per-dimension statistics over ``array<double>`` columns.

Replaces the reference's hand-rolled partial-then-final aggregations
(DataStreamUtils.reduce/aggregate, flink-ml-core/.../datastream/
DataStreamUtils.java:155-295; StandardScaler partials at
StandardScaler.java:75-101).  Spark-first plan: ``posexplode`` the vector
then ``groupBy(pos)`` — Catalyst's HashAggregate does map-side partial
aggregation, so only ``dim`` rows per partition hit the shuffle regardless
of row count; the final ``dim``-row result is collected to the driver
(fixed-size model state only — 100 TB-safe, no p=1 stage on raw data).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def summarize_vector_col(df: DataFrame, col: str, metrics=("count", "mean", "std", "min", "max")) -> dict[str, np.ndarray]:
    """Compute per-dimension stats of an array<double> column.

    Returns dict of metric -> np.ndarray(dim).  Supported metrics:
    count, mean, std (unbiased, stddev_samp), var, min, max, max_abs,
    l1, l2sq, sum.
    """
    from . import vector as V
    exploded = df.select(F.posexplode(V.dense_input(df, col)).alias("pos", "x"))
    aggs = [
        F.count("x").alias("count"),
        F.sum("x").alias("sum"),
        F.avg("x").alias("mean"),
        F.stddev_samp("x").alias("std"),
        F.var_samp("x").alias("var"),
        F.min("x").alias("min"),
        F.max("x").alias("max"),
        F.max(F.abs(F.col("x"))).alias("max_abs"),
        F.sum(F.abs(F.col("x"))).alias("l1"),
        F.sum(F.col("x") * F.col("x")).alias("l2sq"),
    ]
    rows = exploded.groupBy("pos").agg(*aggs).orderBy("pos").collect()
    dim = len(rows)
    out: dict[str, np.ndarray] = {}
    for m in set(metrics) | {"count"}:
        out[m] = np.array([float(r[m]) if r[m] is not None else 0.0 for r in rows])
    out["dim"] = dim  # type: ignore[assignment]
    return out


def quantiles_vector_col(df: DataFrame, col: str, probs: list[float],
                         relative_error: float = 0.001) -> np.ndarray:
    """Per-dimension approximate quantiles of an array<double> column.

    Greenwald-Khanna equivalent (reference QuantileSummary.java:42) via
    Spark's built-in mergeable percentile_approx sketch.  With
    ``relative_error == 0`` uses the exact interpolating ``F.percentile``
    (matches SQL percentile_cont/quantile_cont — used by oracle-checked
    paths; the sketch remains the 100 TB path).
    Returns array of shape (dim, len(probs)).
    """
    from . import vector as V
    exploded = df.select(F.posexplode(V.dense_input(df, col)).alias("pos", "x"))
    if relative_error == 0:
        return _exact_quantiles(exploded, probs)
    parr = F.array(*[F.lit(p) for p in probs])
    accuracy = max(1, int(1.0 / relative_error))
    agg = F.percentile_approx("x", parr, F.lit(accuracy)).alias("q")
    rows = exploded.groupBy("pos").agg(agg).orderBy("pos").collect()
    return np.array([list(r["q"]) for r in rows], dtype=float)


def _exact_quantiles(exploded: DataFrame, probs: list[float]) -> np.ndarray:
    """Exact interpolating quantiles (percentile_cont semantics) via order
    statistics: groupBy (pos, value) counts — a PARALLEL hash shuffle with
    map-side combine — then a per-dim cumulative-count window over the
    distinct values and a filter down to only the rows holding a target
    rank.  Avoids ``F.percentile``'s merge of per-partition value→count
    maps at one reducer, which is quadratic-ish pain on high-cardinality
    doubles (measured 1 s for one 600 k-distinct dim; this path is ~0.2 s
    and scales out)."""
    from pyspark.sql import Window

    counts = (exploded.where(F.col("x").isNotNull())
              .groupBy("pos", "x").agg(F.count("*").alias("c")))
    counts = counts.persist()
    w = (Window.partitionBy("pos").orderBy("x")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = counts.withColumn("cum", F.sum("c").over(w))
    # per-dim row counts come from the (much smaller) cached counts
    # relation — one scan of the base data total
    ns = {r["pos"]: r["n"] for r in
          counts.groupBy("pos").agg(F.sum("c").alias("n")).collect()}
    # target order-statistic indices per dim: h = (n-1)p → floor/ceil
    targets: dict[int, set[int]] = {}
    for pos, n in ns.items():
        t = set()
        for p in probs:
            h = (n - 1) * p
            t.add(int(np.floor(h)))
            t.add(int(np.ceil(h)))
        targets[pos] = t
    cond = None
    for pos, idxs in targets.items():
        hit = None
        for i in sorted(idxs):
            c = (F.col("cum") - F.col("c") <= i) & (F.lit(i) < F.col("cum"))
            hit = c if hit is None else (hit | c)
        branch = (F.col("pos") == pos) & hit
        cond = branch if cond is None else (cond | branch)
    rows = cum.where(cond).select("pos", "x", "c", "cum").collect()
    counts.unpersist()
    # value at integer rank i (0-based over the sorted multiset)
    val_at: dict[int, dict[int, float]] = {}
    for r in rows:
        lo, hi = r["cum"] - r["c"], r["cum"]
        for i in targets[r["pos"]]:
            if lo <= i < hi:
                val_at.setdefault(r["pos"], {})[i] = float(r["x"])
    out = []
    for pos in sorted(ns):
        n = ns[pos]
        qs = []
        for p in probs:
            h = (n - 1) * p
            lo, hi = int(np.floor(h)), int(np.ceil(h))
            vlo, vhi = val_at[pos][lo], val_at[pos][hi]
            qs.append(vlo + (h - lo) * (vhi - vlo))
        out.append(qs)
    return np.array(out, dtype=float)


def weighted_moments(df: DataFrame, features_col: str, weight_col: str | None):
    """Weighted per-dim (sum_w, sum_wx, sum_wx2) — shared by learners."""
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    ex = df.select(w.alias("w"), F.posexplode(F.col(features_col)).alias("pos", "x"))
    rows = (ex.groupBy("pos")
            .agg(F.sum("w").alias("sw"),
                 F.sum(F.col("w") * F.col("x")).alias("swx"),
                 F.sum(F.col("w") * F.col("x") * F.col("x")).alias("swx2"))
            .orderBy("pos").collect())
    return (np.array([r["sw"] for r in rows]),
            np.array([r["swx"] for r in rows]),
            np.array([r["swx2"] for r in rows]))
