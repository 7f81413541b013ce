"""KMeans / KMeansModel — Lloyd's algorithm as a driver loop.

Reference: clustering/kmeans/KMeans.java:84.  The reference runs Lloyd's
inside the bounded-iteration framework: broadcast centroids → per-partition
partial sums (CentroidsUpdateAccumulator, KMeans.java:219-315) →
countWindowAll(parallelism) merge (:171-175).  Spark-first (SURVEY §3.2):
per round ONE job — assignment is a codegen'd k×dim distance expression
against literal centroids (no UDF, no broadcast var needed: model is part
of the plan), partial sums happen in HashAggregate map-side, and only
k×dim numbers reach the driver.  Init: ``random`` = distributed
reservoir-style sample (df.sample → limit k, mirroring the 2-round sample
in DataStreamUtils.java:300-321) or ``first_distinct`` (deterministic — the
oracle-checkable path).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..api import Estimator, Model
from ..common import vector as V
from ..common.distance import closest_centroid_expr, distance_np
from ..param import (HasDistanceMeasure, HasFeaturesCol, HasMaxIter,
                     HasPredictionCol, HasSeed, HasTol, IntParam,
                     ParamValidators, StringParam)


class KMeans(Estimator, HasFeaturesCol, HasPredictionCol, HasDistanceMeasure,
             HasMaxIter, HasTol, HasSeed):
    k = IntParam("k", "Number of clusters.", 2, ParamValidators.gt(1))
    initMode = StringParam("initMode", "random | first_distinct.", "random",
                           ParamValidators.in_array(["random", "first_distinct"]))

    def fit(self, *inputs: DataFrame) -> "KMeansModel":
        from pyspark import StorageLevel
        (df,) = inputs
        fcol = self.get_("featuresCol")
        k = self.get_("k")
        measure = self.get_("distanceMeasure")
        sc = df.sparkSession.sparkContext
        data = df.select(V.dense_input(df, fcol).alias("__f__"))
        # Regime-gated by measurement (PLANS.md):
        # - tiny input (rows*dim <= 2^21 values): ONE Arrow collect, Lloyd
        #   runs driver-local with identical arithmetic — 20 rounds of task
        #   scheduling dwarf the compute at that size.
        # - narrow vectors: columnar cache + per-round codegen'd k*dim
        #   literal-distance assignment folded into a groupBy partial agg —
        #   only k*(dim+1) doubles cross the shuffle per round
        #   (CentroidsUpdateAccumulator + countWindowAll merge of
        #   KMeans.java:219-315,:171-175, with no p=1 stage on data).
        # - wide vectors (k*dim >= 256: unrolled codegen overflows janino's
        #   64 KB method limit): per-round Arrow partials — one numpy gemm
        #   per partition, k*(dim+1) doubles out.
        par = sc.defaultParallelism
        # regime gate from ONE aggregation job (r10: the separate
        # count() + first() probe pair fused — any row's width is the
        # width the fit would read); the local path then collects in ONE
        # pass with no persist plans to compile (same restructure as
        # sgd())
        sparse = V.is_sparse_type(df, fcol)
        probe = df.agg(F.count(F.lit(1)).alias("__n__"),
                       (F.first(F.col(fcol)["size"]) if sparse
                        else F.first(fcol)).alias("__x__")).first()
        n = int(probe["__n__"])
        dim = 0 if probe["__x__"] is None else (
            int(probe["__x__"]) if sparse else len(probe["__x__"]))
        from ..common.optimizer import LOCAL_SOLVE_MAX_VALUES
        local = n * dim <= LOCAL_SOLVE_MAX_VALUES
        X_all = None
        cached = None
        if local:
            # vectorized Arrow collect (r10): flatten the list column to
            # one contiguous buffer instead of np.stack over n tiny
            # per-row ndarrays (GIL-bound ~seconds at bench scale);
            # reshape(n, dim) fails loudly on ragged rows, as stack did
            tbl = data.toArrow()
            if tbl.num_rows:
                flat = tbl.column("__f__").combine_chunks().flatten() \
                    .to_numpy(zero_copy_only=False)
                X_all = flat.reshape(tbl.num_rows, dim) \
                    .astype(float, copy=False)
            else:
                X_all = np.zeros((0, dim))
            centers = self._init_centers(data, k, X_all)
            prepared = None
        else:
            if data.rdd.getNumPartitions() < par:
                data = data.repartition(par)
            cached = data.persist(StorageLevel.MEMORY_AND_DISK)
            prepared = cached
            # no separate materialization count: the init job's full
            # scan (distinct/sample below) populates the cache in place
            centers = self._init_centers(prepared, k, None, n=n)
        dim = centers.shape[1]
        wide = k * dim >= 256
        if prepared is not None:
            # size the per-round assignment jobs to the data (~16 MB of
            # cache per task, capped at core count — resolves to `par` at
            # production scale): Lloyd rounds are scheduling-bound on
            # small caches.  coalesce is narrow — tasks read the cached
            # blocks in place, and unpersist below targets `cached`.
            target = max(1, min(par, int(n * (dim + 1) * 8 // (16 << 20)) + 1))
            if prepared.rdd.getNumPartitions() > 2 * target:
                prepared = prepared.coalesce(target)
        sum_cols = [F.sum(F.col("__f__")[i]).alias(f"s{i}") for i in range(dim)]
        from ..common.optimizer import _NoAQE
        _aqe = _NoAQE(df.sparkSession) if not local else None
        if _aqe:
            _aqe.__enter__()
        try:
            for _ in range(self.get_("maxIter")):
                if local:
                    cid = distance_np(X_all, centers, measure).argmin(axis=1)
                    sums = np.zeros_like(centers)
                    counts = np.bincount(cid, minlength=k).astype(float)
                    for j in np.unique(cid):
                        sums[j] = X_all[cid == j].sum(axis=0)
                elif wide:
                    sums, counts = _wide_partials(prepared, centers, measure)
                else:
                    cid = closest_centroid_expr(F.col("__f__"), centers, measure)
                    rows = (prepared.groupBy(cid.alias("__c__"))
                            .agg(*sum_cols, F.count("*").alias("n"))
                            .collect())
                    sums = np.zeros_like(centers)
                    counts = np.zeros(len(centers))
                    for r in rows:
                        sums[r["__c__"]] = [r[f"s{i}"] for i in range(dim)]
                        counts[r["__c__"]] = r["n"]
                new_centers = centers.copy()
                nz = counts > 0
                new_centers[nz] = sums[nz] / counts[nz, None]
                shift = float(np.sqrt(((new_centers - centers) ** 2).sum(axis=1)).max())
                centers = new_centers
                if shift <= self.get_("tol"):
                    break
        finally:
            if _aqe:
                _aqe.__exit__()
            if prepared is not None:
                cached.unpersist()
        model = KMeansModel()
        model.set_(featuresCol=fcol, predictionCol=self.get_("predictionCol"),
                   distanceMeasure=measure)
        model.model_data = {"centroids": centers.tolist()}
        return model

    def _init_centers(self, data: DataFrame, k: int,
                      X_local: np.ndarray | None = None,
                      n: int | None = None) -> np.ndarray:
        if self.get_("initMode") == "first_distinct":
            # deterministic: k lexicographically-smallest distinct vectors
            # (np.unique(axis=0) and Spark array ordering agree)
            if X_local is not None:
                arr = np.unique(X_local, axis=0)[:k]
            else:
                rows = (data.select("__f__").distinct()
                        .orderBy(F.col("__f__")).limit(k).collect())
                arr = np.array([list(r["__f__"]) for r in rows], dtype=float)
            if len(arr) < k:
                raise ValueError(f"KMeans: fewer than k={k} distinct points")
            return arr
        seed = self.get_("seed")
        if X_local is not None:
            rng = np.random.RandomState(seed if seed is not None else 0)
            uniq = np.unique(X_local, axis=0)
            if len(uniq) < k:
                raise ValueError(f"KMeans: fewer than k={k} distinct points")
            idx = rng.choice(len(uniq), size=k, replace=False)
            return uniq[idx]
        if n is None:
            n = data.count()
        frac = min(1.0, (10.0 * k) / max(n, 1))
        sampled = data.sample(False, frac, seed=seed if seed is not None else 0)
        rows = sampled.distinct().limit(k).collect()
        if len(rows) < k:
            rows = data.distinct().limit(k).collect()
        if len(rows) < k:
            raise ValueError(f"KMeans: fewer than k={k} distinct points")
        return np.array([list(r["__f__"]) for r in rows], dtype=float)


def _wide_partials(prepared: DataFrame, centers: np.ndarray, measure: str):
    """One Lloyd round for wide vectors: per-partition Arrow batches ->
    numpy gemm assignment + per-cluster partial sums; only
    partitions x k x (dim+1) doubles come back (the
    CentroidsUpdateAccumulator shape, KMeans.java:219-315)."""
    import pickle

    import pyarrow as pa

    from ..common.distance import distance_np
    k, dim = centers.shape
    bc = prepared.sparkSession.sparkContext.broadcast((centers, measure))

    def partials(batches):
        C, meas = bc.value
        S = np.zeros((len(C), C.shape[1]))
        N = np.zeros(len(C))
        seen = False
        for b in batches:
            arr = b.column(0)
            n = len(arr)
            if not n:
                continue
            seen = True
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            X = flat.reshape(n, len(flat) // n)
            cid = distance_np(X, C, meas).argmin(axis=1)
            for j in np.unique(cid):
                S[j] += X[cid == j].sum(axis=0)
            N += np.bincount(cid, minlength=len(C))
        if seen:
            yield pa.RecordBatch.from_arrays(
                [pa.array([pickle.dumps((S, N))])], ["blob"])

    rows = prepared.select("__f__").mapInArrow(partials, "blob binary").collect()
    bc.unpersist()
    parts = [pickle.loads(bytes(r[0])) for r in rows]
    sums = sum((p[0] for p in parts), np.zeros_like(centers))
    counts = sum((p[1] for p in parts), np.zeros(k))
    return sums, counts


class KMeansModel(Model, HasFeaturesCol, HasPredictionCol, HasDistanceMeasure):
    def _transform(self, df: DataFrame) -> DataFrame:
        centers = np.array(self.model_data["centroids"])
        if centers.size >= 256:
            from pyspark.sql.functions import pandas_udf
            measure = self.get_("distanceMeasure")

            @pandas_udf("int")
            def assign(vs):
                import pandas as pd
                from ..common.distance import distance_np
                if not len(vs):
                    return pd.Series([], dtype="int32")
                x = np.stack(vs.to_numpy())
                return pd.Series(distance_np(x, centers, measure)
                                 .argmin(axis=1).astype("int32"))

            return df.withColumn(self.get_("predictionCol"),
                                 assign(V.dense_input(df, self.get_("featuresCol"))))
        cid = closest_centroid_expr(V.dense_input(df, self.get_("featuresCol")),
                                    centers, self.get_("distanceMeasure"))
        return df.withColumn(self.get_("predictionCol"), cid)

    def transform_local(self, pdf):
        centers = np.array(self.model_data["centroids"])
        x = np.stack(pdf[self.get_("featuresCol")].to_numpy())
        d = distance_np(x, centers, self.get_("distanceMeasure"))
        out = pdf.copy()
        out[self.get_("predictionCol")] = d.argmin(axis=1).astype("int32")
        return out
