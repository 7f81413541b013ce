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
        data = df.select(F.col(fcol).alias("__f__"))
        # the cache is scanned maxIter times — pay one narrow shuffle up
        # front to balance it across all cores if the scan under-splits
        # (local single-file parquet is row-group-bound)
        par = df.sparkSession.sparkContext.defaultParallelism
        if data.rdd.getNumPartitions() < par:
            data = data.repartition(par)
        data = data.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            centers = self._init_centers(data, k)
            dim = centers.shape[1]
            wide = k * dim >= 256
            # per round ONE narrow job.  Narrow vectors: assignment is a
            # codegen'd k×dim literal-distance expression and partial sums
            # are map-side HashAggregate columns (no row multiplication —
            # a posexplode here shuffles dim× the input).  Wide vectors:
            # the literal expression would recompile ~k*dim codegen terms
            # every round, so assignment + partial sums move into one
            # numpy gemm per partition (mapInPandas, centroids broadcast),
            # emitting k×(dim+2) partials per partition.
            sum_cols = [F.sum(F.col("__f__")[i]).alias(f"s{i}") for i in range(dim)]
            for _ in range(self.get_("maxIter")):
                if wide:
                    sums, counts = _wide_partials(data, centers, measure)
                else:
                    cid = closest_centroid_expr(F.col("__f__"), centers, measure)
                    rows = (data.groupBy(cid.alias("__c__"))
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
            data.unpersist()
        model = KMeansModel()
        model.set_(featuresCol=fcol, predictionCol=self.get_("predictionCol"),
                   distanceMeasure=measure)
        model.model_data = {"centroids": centers.tolist()}
        return model

    def _init_centers(self, data: DataFrame, k: int) -> np.ndarray:
        if self.get_("initMode") == "first_distinct":
            # deterministic: k lexicographically-smallest distinct vectors
            rows = (data.select("__f__").distinct()
                    .orderBy(F.col("__f__")).limit(k).collect())
        else:
            seed = self.get_("seed")
            n = data.count()
            frac = min(1.0, (10.0 * k) / max(n, 1))
            sampled = data.sample(False, frac, seed=seed if seed is not None else 0)
            rows = sampled.distinct().limit(k).collect()
            if len(rows) < k:
                rows = data.distinct().limit(k).collect()
        if len(rows) < k:
            raise ValueError(f"KMeans: fewer than k={k} distinct points")
        return np.array([list(r["__f__"]) for r in rows], dtype=float)


def _wide_partials(data: DataFrame, centers: np.ndarray, measure: str):
    """One Lloyd round for wide vectors: per-partition numpy assignment +
    partial sums (KMeans.java:219-315's CentroidsUpdateAccumulator shape);
    only num_partitions × k × (dim+2) numbers cross the wire."""
    import pandas as pd
    from ..common.distance import distance_np
    k, dim = centers.shape
    schema = "c int, n double, " + ", ".join(f"s{i} double" for i in range(dim))
    bc = data.sparkSession.sparkContext.broadcast((centers, measure))

    def partials(it):
        C, meas = bc.value
        S = np.zeros((len(C), C.shape[1]))
        N = np.zeros(len(C))
        for pdf in it:
            if not len(pdf):
                continue
            x = np.stack(pdf["__f__"].to_numpy())
            cid = distance_np(x, C, meas).argmin(axis=1)
            for j in np.unique(cid):
                S[j] += x[cid == j].sum(axis=0)
            N += np.bincount(cid, minlength=len(C))
        out = {"c": np.arange(len(C)), "n": N}
        for i in range(C.shape[1]):
            out[f"s{i}"] = S[:, i]
        yield pd.DataFrame(out)

    pdf = data.mapInPandas(partials, schema).toPandas()
    bc.unpersist()
    sums = np.zeros_like(centers)
    counts = np.zeros(k)
    for j in range(k):
        rows = pdf[pdf["c"] == j]
        counts[j] = rows["n"].sum()
        sums[j] = rows[[f"s{i}" for i in range(dim)]].to_numpy().sum(axis=0)
    return sums, counts


class KMeansModel(Model, HasFeaturesCol, HasPredictionCol, HasDistanceMeasure):
    def _transform(self, df: DataFrame) -> DataFrame:
        centers = np.array(self.model_data["centroids"])
        if centers.size > 512:
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
                                 assign(F.col(self.get_("featuresCol"))))
        cid = closest_centroid_expr(F.col(self.get_("featuresCol")), centers,
                                    self.get_("distanceMeasure"))
        return df.withColumn(self.get_("predictionCol"), cid)

    def transform_local(self, pdf):
        centers = np.array(self.model_data["centroids"])
        x = np.stack(pdf[self.get_("featuresCol")].to_numpy())
        d = distance_np(x, centers, self.get_("distanceMeasure"))
        out = pdf.copy()
        out[self.get_("predictionCol")] = d.argmin(axis=1).astype("int32")
        return out
