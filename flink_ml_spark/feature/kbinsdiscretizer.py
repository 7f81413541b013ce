"""KBinsDiscretizer / Model — per-dimension binning of a vector column.

Reference: feature/kbinsdiscretizer/KBinsDiscretizer.java:76.  Strategies:
uniform (min/max agg), quantile (percentile_approx per dim), kmeans (1-D
Lloyd on a driver-side sample of ``subSamples`` rows — the reference also
samples, KBinsDiscretizer.java:76).  Transform reuses the Bucketizer
CASE-chain per dimension; out-of-range values clamp to first/last bucket
(reference convention).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..api import Estimator, Model
from ..common.aggregates import quantiles_vector_col, summarize_vector_col
from ..param import (FloatParam, HasInputCol, HasOutputCol, IntParam,
                     ParamValidators, StringParam)


def _kmeans_1d(values: np.ndarray, k: int, max_iter: int = 300) -> np.ndarray:
    """1-D Lloyd's on sorted data; returns bin edges (midpoints of centroids)."""
    uniq = np.unique(values)
    if len(uniq) <= k:
        centers = uniq.astype(float)
    else:
        # init: uniform quantile positions (deterministic)
        qs = np.linspace(0, 1, k)
        centers = np.quantile(values, qs)
        for _ in range(max_iter):
            edges = (centers[:-1] + centers[1:]) / 2
            idx = np.searchsorted(edges, values)
            new = np.array([values[idx == j].mean() if np.any(idx == j) else centers[j]
                            for j in range(k)])
            if np.allclose(new, centers):
                break
            centers = new
    edges = (centers[:-1] + centers[1:]) / 2
    return edges


class KBinsDiscretizer(Estimator, HasInputCol, HasOutputCol):
    numBins = IntParam("numBins", "Number of bins.", 5, ParamValidators.gt(1))
    strategy = StringParam("strategy", "uniform | quantile | kmeans.", "quantile",
                           ParamValidators.in_array(["uniform", "quantile", "kmeans"]))
    subSamples = IntParam("subSamples", "Sample size for the kmeans strategy.", 200000,
                          ParamValidators.gt(0))
    relativeError = FloatParam("relativeError", "Quantile sketch relative error "
                               "(0 = exact interpolating percentile).", 0.001,
                               ParamValidators.gt_eq(0))

    def fit(self, *inputs: DataFrame) -> "KBinsDiscretizerModel":
        (df,) = inputs
        col = self.get_("inputCol")
        k = self.get_("numBins")
        strategy = self.get_("strategy")
        if strategy == "uniform":
            stats = summarize_vector_col(df, col, ("min", "max"))
            edges = [np.linspace(lo, hi, k + 1).tolist()
                     for lo, hi in zip(stats["min"], stats["max"])]
        elif strategy == "quantile":
            probs = np.linspace(0, 1, k + 1).tolist()
            q = quantiles_vector_col(df, col, probs,
                                     relative_error=self.get_("relativeError"))
            edges = [row.tolist() for row in q]
        else:  # kmeans on a bounded sample (reference samples subSamples rows)
            n = df.count()
            frac = min(1.0, self.get_("subSamples") / max(n, 1))
            sample = np.stack([r[0] for r in
                               df.select(col).sample(False, frac, seed=0).collect()])
            edges = []
            for d in range(sample.shape[1]):
                vals = sample[:, d]
                inner = _kmeans_1d(vals, k)
                edges.append([float(vals.min())] + inner.tolist() + [float(vals.max())])
        model = KBinsDiscretizerModel()
        model.set_(inputCol=col, outputCol=self.get_("outputCol"))
        model.model_data = {"binEdges": edges}
        return model


class KBinsDiscretizerModel(Model, HasInputCol, HasOutputCol):
    def _transform(self, df: DataFrame) -> DataFrame:
        from .bucketizer import bucketize_expr
        edges = self.model_data["binEdges"]
        col = F.col(self.get_("inputCol"))
        dims = []
        for d, e in enumerate(edges):
            x = F.element_at(col, d + 1)
            # dedupe equal edges (constant dims collapse to single bucket 0)
            e2 = sorted(set(e))
            if len(e2) < 2:
                dims.append(F.lit(0.0))
                continue
            raw = bucketize_expr(x, e2)
            clamped = (F.when(x < F.lit(e2[0]), 0.0)
                       .when(x > F.lit(e2[-1]), float(len(e2) - 2))
                       .otherwise(raw))
            dims.append(clamped)
        return df.withColumn(self.get_("outputCol"), F.array(*dims))

    def transform_local(self, pdf):
        import numpy as np
        edges = self.model_data["binEdges"]
        col = pdf[self.get_("inputCol")]
        x = (np.stack([np.asarray(v, dtype=float) for v in col])
             if len(col) else np.zeros((0, len(edges))))
        res = np.zeros_like(x)
        for d, e in enumerate(edges):
            e2 = sorted(set(e))
            if len(e2) < 2:
                res[:, d] = 0.0
                continue
            v = x[:, d]
            raw = np.searchsorted(e2, v, side="right") - 1.0
            raw = np.clip(raw, 0, len(e2) - 2)
            res[:, d] = raw
        out = pdf.copy()
        out[self.get_("outputCol")] = list(res)
        return out
