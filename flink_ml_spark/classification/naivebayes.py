"""NaiveBayes / NaiveBayesModel — multinomial NB over categorical features.

Reference: classification/naivebayes/NaiveBayes.java:59 — two-level keyed
aggregation: (label, featIdx, value) → summed weight, then per-label
arrays; smoothing adds ``smoothing`` to each (feature,value) count with the
number of distinct values per feature as the smoothing denominator factor.

Spark-first fit: ONE groupBy(label, featIdx, value).sum(weight) shuffle
(map-side combined), pivoted driver-side into nested dicts (model size =
Σ arity × labels — small).  Predict: Arrow-batched pandas UDF over the
driver-broadcast model (log-prob lookups vectorize poorly as SQL
expressions at high arity).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType

from ..api import Estimator, Model
from ..param import (FloatParam, HasFeaturesCol, HasLabelCol,
                     HasPredictionCol, HasWeightCol, ParamValidators)


class NaiveBayes(Estimator, HasFeaturesCol, HasLabelCol, HasWeightCol,
                 HasPredictionCol):
    smoothing = FloatParam("smoothing", "Additive smoothing.", 1.0,
                           ParamValidators.gt_eq(0))

    def fit(self, *inputs: DataFrame) -> "NaiveBayesModel":
        (df,) = inputs
        fcol, lcol = self.get_("featuresCol"), self.get_("labelCol")
        wcol = self.get_("weightCol")
        w = F.col(wcol).cast("double") if wcol else F.lit(1.0)
        ex = df.select(F.col(lcol).cast("double").alias("y"), w.alias("w"),
                       F.posexplode(F.col(fcol)).alias("fi", "v"))
        counts = (ex.groupBy("y", "fi", "v").agg(F.sum("w").alias("cnt"))
                  .collect())
        label_w = {r["y"]: 0.0 for r in counts}
        # label weights from feature 0 (each row contributes once per feature)
        for r in counts:
            if r["fi"] == 0:
                label_w[r["y"]] += r["cnt"]
        # distinct values per feature (across all labels)
        feat_values: dict[int, set] = {}
        for r in counts:
            feat_values.setdefault(r["fi"], set()).add(r["v"])
        theta: dict[str, dict[str, dict[str, float]]] = {}
        s = self.get_("smoothing")
        for r in counts:
            theta.setdefault(str(r["y"]), {}).setdefault(str(r["fi"]), {})[str(r["v"])] = r["cnt"]
        model = NaiveBayesModel()
        model.set_(featuresCol=fcol, predictionCol=self.get_("predictionCol"))
        model.set(NaiveBayesModel.smoothing, s)
        model.model_data = {
            "theta": theta,
            "labelWeights": {str(k): v for k, v in label_w.items()},
            "featureArities": {str(k): len(v) for k, v in feat_values.items()},
        }
        return model


class NaiveBayesModel(Model, HasFeaturesCol, HasPredictionCol):
    smoothing = FloatParam("smoothing", "Additive smoothing.", 1.0)

    def _log_probs(self):
        theta = self.model_data["theta"]
        label_w = self.model_data["labelWeights"]
        arities = {int(k): v for k, v in self.model_data["featureArities"].items()}
        s = self.get_("smoothing")
        total = sum(label_w.values())
        labels = sorted(label_w, key=float)
        log_prior = {y: math.log(label_w[y] / total) for y in labels}
        # log P(x_f = v | y) with additive smoothing over the feature's arity
        log_cond: dict[str, dict[int, dict[float, float]]] = {}
        log_default: dict[str, dict[int, float]] = {}
        for y in labels:
            log_cond[y] = {}
            log_default[y] = {}
            for fi, arity in arities.items():
                vals = theta.get(y, {}).get(str(fi), {})
                denom = label_w[y] + s * arity
                log_cond[y][fi] = {float(v): math.log((c + s) / denom)
                                   for v, c in vals.items()}
                log_default[y][fi] = math.log(s / denom) if s > 0 else -1e300
        return labels, log_prior, log_cond, log_default

    def _transform(self, df: DataFrame) -> DataFrame:
        labels, log_prior, log_cond, log_default = self._log_probs()

        @F.pandas_udf(DoubleType())
        def predict(s: pd.Series) -> pd.Series:
            if len(s) == 0:
                return pd.Series([], dtype=float)
            x = np.stack(s.to_numpy())
            n, d = x.shape
            scores = np.empty((n, len(labels)))
            for j, y in enumerate(labels):
                sc = np.full(n, log_prior[y])
                for fi in range(d):
                    lut = log_cond[y].get(fi, {})
                    dflt = log_default[y].get(fi, -1e300)
                    sc += np.array([lut.get(v, dflt) for v in x[:, fi]])
                scores[:, j] = sc
            best = scores.argmax(axis=1)
            return pd.Series([float(labels[b]) for b in best])

        return df.withColumn(self.get_("predictionCol"),
                             predict(F.col(self.get_("featuresCol"))))

    def transform_local(self, pdf):
        labels, log_prior, log_cond, log_default = self._log_probs()
        preds = []
        for x in pdf[self.get_("featuresCol")]:
            best, best_s = None, None
            for y in labels:
                sc = log_prior[y]
                for fi, v in enumerate(x):
                    sc += log_cond[y].get(fi, {}).get(
                        float(v), log_default[y].get(fi, -1e300))
                if best_s is None or sc > best_s:
                    best, best_s = y, sc
            preds.append(float(best))
        out = pdf.copy()
        out[self.get_("predictionCol")] = preds
        return out
