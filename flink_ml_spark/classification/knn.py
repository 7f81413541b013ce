"""Knn / KnnModel — brute-force k-nearest-neighbors classification.

Reference: classification/knn/Knn.java:52 — fit packs features into
per-partition matrices with precomputed squared norms (genModelData
:97-134); predict broadcasts the model and does gemv batch distances with a
per-row top-k priority queue (KnnModel.java PredictLabelFunction:129).

Spark-first: fit collects (features, label) into a driver numpy matrix
(model size = train-set; the reference equally materializes the whole train
set as model data), predict = Arrow-batched pandas UDF doing one GEMM per
batch against the broadcast matrix — numpy BLAS replaces the reference's
hand-rolled gemv + priority queue.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType

from ..api import Estimator, Model
from ..param import (HasFeaturesCol, HasLabelCol, HasPredictionCol, IntParam,
                     ParamValidators)


class Knn(Estimator, HasFeaturesCol, HasLabelCol, HasPredictionCol):
    k = IntParam("k", "Number of neighbors.", 5, ParamValidators.gt(0))

    def fit(self, *inputs: DataFrame) -> "KnnModel":
        (df,) = inputs
        rows = df.select(self.get_("featuresCol"), self.get_("labelCol")).collect()
        x = np.array([list(r[0]) for r in rows], dtype=float)
        y = np.array([float(r[1]) for r in rows])
        model = KnnModel()
        model.set_(featuresCol=self.get_("featuresCol"),
                   predictionCol=self.get_("predictionCol"))
        model.set(KnnModel.k, self.get_("k"))
        model.model_data = {"packedFeatures": x.tolist(), "labels": y.tolist()}
        return model


class KnnModel(Model, HasFeaturesCol, HasPredictionCol):
    k = IntParam("k", "Number of neighbors.", 5, ParamValidators.gt(0))

    def _transform(self, df: DataFrame) -> DataFrame:
        train_x = np.array(self.model_data["packedFeatures"])
        train_y = np.array(self.model_data["labels"])
        train_norm2 = (train_x ** 2).sum(axis=1)  # VectorWithNorm precompute
        k = self.get_("k")
        spark = df.sparkSession
        bc = spark.sparkContext.broadcast((train_x, train_y, train_norm2))

        @F.pandas_udf(DoubleType())
        def predict(s: pd.Series) -> pd.Series:
            tx, ty, tn2 = bc.value
            if len(s) == 0:
                return pd.Series([], dtype=float)
            q = np.stack(s.to_numpy())
            # ||q - t||² = ||q||² - 2 q·t + ||t||²  (one GEMM per batch)
            d2 = (q ** 2).sum(axis=1)[:, None] - 2.0 * (q @ tx.T) + tn2[None, :]
            kk = min(k, len(ty))
            # stable argsort → ties break by train index (deterministic,
            # matches the SQL oracle's ORDER BY (dist, id))
            idx = np.argsort(d2, axis=1, kind="stable")[:, :kk]
            preds = []
            for i in range(len(q)):
                # majority vote; ties → smallest label (deterministic)
                nb = ty[idx[i]]
                vals, cnt = np.unique(nb, return_counts=True)
                preds.append(float(vals[cnt.argmax()]))
            return pd.Series(preds)

        return df.withColumn(self.get_("predictionCol"),
                             predict(F.col(self.get_("featuresCol"))))

    def transform_local(self, pdf):
        tx = np.array(self.model_data["packedFeatures"])
        ty = np.array(self.model_data["labels"])
        q = np.stack(pdf[self.get_("featuresCol")].to_numpy())
        d2 = (q ** 2).sum(axis=1)[:, None] - 2.0 * (q @ tx.T) + (tx ** 2).sum(axis=1)[None, :]
        kk = min(self.get_("k"), len(ty))
        idx = np.argsort(d2, axis=1, kind="stable")[:, :kk]
        preds = []
        for i in range(len(q)):
            vals, cnt = np.unique(ty[idx[i]], return_counts=True)
            preds.append(float(vals[cnt.argmax()]))
        out = pdf.copy()
        out[self.get_("predictionCol")] = preds
        return out
