"""Knn / KnnModel — brute-force k-nearest-neighbors classification.

Reference: classification/knn/Knn.java:52 — fit packs features into
per-partition matrices with precomputed squared norms (genModelData
:97-134); predict broadcasts the model and does gemv batch distances with a
per-row top-k priority queue (KnnModel.java PredictLabelFunction:129).

Spark-first: fit packs each partition's (features, label) rows into
flattened matrix blocks DISTRIBUTEDLY (Arrow ``mapInPandas``, one compact
block row per Arrow batch) — the driver never holds raw training rows,
mirroring the reference's genModelData map.  The packed blocks live in a
model-data DataFrame; predict assembles them into one numpy matrix and
broadcasts it (the reference equally broadcasts the whole packed train set
at predict), then an Arrow-batched pandas UDF does one GEMM per batch —
numpy BLAS replaces the reference's hand-rolled gemv + priority queue.
Both designs cap KNN at broadcastable model size (reference parity).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import DoubleType

from ..api import Estimator, Model
from ..common import vector as V
from ..param import (HasFeaturesCol, HasLabelCol, HasPredictionCol, IntParam,
                     ParamValidators)

_BLOCK_SCHEMA = "x array<double>, y array<double>, n int, dim int"


def _pack_blocks(batches):
    """One compact block row per Arrow batch: flattened row-major features
    + labels (Knn.java genModelData's per-partition matrix pack)."""
    for pdf in batches:
        if not len(pdf):
            continue
        x = np.stack(pdf["f"].to_numpy())
        yield pd.DataFrame({
            "x": [x.ravel().tolist()],
            "y": [pdf["y"].to_numpy(dtype=float).tolist()],
            "n": [x.shape[0]], "dim": [x.shape[1]],
        })


class Knn(Estimator, HasFeaturesCol, HasLabelCol, HasPredictionCol):
    k = IntParam("k", "Number of neighbors.", 5, ParamValidators.gt(0))
    # the brute-force model broadcasts the WHOLE packed train set to every
    # task (reference parity: Knn.java does the same) — that is only sane
    # for index-sized train sets, so fail fast past a value budget instead
    # of silently OOM-ing executors (mirrors ALSModel.recommend_for_users'
    # 2M-item broadcast cap)
    maxModelValues = IntParam(
        "maxModelValues", "Fail-fast cap on rows × dim packed into the "
        "broadcast model (use an ANN index — e.g. IVFIndex — for larger "
        "train sets).", 4_000_000, ParamValidators.gt(0))

    def fit(self, *inputs: DataFrame) -> "KnnModel":
        (df,) = inputs
        src = df.select(
            V.dense_input(df, self.get_("featuresCol")).alias("f"),
            F.col(self.get_("labelCol")).cast("double").alias("y"))
        blocks = src.mapInPandas(_pack_blocks, _BLOCK_SCHEMA).persist()
        blocks.count()  # fit is an action: materialize the packed blocks
        n_values = blocks.agg(
            F.sum(F.col("n") * F.col("dim"))).first()[0] or 0
        cap = int(self.get_("maxModelValues"))
        if n_values > cap:
            blocks.unpersist()
            raise ValueError(
                f"Knn.fit: train set packs {n_values} values (rows x dim) "
                f"but the broadcast model cap is {cap} (maxModelValues); "
                f"brute-force kNN broadcasts the whole train set to every "
                f"task — use an ANN index (IVFIndex / HyperplaneLSH) for "
                f"train sets this large")
        model = KnnModel()
        model.set_(featuresCol=self.get_("featuresCol"),
                   predictionCol=self.get_("predictionCol"))
        model.set(KnnModel.k, self.get_("k"))
        model.model_df = blocks
        return model


class KnnModel(Model, HasFeaturesCol, HasPredictionCol):
    k = IntParam("k", "Number of neighbors.", 5, ParamValidators.gt(0))

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.model_df: DataFrame | None = None
        self._mat: tuple[np.ndarray, np.ndarray] | None = None

    def _matrices(self) -> tuple[np.ndarray, np.ndarray]:
        """Assemble the packed blocks into (train_x, train_y) once.  Block
        order follows the model-data partition order, so tie-breaking by
        train index is stable across fit/save/load."""
        if self._mat is None:
            pdf = (self.model_df if isinstance(self.model_df, pd.DataFrame)
                   else self.model_df.toPandas())
            if len(pdf):
                tx = np.concatenate([
                    np.asarray(x, dtype=float).reshape(int(n), int(d))
                    for x, n, d in zip(pdf["x"], pdf["n"], pdf["dim"])])
                ty = np.concatenate([np.asarray(y, dtype=float)
                                     for y in pdf["y"]])
            else:
                tx, ty = np.zeros((0, 0)), np.zeros(0)
            self._mat = (tx, ty)
        return self._mat

    # model data IS the packed-block table (Knn.java keeps the whole packed
    # train set as model data — parity)
    def get_model_data(self, spark: SparkSession) -> list[DataFrame]:
        return [self.model_df]

    def set_model_data(self, *tables: DataFrame) -> "KnnModel":
        (df,) = tables
        self.model_df = df
        self._mat = None
        return self

    def _save_model_data(self, path: str) -> None:
        if self.model_df is not None:
            self.model_df.write.mode("overwrite").parquet(
                os.path.join(path, "data"))

    def _load_model_data(self, spark: SparkSession, path: str) -> None:
        p = os.path.join(path, "data")
        if os.path.exists(p):
            self.model_df = spark.read.parquet(p)
            self._mat = None

    def _load_model_data_local(self, path: str) -> None:
        p = os.path.join(path, "data")
        if os.path.exists(p):
            import pyarrow.parquet as pq
            self.model_df = pq.read_table(p).to_pandas()
            self._mat = None

    def _transform(self, df: DataFrame) -> DataFrame:
        train_x, train_y = self._matrices()
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
                             predict(V.dense_input(df, self.get_("featuresCol"))))

    def transform_local(self, pdf):
        tx, ty = self._matrices()
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
