"""PlattCalibrator — parametric (sigmoid) probability calibration.

The calibration family's parametric leg: IsotonicRegression
(isotonic.py) fits a free-form monotone map and needs plenty of
calibration data; Platt scaling (Platt 1999, "Probabilistic Outputs for
Support Vector Machines") fits just TWO parameters — p = σ(A·s + B) —
so it calibrates small validation splits without overfitting and stays
monotone by construction.  The standard pairing in large pipelines:
Platt for small calibration sets / smooth scores, isotonic when data is
plentiful and the distortion is non-sigmoid.

Fit is the repo's shared SGD driver loop (common/optimizer.py — one
codegen'd aggregate per round, nothing corpus-sized collected) over the
2-feature design [s, 1] with logistic loss; Platt's target smoothing
(t+ = (N+ + 1)/(N+ + 2), t− = 1/(N− + 2), the MAP correction from the
paper §2.2) is the default.  With ``weightRounding`` set, the (A, B)
trajectory snaps to a fixed decimal grid every round — the same
cross-engine replay discipline as the linear learners, so a SQL oracle
can replay the whole fit.

Scale: fit cost is maxIter scans with a 2-double reduction each;
transform is one codegen expression.  The model carries two floats.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..api import Estimator, Model
from ..common.optimizer import BinaryLogisticLoss, sgd
from ..param import (BoolParam, HasGlobalBatchSize, HasLabelCol,
                     HasLearningRate, HasMaxIter, HasTol, IntParam,
                     ParamValidators, StringParam)


class PlattCalibrator(Estimator, HasLabelCol, HasMaxIter, HasLearningRate,
                      HasTol, HasGlobalBatchSize):
    """``fit(df)`` with binary labels and a raw score column →
    :class:`PlattCalibratorModel` mapping scores to calibrated
    probabilities σ(A·s + B)."""

    scoreCol = StringParam("scoreCol", "Raw classifier score column.",
                           "score")
    outputCol = StringParam("outputCol", "Calibrated probability column.",
                            "calibrated")
    targetSmoothing = BoolParam(
        "targetSmoothing", "Platt's MAP target correction: positives "
        "train toward (N+ + 1)/(N+ + 2), negatives toward 1/(N− + 2) — "
        "prevents the sigmoid from saturating to 0/1 on separable "
        "scores.", True)
    weightRounding = IntParam(
        "weightRounding", "Round (A, B) to this many decimals after "
        "each SGD round (0 = off) — cross-engine reproducibility aid.",
        0, ParamValidators.gt_eq(0))

    def fit(self, *inputs: DataFrame) -> "PlattCalibratorModel":
        (df,) = inputs
        y = F.col(self.get_("labelCol")).cast("double")
        s = F.col(self.get_("scoreCol")).cast("double")
        base = df.filter(y.isNotNull() & s.isNotNull())
        if base.filter(~y.isin(0.0, 1.0)).limit(1).count():
            raise ValueError("PlattCalibrator: labels must be 0/1")
        if self.get_("targetSmoothing"):
            row = base.agg(F.sum(y).alias("np"),
                           F.count(F.lit(1)).alias("n")).first()
            n_pos = float(row["np"] or 0.0)
            n_neg = float(row["n"]) - n_pos
            t_pos = (n_pos + 1.0) / (n_pos + 2.0)
            t_neg = 1.0 / (n_neg + 2.0)
            target = F.when(y == 1.0, t_pos).otherwise(t_neg)
        else:
            target = y
        train = base.select(F.array(s, F.lit(1.0)).alias("__pf__"),
                            target.alias("__pt__"))
        w, losses = sgd(
            train, "__pf__", "__pt__", None, BinaryLogisticLoss, 2,
            max_iter=self.get_("maxIter"),
            learning_rate=self.get_("learningRate"),
            global_batch_size=self.get_("globalBatchSize"),
            tol=self.get_("tol"),
            weight_decimals=self.get_("weightRounding"))
        model = PlattCalibratorModel()
        model.set_(scoreCol=self.get_("scoreCol"),
                   outputCol=self.get_("outputCol"))
        model.model_data = {"a": float(w[0]), "b": float(w[1]),
                            "losses": losses}
        return model


class PlattCalibratorModel(Model):
    scoreCol = StringParam("scoreCol", "Raw classifier score column.",
                           "score")
    outputCol = StringParam("outputCol", "Calibrated probability column.",
                            "calibrated")

    def _transform(self, df: DataFrame) -> DataFrame:
        a = float(self.model_data["a"])
        b = float(self.model_data["b"])
        m = F.col(self.get_("scoreCol")).cast("double") * a + b
        return df.withColumn(self.get_("outputCol"),
                             F.lit(1.0) / (F.lit(1.0) + F.exp(-m)))

    def transform_local(self, pdf):
        a = float(self.model_data["a"])
        b = float(self.model_data["b"])
        out = pdf.copy()
        m = pdf[self.get_("scoreCol")].astype(float).to_numpy() * a + b
        out[self.get_("outputCol")] = 1.0 / (1.0 + np.exp(-m))
        return out
