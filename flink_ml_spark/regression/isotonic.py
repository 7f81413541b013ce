"""Isotonic regression — monotone calibration of a 1-D score.

The natural companion of CalibrationEvaluator: where the evaluator
measures miscalibration, isotonic regression FIXES it (Zadrozny &
Elkan 2002; Spark MLlib ships ``ml.regression.IsotonicRegression``, the
reference engine has no counterpart).  Typical use here: calibrate a
quality-classifier score into a real probability before a corpus gate
threshold.

Spark-first split of the classic algorithm:

- **fit** aggregates to the sufficient statistic in ONE pass —
  ``groupBy(score) → (Σwy, Σw)`` — whose size is the number of DISTINCT
  scores, not rows.  Pool-adjacent-violators then runs driver-side over
  that (bounded, see ``maxDistinct``) sorted statistic: PAVA is
  inherently sequential, but it only ever needs the per-score sums, so
  the driver sees |distinct| rows regardless of corpus size (the MLlib
  design).  Scores beyond ``maxDistinct`` should be quantized first
  (e.g. ``F.round(score, 4)`` — calibration at 4 decimals is far below
  label noise).
- **predict** is linear interpolation over the fitted (boundary, value)
  arrays — a vectorized ``np.interp`` Arrow UDF, zero shuffle; inputs
  outside the fitted range clamp to the end values (MLlib semantics).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F

from ..api import Estimator, Model
from ..param import (HasLabelCol, HasWeightCol, IntParam, ParamValidators,
                     StringParam)


def _pava(y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Weighted pool-adjacent-violators over values sorted by x.
    Returns the isotonic (non-decreasing) fit, one value per input."""
    n = len(y)
    # pool stack: (sum_w, sum_wy, span_len)
    sw = np.empty(n)
    swy = np.empty(n)
    ln = np.empty(n, dtype=np.int64)
    top = -1
    for i in range(n):
        top += 1
        sw[top], swy[top], ln[top] = w[i], w[i] * y[i], 1
        while top > 0 and swy[top - 1] * sw[top] > swy[top] * sw[top - 1]:
            # previous pool mean > current pool mean → merge (cross-
            # multiplied to avoid division; weights are positive)
            sw[top - 1] += sw[top]
            swy[top - 1] += swy[top]
            ln[top - 1] += ln[top]
            top -= 1
    out = np.empty(n)
    pos = 0
    for t in range(top + 1):
        out[pos:pos + ln[t]] = swy[t] / sw[t]
        pos += ln[t]
    return out


class IsotonicRegression(Estimator, HasLabelCol, HasWeightCol):
    featureCol = StringParam("featureCol",
                             "1-D score column to calibrate on.", "feature")
    maxDistinct = IntParam(
        "maxDistinct", "Safety cap on distinct feature values reaching "
        "the driver (quantize the score first if above).", 100_000,
        ParamValidators.gt(0))

    def fit(self, *inputs: DataFrame) -> "IsotonicRegressionModel":
        (df,) = inputs
        x = F.col(self.get_("featureCol")).cast("double")
        y = F.col(self.get_("labelCol")).cast("double")
        wc = self.get_("weightCol")
        w = F.col(wc).cast("double") if wc else F.lit(1.0)
        # rows with a null score or label carry no calibration signal and
        # would poison the driver arrays (object dtype / null sums)
        agg = (df.filter(x.isNotNull() & y.isNotNull())
               .select(x.alias("x"), (w * y).alias("wy"), w.alias("w"))
               .groupBy("x").agg(F.sum("wy").alias("swy"),
                                 F.sum("w").alias("sw")))
        cap = self.get_("maxDistinct")
        rows = agg.sort("x").limit(cap + 1).collect()
        if len(rows) > cap:
            raise ValueError(
                f"isotonic fit saw > maxDistinct={cap} distinct scores; "
                "quantize the feature (e.g. F.round(score, 4)) first")
        xs = np.array([r["x"] for r in rows])
        ys = np.array([r["swy"] / r["sw"] for r in rows])
        ws = np.array([r["sw"] for r in rows])
        fitted = _pava(ys, ws) if len(rows) else np.empty(0)
        model = IsotonicRegressionModel()
        model.set_(featureCol=self.get_("featureCol"))
        model.model_data = {"boundaries": xs.tolist(),
                            "values": fitted.tolist()}
        return model


class IsotonicRegressionModel(Model):
    featureCol = StringParam("featureCol",
                             "1-D score column to calibrate on.", "feature")
    predictionCol = StringParam("predictionCol",
                                "Calibrated output column.", "prediction")

    def _interp(self, v: np.ndarray) -> np.ndarray:
        bx = np.asarray(self.model_data["boundaries"], dtype=float)
        by = np.asarray(self.model_data["values"], dtype=float)
        if len(bx) == 0:
            return np.full(len(v), np.nan)
        return np.interp(v, bx, by)  # clamps outside the range

    def _transform(self, df: DataFrame) -> DataFrame:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf
        interp = self._interp

        def pred(s):
            return pd.Series(interp(s.to_numpy(dtype=float)))

        pred.__annotations__ = {"s": pd.Series, "return": pd.Series}
        pred = pandas_udf(pred, "double")
        return df.withColumn(
            self.get_("predictionCol"),
            pred(F.col(self.get_("featureCol")).cast("double")))

    def transform_local(self, pdf):
        out = pdf.copy()
        out[self.get_("predictionCol")] = self._interp(
            pdf[self.get_("featureCol")].to_numpy(dtype=float))
        return out
