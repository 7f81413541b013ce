"""Winsorizer — clip numeric columns to fitted quantile bounds.

The outlier treatment that PRESERVES rows (unlike filtering) and bounds
leverage (unlike StandardScaler): values below the fitted ``lower``
quantile move up to it, values above ``upper`` move down (Winsorized
statistics; Tukey's robust-estimation lineage).  Complements the scaler
family: RobustScaler rescales by median/IQR, the Winsorizer caps the
tails themselves — heavy-tailed corpus statistics (doc lengths, token
counts, prices) usually want both.

Scale: fit is ONE aggregation per input — the mergeable
``approx_percentile`` sketch by default (the 100 TB path);
``exactQuantiles=True`` uses exact ``percentile`` (buffers the column —
the small-data / oracle-parity path, PERCENTILE_CONT interpolation).
The model is 2 doubles per column; transform is a zero-shuffle
``least/greatest`` projection and serves locally via
``transform_local``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..api import Estimator, Model
from ..param import (BoolParam, FloatParam, HasInputCols, HasOutputCols,
                     ParamValidators)


class Winsorizer(Estimator, HasInputCols, HasOutputCols):
    lower = FloatParam("lower", "Lower clip quantile.", 0.01,
                       ParamValidators.in_range(0, 1))
    upper = FloatParam("upper", "Upper clip quantile.", 0.99,
                       ParamValidators.in_range(0, 1))
    exactQuantiles = BoolParam(
        "exactQuantiles", "Exact percentile bounds (buffers each column) "
        "instead of the mergeable approx_percentile sketch.", False)

    def fit(self, *inputs: DataFrame) -> "WinsorizerModel":
        (df,) = inputs
        lo, hi = self.get_("lower"), self.get_("upper")
        if lo >= hi:
            raise ValueError(f"Winsorizer: lower={lo} must be < upper={hi}")
        cols = self.get_("inputCols")
        fn = "percentile" if self.get_("exactQuantiles") \
            else "approx_percentile"
        aggs = []
        for c in cols:
            aggs.append(F.expr(f"{fn}({c}, {lo})").alias(f"{c}__lo"))
            aggs.append(F.expr(f"{fn}({c}, {hi})").alias(f"{c}__hi"))
        row = df.agg(*aggs).first()
        bounds = {c: (float(row[f"{c}__lo"]), float(row[f"{c}__hi"]))
                  for c in cols if row[f"{c}__lo"] is not None}
        if len(bounds) != len(cols):
            missing = [c for c in cols if c not in bounds]
            raise ValueError(f"Winsorizer: no non-null values to fit "
                             f"bounds for {missing}")
        model = WinsorizerModel()
        model.set_(inputCols=cols, outputCols=self.get_("outputCols"))
        model.model_data = {"bounds": bounds}
        return model


class WinsorizerModel(Model, HasInputCols, HasOutputCols):
    def _transform(self, df: DataFrame) -> DataFrame:
        bounds = self.model_data["bounds"]
        outs = self.get_("outputCols") or self.get_("inputCols")
        for c, o in zip(self.get_("inputCols"), outs):
            lo, hi = bounds[c]
            df = df.withColumn(
                o, F.least(F.greatest(F.col(c).cast("double"),
                                      F.lit(lo)), F.lit(hi)))
        return df

    def transform_local(self, pdf):
        bounds = self.model_data["bounds"]
        outs = self.get_("outputCols") or self.get_("inputCols")
        out = pdf.copy()
        for c, o in zip(self.get_("inputCols"), outs):
            lo, hi = bounds[c]
            out[o] = out[c].astype(float).clip(lo, hi)
        return out
