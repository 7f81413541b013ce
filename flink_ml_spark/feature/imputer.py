"""Imputer / ImputerModel — fill missing values with mean/median/most_frequent.

Reference: feature/imputer/Imputer.java:55 — null and NaN (and an optional
``missingValue``) count as missing; median via Greenwald-Khanna
(Imputer.java:183-240) → Spark's mergeable percentile_approx; most_frequent
ties broken by smallest value (reference convention).

Fit = single multi-column aggregation (mean) or per-column sketch/count;
transform = coalesce/when expressions, fully JVM-side.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..api import Estimator, Model
from ..param import (FloatParam, HasInputCols, HasOutputCols, HasRelativeError,
                     ParamValidators, StringParam)

STRATEGIES = ["mean", "median", "most_frequent"]


class Imputer(Estimator, HasInputCols, HasOutputCols, HasRelativeError):
    strategy = StringParam("strategy", "Imputation strategy.", "mean",
                           ParamValidators.in_array(STRATEGIES))
    missingValue = FloatParam("missingValue", "Placeholder for missing values.",
                              float("nan"))

    def _is_missing(self, c: str):
        col = F.col(c).cast("double")
        miss = col.isNull() | F.isnan(col)
        mv = self.get_("missingValue")
        if mv is not None and not math.isnan(mv):
            miss = miss | (col == F.lit(mv))
        return miss

    def fit(self, *inputs: DataFrame) -> "ImputerModel":
        (df,) = inputs
        in_cols = self.get_("inputCols")
        strategy = self.get_("strategy")
        clean = df.select(*[
            F.when(~self._is_missing(c), F.col(c).cast("double")).alias(c)
            for c in in_cols])
        if strategy == "mean":
            row = clean.agg(*[F.avg(c).alias(c) for c in in_cols]).collect()[0]
            surrogates = [float(row[c]) for c in in_cols]
        elif strategy == "median":
            rel = self.get_("relativeError")
            if rel == 0:  # exact interpolating percentile (oracle-matched)
                row = clean.agg(*[F.percentile(c, F.lit(0.5)).alias(c)
                                  for c in in_cols]).collect()[0]
            else:
                acc = max(1, int(1.0 / rel))
                row = clean.agg(*[
                    F.percentile_approx(c, F.lit(0.5), F.lit(acc)).alias(c)
                    for c in in_cols]).collect()[0]
            surrogates = [float(row[c]) for c in in_cols]
        else:  # most_frequent: per-col value counts; ties → smallest value
            surrogates = []
            for c in in_cols:
                r = (clean.select(c).filter(F.col(c).isNotNull())
                     .groupBy(c).count()
                     .orderBy(F.desc("count"), F.asc(c)).limit(1).collect())
                surrogates.append(float(r[0][c]))
        model = ImputerModel()
        model.set_(inputCols=in_cols, outputCols=self.get_("outputCols"))
        model.set(ImputerModel.missingValue, self.get_("missingValue"))
        model.model_data = {"surrogates": surrogates}
        return model


class ImputerModel(Model, HasInputCols, HasOutputCols):
    missingValue = FloatParam("missingValue", "Placeholder for missing values.",
                              float("nan"))

    def _transform(self, df: DataFrame) -> DataFrame:
        mv = self.get_("missingValue")
        for c, oc, s in zip(self.get_("inputCols"), self.get_("outputCols"),
                            self.model_data["surrogates"]):
            col = F.col(c).cast("double")
            miss = col.isNull() | F.isnan(col)
            if mv is not None and not math.isnan(mv):
                miss = miss | (col == F.lit(mv))
            df = df.withColumn(oc, F.when(miss, F.lit(s)).otherwise(col))
        return df

    def transform_local(self, pdf):
        out = pdf.copy()
        for c, oc, s in zip(self.get_("inputCols"), self.get_("outputCols"),
                            self.model_data["surrogates"]):
            vals = out[c].astype(float)
            out[oc] = vals.fillna(s)
        return out
