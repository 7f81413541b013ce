"""OneHotEncoder / OneHotEncoderModel.

Reference: feature/onehotencoder/OneHotEncoder.java:64 — fit computes each
column's arity (max index + 1); transform emits a sparse one-hot vector;
``dropLast`` drops the last category (all-zeros vector encodes it).
handleInvalid keep → extra category index == arity.

Fit = one max() aggregation per column (map-side combine).  Transform is a
pure expression producing the sparse struct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..api import Estimator, Model
from ..param import BoolParam, HasHandleInvalid, HasInputCols, HasOutputCols


class OneHotEncoder(Estimator, HasInputCols, HasOutputCols, HasHandleInvalid):
    dropLast = BoolParam("dropLast", "Whether to drop the last category.", True)

    def fit(self, *inputs: DataFrame) -> "OneHotEncoderModel":
        (df,) = inputs
        aggs = [F.max(F.col(c).cast("double")).alias(c) for c in self.get_("inputCols")]
        row = df.agg(*aggs).collect()[0]
        arities = [int(row[c]) + 1 for c in self.get_("inputCols")]
        model = OneHotEncoderModel()
        model.set_(inputCols=self.get_("inputCols"), outputCols=self.get_("outputCols"),
                   handleInvalid=self.get_("handleInvalid"))
        model.set(OneHotEncoderModel.dropLast, self.get_("dropLast"))
        model.model_data = {"arities": arities}
        return model


class OneHotEncoderModel(Model, HasInputCols, HasOutputCols, HasHandleInvalid):
    dropLast = BoolParam("dropLast", "Whether to drop the last category.", True)

    def _transform(self, df: DataFrame) -> DataFrame:
        drop_last = self.get_("dropLast")
        mode = self.get_("handleInvalid")
        for c, oc, arity in zip(self.get_("inputCols"), self.get_("outputCols"),
                                self.model_data["arities"]):
            idx = F.col(c).cast("int")
            n_cats = arity + (1 if mode == "keep" else 0)
            size = n_cats - 1 if drop_last else n_cats
            valid = idx.isNotNull() & (idx >= 0) & (idx < arity)
            eff = idx if mode != "keep" else F.when(valid, idx).otherwise(F.lit(arity))
            if mode == "skip":
                df = df.filter(valid)
            elif mode == "error":
                eff = F.when(valid, idx).otherwise(
                    F.raise_error(F.lit(f"OneHotEncoder: invalid index in {c}")).cast("int"))
            active = eff < F.lit(size)  # dropped last category → empty vector
            out = F.struct(
                F.lit(size).alias("size"),
                F.when(active, F.array(eff)).otherwise(F.array().cast("array<int>")).alias("indices"),
                F.when(active, F.array(F.lit(1.0))).otherwise(F.array().cast("array<double>")).alias("values"))
            df = df.withColumn(oc, out)
        return df

    def transform_local(self, pdf):
        drop_last = self.get_("dropLast")
        mode = self.get_("handleInvalid")
        out = pdf.copy()
        keep = [True] * len(pdf)
        for c, oc, arity in zip(self.get_("inputCols"), self.get_("outputCols"),
                                self.model_data["arities"]):
            n_cats = arity + (1 if mode == "keep" else 0)
            size = n_cats - 1 if drop_last else n_cats
            rows = []
            for j, v in enumerate(pdf[c]):
                idx = int(v) if v is not None else None
                valid = idx is not None and 0 <= idx < arity
                if not valid:
                    if mode == "keep":
                        idx = arity
                    elif mode == "skip":
                        keep[j] = False
                        rows.append(None)
                        continue
                    else:
                        raise ValueError(f"OneHotEncoder: invalid index in {c}")
                if idx < size:
                    rows.append({"size": size, "indices": [idx], "values": [1.0]})
                else:
                    rows.append({"size": size, "indices": [], "values": []})
            out[oc] = rows
        if mode == "skip":
            import numpy as np
            out = out[np.array(keep, dtype=bool)].reset_index(drop=True)
        return out
