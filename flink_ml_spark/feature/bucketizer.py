"""Bucketizer — map continuous columns to bucket indices by split points.

Reference: feature/bucketizer/Bucketizer.java:54.  Bucket i covers
[splits[i], splits[i+1]); the last bucket is closed on the right.
handleInvalid: error | skip (drop row) | keep (invalid → extra bucket
index == numBuckets — Flink's convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..api import Transformer
from ..param import (FloatArrayArrayParam, HasHandleInvalid, HasInputCols,
                     HasOutputCols)


def bucketize_expr(col: Column, splits: list[float]) -> Column:
    """CASE-WHEN chain: JVM-side, codegen-friendly; null for out-of-range."""
    n = len(splits) - 1
    expr = F.lit(None).cast("double")
    # build from last bucket backwards so earlier WHENs take precedence
    conds = []
    for i in range(n):
        lo, hi = splits[i], splits[i + 1]
        upper = (col <= F.lit(hi)) if i == n - 1 else (col < F.lit(hi))
        conds.append(((col >= F.lit(lo)) & upper, float(i)))
    out = F.lit(None).cast("double")
    for cond, idx in reversed(conds):
        out = F.when(cond, F.lit(idx)).otherwise(out)
    return out


class Bucketizer(Transformer, HasInputCols, HasOutputCols, HasHandleInvalid):
    splitsArray = FloatArrayArrayParam("splitsArray", "Split points per input column.", None)

    def _transform(self, df: DataFrame) -> DataFrame:
        in_cols = self.get_("inputCols")
        out_cols = self.get_("outputCols")
        splits_arr = self.get_("splitsArray")
        mode = self.get_("handleInvalid")
        for ic, oc, splits in zip(in_cols, out_cols, splits_arr):
            raw = bucketize_expr(F.col(ic).cast("double"), splits)
            invalid = F.col(ic).isNull() | F.isnan(F.col(ic).cast("double")) | raw.isNull()
            n_buckets = len(splits) - 1
            if mode == "keep":
                expr = F.when(invalid, float(n_buckets)).otherwise(raw)
            elif mode == "skip":
                df = df.filter(~invalid)
                expr = raw
            else:  # error
                expr = F.when(
                    invalid,
                    F.raise_error(F.lit(f"Bucketizer: invalid value in column {ic}")).cast("double")
                ).otherwise(raw)
            df = df.withColumn(oc, expr)
        return df

    def transform_local(self, pdf):
        import numpy as np
        mode = self.get_("handleInvalid")
        out = pdf.copy()
        keep_mask = np.ones(len(pdf), dtype=bool)
        for ic, oc, splits in zip(self.get_("inputCols"),
                                  self.get_("outputCols"),
                                  self.get_("splitsArray")):
            x = out[ic].to_numpy(dtype=float)
            n = len(splits) - 1
            raw = np.searchsorted(splits, x, side="right") - 1.0
            raw = np.where(x == splits[-1], n - 1.0, raw)  # last bucket closed
            invalid = np.isnan(x) | (raw < 0) | (raw >= n)
            if mode == "keep":
                res = np.where(invalid, float(n), raw)
            elif mode == "skip":
                keep_mask &= ~invalid
                res = raw
            else:
                if invalid.any():
                    raise ValueError(f"Bucketizer: invalid value in column {ic}")
                res = raw
            out[oc] = res
        return out[keep_mask].reset_index(drop=True) if mode == "skip" else out
