"""Binarizer — threshold numeric or vector columns to 0/1.

Reference: feature/binarizer/Binarizer.java:55 (multi-column, per-column
thresholds; numeric → 0/1 double, vector → element-wise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType

from ..api import Transformer
from ..param import FloatArrayParam, HasInputCols, HasOutputCols


class Binarizer(Transformer, HasInputCols, HasOutputCols):
    thresholds = FloatArrayParam("thresholds", "Per-column binarization thresholds.", None)

    def _transform(self, df: DataFrame) -> DataFrame:
        in_cols = self.get_("inputCols")
        out_cols = self.get_("outputCols")
        thresholds = self.get_("thresholds")
        schema = {f.name: f.dataType for f in df.schema.fields}
        def _binarize(t):
            # plain closure: F.transform passes the index to 2-arg lambdas,
            # so the threshold must NOT be a default argument
            return lambda x: F.when(x > F.lit(t), 1.0).otherwise(0.0)

        for ic, oc, t in zip(in_cols, out_cols, thresholds):
            if isinstance(schema[ic], ArrayType):
                expr = F.transform(F.col(ic), _binarize(t))
            else:
                expr = (F.when(F.col(ic) > F.lit(t), 1.0).otherwise(0.0))
            df = df.withColumn(oc, expr)
        return df

    def transform_local(self, pdf):
        import numpy as np

        def _bin(x, t):
            a = np.asarray(x, dtype=float)
            # Spark orders NaN above every value, so NaN > t holds
            return np.where(np.isnan(a) | (a > t), 1.0, 0.0)

        out = pdf.copy()
        for ic, oc, t in zip(self.get_("inputCols"), self.get_("outputCols"),
                             self.get_("thresholds")):
            col = pdf[ic]
            if len(col) and hasattr(col.iloc[0], "__len__"):
                out[oc] = [list(_bin(x, t)) for x in col]
            else:
                out[oc] = _bin(col.to_numpy(), t)
        return out
