"""DCT — orthonormal DCT-II (optionally inverse / DCT-III) of a vector.

Reference: feature/dct/DCT.java:56 (scaled DCT-II).  No scipy in the
image, so the transform is a cosine-matrix matmul inside an Arrow-batched
pandas UDF (vectorized numpy: one (d,d) @ (d,batch) GEMM per batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType

from ..api import Transformer
from ..param import BoolParam, HasInputCol, HasOutputCol


def dct2_matrix(d: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (scipy.fft.dct(norm='ortho') equivalent)."""
    k = np.arange(d)[:, None]
    n = np.arange(d)[None, :]
    m = np.cos(np.pi * k * (2 * n + 1) / (2 * d)) * np.sqrt(2.0 / d)
    m[0, :] = m[0, :] / np.sqrt(2.0)
    return m


class DCT(Transformer, HasInputCol, HasOutputCol):
    inverse = BoolParam("inverse", "Perform inverse DCT (DCT-III).", False)

    def _transform(self, df: DataFrame) -> DataFrame:
        inverse = self.get_("inverse")

        @F.pandas_udf(ArrayType(DoubleType()))
        def dct_udf(s: pd.Series) -> pd.Series:
            if len(s) == 0:
                return s
            x = np.stack(s.to_numpy())
            m = dct2_matrix(x.shape[1])
            if inverse:
                m = m.T
            y = x @ m.T
            return pd.Series(list(y))

        return df.withColumn(self.get_("outputCol"), dct_udf(F.col(self.get_("inputCol"))))

    def transform_local(self, pdf):
        out = pdf.copy()
        col = pdf[self.get_("inputCol")]
        if len(col):
            x = np.stack([np.asarray(v, dtype=float) for v in col])
            m = dct2_matrix(x.shape[1])
            if self.get_("inverse"):
                m = m.T
            out[self.get_("outputCol")] = list(x @ m.T)
        else:
            out[self.get_("outputCol")] = []
        return out
