"""PolynomialExpansion — degree-d polynomial expansion of a vector.

Reference: feature/polynomialexpansion/PolynomialExpansion.java:57, which
follows Spark MLlib's recursive expansion ordering (for [a,b], degree 2:
[a, a^2, b, ab, b^2]).  Implemented as an Arrow-batched pandas UDF with a
precomputed exponent table (one vectorized np.prod per batch).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType

from ..api import Transformer
from ..param import HasInputCol, HasOutputCol, IntParam, ParamValidators


@lru_cache(maxsize=128)
def expansion_exponents(dim: int, degree: int) -> np.ndarray:
    """Exponent rows in MLlib's recursive order (PolynomialExpansion.scala).

    expand(values, degree): iterate last index's power outermost-last —
    reproduced by the recursion below; returns (n_terms, dim) int matrix.
    """
    out: list[list[int]] = []

    def expand(idx: int, remaining: int, current: list[int]):
        if idx == dim:
            if sum(current) > 0:
                out.append(list(current))
            return
        for p in range(0, remaining + 1):
            current[idx] = p
            expand(idx + 1, remaining - p, current)
        current[idx] = 0

    expand(0, degree, [0] * dim)
    return np.array(out, dtype=np.int64)


class PolynomialExpansion(Transformer, HasInputCol, HasOutputCol):
    degree = IntParam("degree", "Polynomial degree (>=1).", 2, ParamValidators.gt(0))

    def _transform(self, df: DataFrame) -> DataFrame:
        degree = self.get_("degree")

        @F.pandas_udf(ArrayType(DoubleType()))
        def expand_udf(s: pd.Series) -> pd.Series:
            if len(s) == 0:
                return s
            x = np.stack(s.to_numpy())  # (batch, dim)
            exps = expansion_exponents(x.shape[1], degree)  # (terms, dim)
            # (batch, terms): prod over dims of x[:,d] ** exps[t,d]
            y = np.prod(x[:, None, :] ** exps[None, :, :], axis=2)
            return pd.Series(list(y))

        return df.withColumn(self.get_("outputCol"),
                             expand_udf(F.col(self.get_("inputCol"))))

    def transform_local(self, pdf):
        out = pdf.copy()
        col = pdf[self.get_("inputCol")]
        if len(col):
            x = np.stack([np.asarray(v, dtype=float) for v in col])
            exps = expansion_exponents(x.shape[1], self.get_("degree"))
            out[self.get_("outputCol")] = list(
                np.prod(x[:, None, :] ** exps[None, :, :], axis=2))
        else:
            out[self.get_("outputCol")] = []
        return out
