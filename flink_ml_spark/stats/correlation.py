"""Pearson correlation matrix over an array column — one pass.

The reference's stats family (ChiSqTest/ANOVATest/FValueTest, SURVEY
§2.7) covers feature-vs-label association; a feature-vs-feature
correlation matrix is the natural completion (Spark MLlib ships it as
``ml.stat.Correlation``) and a standard pre-training diagnostic for
embedding / numeric-feature tables.

Scale design: the sufficient statistic is exactly the covariance
partial (n, Σx, ΣxxT) already used by PCAWhitener — ONE zero-shuffle
``mapInPandas`` pass emitting dim + dim² doubles per partition, combined
driver-side; corr(i,j) = cov(i,j) / (σi·σj) is then dim×dim driver
arithmetic.  Rows leaving the cluster = number of partitions, output
rows = dim·(dim+1)/2 — both independent of corpus size.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..api import AlgoOperator
from ..param import HasFeaturesCol

_SCHEMA = T.StructType([
    T.StructField("i", T.IntegerType()),
    T.StructField("j", T.IntegerType()),
    T.StructField("corr", T.DoubleType()),
])


class CorrelationMatrix(AlgoOperator, HasFeaturesCol):
    """``transform(df)`` → one DataFrame of flattened upper-triangle
    Pearson correlations ``(i, j, corr)`` with ``i ≤ j`` over the
    ``featuresCol`` array column.  Sample covariance (n−1 denominator,
    matching ANSI ``CORR`` — the denominator cancels in the ratio, so
    sample vs population gives identical correlations).  Zero-variance
    dimensions yield null (undefined), not ±inf."""

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        from ..llmdata.simsearch import covariance_partials
        n, _, cov = covariance_partials(df, self.get_("featuresCol"))
        sd = np.sqrt(np.diag(cov))
        rows = []
        for i in range(cov.shape[0]):
            for j in range(i, cov.shape[0]):
                if sd[i] > 0 and sd[j] > 0:
                    c = float(cov[i, j] / (sd[i] * sd[j]))
                    # clamp the last-ulp excursions the two-step
                    # (ΣxxT − n·x̄x̄ᵀ) form can produce
                    c = max(-1.0, min(1.0, c))
                else:
                    c = None
                rows.append((i, j, c))
        return [df.sparkSession.createDataFrame(rows, _SCHEMA)]
