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
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..api import AlgoOperator
from ..param import HasFeaturesCol, StringParam

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


class MutualInformation(AlgoOperator):
    """Mutual information (nats) + normalized MI between two categorical
    columns — the Deequ ``MutualInformation`` analyzer: the dependence
    diagnostic ChiSq tests for but doesn't quantify (how much does
    ``source`` determine ``lang``?), and a standard redundant-feature /
    leakage check before training.

    ``transform(df)`` → one row: ``(n, mi, nmi)``; ``nmi = MI /
    sqrt(H(x)·H(y))`` (0 when either entropy is 0 — a constant column
    shares no information).

    Plan: ONE corpus scan builds the joint contingency ``groupBy(x, y)``
    (map-side partial-combined); the contingency is cardinality-sized
    (|X|·|Y| rows) by construction, so it is collected once and the
    MI/entropy sums run driver-side in numpy over CANONICALLY SORTED
    keys — bit-deterministic regardless of partitioning (a distributed
    ``F.sum`` over doubles is partition-order dependent, and the r04
    driver environment produced a different last-ulp value than the
    local run on exactly that path).  NULL is a category like any other
    (the groupBy keeps it, and the driver-side marginals key on the raw
    value, so no null-unsafe join can drop NULL cells from the MI sum
    while leaving them in n and the entropies).
    """

    xCol = StringParam("xCol", "First categorical column.", "x")
    yCol = StringParam("yCol", "Second categorical column.", "y")

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        x, y = self.get_("xCol"), self.get_("yCol")
        rows = df.groupBy(x, y).agg(F.count(F.lit(1)).alias("c")).collect()
        n = sum(r["c"] for r in rows)
        if n == 0:
            return [df.sparkSession.createDataFrame(
                [(0, 0.0, 0.0)], "n long, mi double, nmi double")]
        # canonical key order (NULLs last) -> fixed summation order
        key = lambda v: (v is None, 0 if v is None else v)
        cells = sorted(((r[x], r[y], r["c"]) for r in rows),
                       key=lambda t: (key(t[0]), key(t[1])))
        cx: dict = {}
        cy: dict = {}
        for kx, ky, c in cells:
            cx[kx] = cx.get(kx, 0) + c
            cy[ky] = cy.get(ky, 0) + c
        nf = float(n)
        c_arr = np.array([c for _, _, c in cells], dtype=np.float64)
        cx_arr = np.array([cx[kx] for kx, _, _ in cells], dtype=np.float64)
        cy_arr = np.array([cy[ky] for _, ky, _ in cells], dtype=np.float64)
        mi = float(np.sum((c_arr / nf)
                          * np.log(c_arr * nf / (cx_arr * cy_arr))))
        def ent(marg: dict) -> float:
            a = np.array([marg[k] for k in sorted(marg, key=key)],
                         dtype=np.float64)
            return float(np.sum((a / nf) * -np.log(a / nf)))

        hx, hy = ent(cx), ent(cy)
        denom = (hx * hy) ** 0.5
        nmi = (mi / denom) if denom > 0 else 0.0
        return [df.sparkSession.createDataFrame(
            [(int(n), float(mi), float(nmi))],
            "n long, mi double, nmi double")]
