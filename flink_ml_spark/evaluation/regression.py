"""RegressionEvaluator — mse / rmse / mae / r² in one aggregation pass.

The reference's evaluation family covers ranking quality only
(evaluation/binaryclassification/BinaryClassificationEvaluator.java:76);
regression-model quality is the other standard leg (Spark MLlib's
RegressionEvaluator semantics: rmse/mse/mae/r2 with the population SST).

Plan: ONE ``df.agg`` carries the sufficient statistics (n, Σe², Σ|e|,
Σy, Σy²) with map-side combine — a handful of doubles per partition
across the shuffle — and the metrics are closed-form column expressions
over that single row, entirely JVM-side:

  mse  = Σe²/n          rmse = √mse         mae = Σ|e|/n
  r²   = 1 − Σe² / (Σy² − (Σy)²/n)     (NaN when SST = 0)

No collect of anything corpus-sized; output is exactly one row, so the
plan is identical at sf0.001 and 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..api import AlgoOperator
from ..param import HasLabelCol, HasPredictionCol, HasWeightCol


class RegressionEvaluator(AlgoOperator, HasLabelCol, HasPredictionCol,
                          HasWeightCol):
    """``transform(df)`` → one-row DataFrame
    ``(n, mse, rmse, mae, r2)``.  ``weightCol`` (optional) makes every
    statistic weighted (n becomes Σw)."""

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        wcol = self.get_("weightCol")
        w = F.col(wcol).cast("double") if wcol else F.lit(1.0)
        y = F.col(self.get_("labelCol")).cast("double")
        p = F.col(self.get_("predictionCol")).cast("double")
        e = p - y
        agg = df.agg(
            F.sum(w).alias("n"),
            F.sum(w * e * e).alias("sse"),
            F.sum(w * F.abs(e)).alias("sae"),
            F.sum(w * y).alias("sy"),
            F.sum(w * y * y).alias("syy"))
        n = F.col("n")
        sst = F.col("syy") - F.col("sy") * F.col("sy") / n
        mse = F.col("sse") / n
        out = agg.select(
            n.cast("double").alias("n"),
            mse.alias("mse"),
            F.sqrt(mse).alias("rmse"),
            (F.col("sae") / n).alias("mae"),
            F.when(sst > 0, F.lit(1.0) - F.col("sse") / sst)
             .otherwise(F.lit(float("nan"))).alias("r2"))
        return [out]
