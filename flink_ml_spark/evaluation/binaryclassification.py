"""BinaryClassificationEvaluator — exact AUC / AUPRC / KS / Lorenz.

Reference: evaluation/binaryclassification/BinaryClassificationEvaluator.java:76
(metrics list in BinaryClassificationEvaluatorParams.java:35-57).  The
reference samples score boundaries, range-partitions, sorts partitions and
merges partial (TP/FP) summaries (:376-450) to get an exact tie-aware AUC.

Spark-first exact plan with the same guarantees and better scaling: group
by distinct score (map-side combine → |distinct scores| rows), window
cumsum over the score-ordered group table, closed-form tie-aware metrics:

  AUC  = Σ_ties [ neg_below·pos + pos·neg/2 ]   / (P·N)   (trapezoid/ties)
  KS   = max |cumPosRate - cumNegRate|
  AUPRC (reference formula): trapezoid over (recall, precision) points at
  each distinct score descending.
  Lorenz: trapezoid over (cum fraction of samples, cum fraction of
  positives), scores ascending — areaUnderLorenz.

Weighted variants via ``weightCol``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..api import AlgoOperator
from ..param import HasLabelCol, HasRawPredictionCol, HasWeightCol


class BinaryClassificationEvaluator(AlgoOperator, HasLabelCol,
                                    HasRawPredictionCol, HasWeightCol):
    """transform(df) -> one-row DataFrame with columns
    areaUnderROC, areaUnderPR, ks, areaUnderLorenz."""

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        lcol = self.get_("labelCol")
        rcol = self.get_("rawPredictionCol")
        wcol = self.get_("weightCol")
        w = F.col(wcol).cast("double") if wcol else F.lit(1.0)
        # rawPrediction may be a 2-array (prob per class) or a scalar score
        rtype = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[rcol]
        score = (F.element_at(F.col(rcol), 2) if rtype.startswith("array")
                 else F.col(rcol).cast("double"))
        base = df.select(score.alias("score"),
                         F.col(lcol).cast("double").alias("y"), w.alias("w"))
        grouped = (base.groupBy("score")
                   .agg(F.sum(F.when(F.col("y") == 1.0, F.col("w")).otherwise(0.0)).alias("pos"),
                        F.sum(F.when(F.col("y") != 1.0, F.col("w")).otherwise(0.0)).alias("neg")))
        wd = Window.orderBy(F.desc("score")).rowsBetween(Window.unboundedPreceding, 0)
        wa = Window.orderBy(F.asc("score")).rowsBetween(Window.unboundedPreceding, -1)
        cum = (grouped
               # descending cumulative (threshold sweep high→low)
               .withColumn("cum_pos_d", F.sum("pos").over(wd))
               .withColumn("cum_neg_d", F.sum("neg").over(wd))
               # ascending cumulative strictly-below counts
               .withColumn("neg_below", F.coalesce(F.sum("neg").over(wa), F.lit(0.0)))
               .withColumn("pos_below", F.coalesce(F.sum("pos").over(wa), F.lit(0.0))))
        totals = grouped.agg(F.sum("pos").alias("P"), F.sum("neg").alias("N")).collect()[0]
        P, N = float(totals["P"]), float(totals["N"])
        if P == 0 or N == 0:
            out = df.sparkSession.createDataFrame(
                [(float("nan"),) * 4],
                "areaUnderROC double, areaUnderPR double, ks double, areaUnderLorenz double")
            return [out]
        agg = cum.agg(
            # tie-aware Mann-Whitney: each positive-group counts negatives
            # strictly below + half of same-score negatives
            F.sum(F.col("pos") * (F.col("neg_below") + F.col("neg") / 2)).alias("u"),
            F.max(F.abs(F.col("cum_pos_d") / P - F.col("cum_neg_d") / N)).alias("ks"),
            # AUPRC: trapezoid between consecutive distinct-score points of
            # (recall = cum_pos_d/P, precision = cum_pos_d/(cum_pos_d+cum_neg_d))
            F.sum(
                (F.col("pos") / P) *
                ((F.col("cum_pos_d") / (F.col("cum_pos_d") + F.col("cum_neg_d"))) +
                 ((F.col("cum_pos_d") - F.col("pos")) /
                  F.greatest(F.col("cum_pos_d") - F.col("pos") + F.col("cum_neg_d") - F.col("neg"),
                             F.lit(1e-300)))) / 2
            ).alias("auprc"),
            # Lorenz: ascending scores, x = cum fraction of all, y = cum
            # fraction of positives; trapezoid per group
            F.sum(
                ((F.col("pos") + F.col("neg")) / (P + N)) *
                ((F.col("pos_below") + F.col("pos_below") + F.col("pos")) / P) / 2
            ).alias("lorenz"),
        ).collect()[0]
        auc = float(agg["u"]) / (P * N)
        out = df.sparkSession.createDataFrame(
            [(auc, float(agg["auprc"]), float(agg["ks"]), float(agg["lorenz"]))],
            "areaUnderROC double, areaUnderPR double, ks double, areaUnderLorenz double")
        return [out]
