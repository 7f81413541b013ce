"""Sliced (per-group) binary-classification evaluation.

A single global AUC hides per-slice regressions — the standard fairness
/ data-quality practice is to evaluate per language, source, domain or
demographic slice.  Running BinaryClassificationEvaluator once per group
costs one job per slice; this operator computes EVERY slice's tie-aware
AUC in one pass from the Mann–Whitney midrank identity:

    AUC_g = (Σ_{pos∈g} midrank(score) − P_g(P_g+1)/2) / (P_g·N_g)

Plan: ``groupBy(group, score)`` collapses ties (map-side combine), a
group-PARTITIONED window (scalable — each group's cumsum stays inside
its hash partition, nothing global) produces midranks over the distinct
scores, and one more ``groupBy(group)`` closes the identity.  Doubled
midranks are integers, so the rank sums are exact (the Spearman
determinism discipline).  A pathologically giant single group degrades
to that group's distinct-score count in one task — the global evaluator
with its range-partition machinery is the tool for that case.

``transform(df)`` → one row per group:
``(group, n, n_pos, auc)``; groups with no positives or no negatives
yield NaN auc (undefined), not an error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..api import AlgoOperator
from ..param import HasLabelCol, HasRawPredictionCol, StringParam


class SlicedBinaryClassificationEvaluator(AlgoOperator, HasLabelCol,
                                          HasRawPredictionCol):
    groupCol = StringParam("groupCol", "Slice column.", "group")

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        gcol = self.get_("groupCol")
        score = F.col(self.get_("rawPredictionCol")).cast("double")
        y = F.col(self.get_("labelCol")).cast("double")
        g = (df.select(F.col(gcol).alias("g"), score.alias("s"),
                       F.when(y == 1.0, 1).otherwise(0).alias("p"))
             .groupBy("g", "s")
             .agg(F.sum("p").alias("pos"), F.count("*").alias("tot")))
        w = Window.partitionBy("g").orderBy("s")
        cum = F.sum("tot").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        # doubled midrank stays integral: 2·(cnt_less + (ties+1)/2)
        mid2 = 2 * (cum - F.col("tot")) + F.col("tot") + 1
        ranked = g.withColumn("m2", mid2)
        dx = F.col("pos").cast("decimal(19,0)")
        agg = (ranked.groupBy("g")
               .agg(F.sum("pos").alias("P"),
                    F.sum(F.col("tot") - F.col("pos")).alias("N"),
                    F.sum((dx * F.col("m2").cast("decimal(19,0)"))
                          .cast("decimal(38,0)")).alias("r2sum")))
        P = F.col("P").cast("double")
        N = F.col("N").cast("double")
        auc = ((F.col("r2sum").cast("double") / 2.0
                - P * (P + 1) / 2.0) / (P * N))
        return [agg.select(
            F.col("g").alias(gcol),
            (F.col("P") + F.col("N")).alias("n"),
            F.col("P").alias("n_pos"),
            F.when((F.col("P") > 0) & (F.col("N") > 0), auc)
             .otherwise(F.lit(float("nan"))).alias("auc"))]
