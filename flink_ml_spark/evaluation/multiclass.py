"""MulticlassClassificationEvaluator — confusion-matrix metrics.

The reference stops at binary ranking quality
(evaluation/binaryclassification/BinaryClassificationEvaluator.java:76);
multiclass label quality (accuracy / per-class precision-recall-F1 /
macro and weighted averages — Spark MLlib's
MulticlassClassificationEvaluator semantics) completes the family.

Plan: ONE ``groupBy(label, prediction)`` count — map-side combine, at
most K² rows out for K classes — then the per-class and averaged
metrics are driver arithmetic over that tiny confusion relation.  The
collect is guarded (``maxClasses``, default 10 000 → ≤ 10⁸ cells in
principle but practically K² of the OBSERVED pairs, typically ≪ K²)
so an id-like column can't OOM the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..api import AlgoOperator
from ..param import (HasLabelCol, HasPredictionCol, HasWeightCol, IntParam,
                     ParamValidators)


class MulticlassClassificationEvaluator(AlgoOperator, HasLabelCol,
                                        HasPredictionCol, HasWeightCol):
    """``transform(df)`` → ``[per_class, summary]``:

    - ``per_class``: one row per observed class —
      ``(label, n, tp, fp, fn, precision, recall, f1)`` (counts are
      weighted sums when ``weightCol`` is set; precision/recall are 0.0
      when their denominator is 0, matching MLlib).
    - ``summary``: one row — ``(n, accuracy, macro_precision,
      macro_recall, macro_f1, weighted_precision, weighted_recall,
      weighted_f1)``; macro averages over observed TRUE classes,
      weighted averages by true-class support.
    """

    maxClasses = IntParam(
        "maxClasses", "Fail fast above this many distinct labels "
        "(driver holds the confusion relation).", 10000,
        ParamValidators.gt(1))

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        spark = df.sparkSession
        wcol = self.get_("weightCol")
        w = F.col(wcol).cast("double") if wcol else F.lit(1.0)
        base = (df.select(
                    F.col(self.get_("labelCol")).cast("double").alias("y"),
                    F.col(self.get_("predictionCol")).cast("double")
                     .alias("p"), w.alias("w"))
                # null (or non-numeric-castable) labels/predictions carry
                # no class information; excluded from n and every metric
                .filter(F.col("y").isNotNull() & F.col("p").isNotNull()))
        cap = self.get_("maxClasses")
        # pre-collect guard: the exact post-collect check below fires
        # only AFTER ~rowcount rows reached the driver when the label is
        # id-like — estimate cardinality cluster-side first (±few % —
        # hence the slack factor; the exact guard still backstops)
        # 2x slack: the default ~5% rsd estimate can legitimately run a
        # few sigma high near the cap — this guard only exists to stop
        # id-like labels (orders of magnitude over), so a generous bound
        # keeps it deterministic on valid input; the exact post-collect
        # check below stays authoritative
        est = base.agg(F.approx_count_distinct("y").alias("ky"),
                       F.approx_count_distinct("p").alias("kp")).first()
        if max(int(est["ky"]), int(est["kp"])) > 2 * cap + 16:
            raise ValueError(
                f"MulticlassClassificationEvaluator: ~{est['ky']} labels /"
                f" ~{est['kp']} predictions exceed maxClasses={cap}; is "
                f"the label column an id?")
        cells = (base.groupBy("y", "p").agg(F.sum("w").alias("c"))
                 .collect())  # ≤ observed-pairs rows, maxClasses-guarded
        classes = sorted({r["y"] for r in cells} | {r["p"] for r in cells})
        if len(classes) > cap:
            raise ValueError(
                f"MulticlassClassificationEvaluator saw {len(classes)} "
                f"distinct classes (> maxClasses={cap}); is the label "
                f"column an id?")
        per_class_schema = ("label double, n double, tp double, fp double, "
                            "fn double, precision double, recall double, "
                            "f1 double")
        summary_schema = ("n double, accuracy double, macro_precision "
                          "double, macro_recall double, macro_f1 double, "
                          "weighted_precision double, weighted_recall "
                          "double, weighted_f1 double")
        if not cells:
            return [spark.createDataFrame([], per_class_schema),
                    spark.createDataFrame([(0.0,) + (float("nan"),) * 7],
                                          summary_schema)]
        tp = {k: 0.0 for k in classes}
        row_n = dict(tp)   # true-class support (Σ over predictions)
        col_n = dict(tp)   # predicted-class volume
        n = 0.0
        for r in cells:
            c = float(r["c"])
            n += c
            row_n[r["y"]] += c
            col_n[r["p"]] += c
            if r["y"] == r["p"]:
                tp[r["y"]] += c
        rows = []
        for k in classes:
            prec = tp[k] / col_n[k] if col_n[k] > 0 else 0.0
            rec = tp[k] / row_n[k] if row_n[k] > 0 else 0.0
            f1 = 2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
            rows.append((float(k), row_n[k], tp[k], col_n[k] - tp[k],
                         row_n[k] - tp[k], prec, rec, f1))
        observed_true = [r for r in rows if r[1] > 0]
        m = len(observed_true)
        acc = sum(tp.values()) / n
        macro = [sum(r[i] for r in observed_true) / m for i in (5, 6, 7)]
        weighted = [sum(r[i] * r[1] for r in observed_true) / n
                    for i in (5, 6, 7)]
        return [spark.createDataFrame(rows, per_class_schema),
                spark.createDataFrame(
                    [(n, acc, *macro, *weighted)], summary_schema)]
