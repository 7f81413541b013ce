"""Probability-calibration evaluation: reliability diagram + ECE / MCE /
Brier score for binary probabilistic predictions.

The reference's evaluation family stops at ranking quality
(BinaryClassificationEvaluator: AUC/PR/KS); calibration — does p = 0.8
mean 80%? — is the other half of probabilistic model quality (Guo et
al. 2017 popularized ECE; Brier 1950).  A quality-classifier-gated
corpus pipeline cares directly: an uncalibrated gate threshold silently
shifts the kept-document distribution.

Plan: ONE scan bins every row (``bin = min(floor(p·B), B-1)``) into a
``groupBy(bin)`` carrying count, Σp, Σy and Σ(p−y)² — B-row output; the
summary (ECE = Σ nᵇ/N·|acc−conf|, MCE = max gap, Brier = ΣΣsq/N) is
driver arithmetic over those B rows.  Corpus size never leaves the
partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..api import AlgoOperator
from ..param import HasLabelCol, IntParam, ParamValidators, StringParam


class CalibrationEvaluator(AlgoOperator, HasLabelCol):
    """``transform(df)`` → ``[bins, summary]``:

    - ``bins``: one row per non-empty bin — ``(bin, n, conf, acc, gap)``
      with conf = mean predicted probability, acc = empirical positive
      rate, gap = acc − conf (the reliability diagram's data).
    - ``summary``: one row — ``(n, ece, mce, brier)``.

    ``probabilityCol`` must hold P(label=1) in [0, 1]; ``labelCol`` is
    0/1 (cast to double).
    """

    probabilityCol = StringParam("probabilityCol",
                                 "Predicted P(label=1) column.",
                                 "probability")
    numBins = IntParam("numBins", "Equal-width probability bins.", 10,
                       ParamValidators.gt(1))

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        b = self.get_("numBins")
        p = F.col(self.get_("probabilityCol")).cast("double")
        y = F.col(self.get_("labelCol")).cast("double")
        bin_ = F.least(F.floor(p * b), F.lit(b - 1)).cast("int")
        bins = (df.select(bin_.alias("bin"), p.alias("p"), y.alias("y"))
                .groupBy("bin")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.avg("p").alias("conf"),
                     F.avg("y").alias("acc"),
                     F.sum((F.col("p") - F.col("y"))
                           * (F.col("p") - F.col("y"))).alias("__ssq__")))
        rows = bins.collect()  # ≤ numBins rows — model-sized by design
        n = sum(r["n"] for r in rows)
        spark = df.sparkSession
        if n == 0:
            return [spark.createDataFrame(
                        [], "bin int, n long, conf double, acc double, "
                            "gap double"),
                    spark.createDataFrame(
                        [(0, 0.0, 0.0, 0.0)],
                        "n long, ece double, mce double, brier double")]
        gaps = [(r["bin"], r["n"], float(r["conf"]), float(r["acc"]),
                 float(r["acc"] - r["conf"])) for r in rows]
        ece = sum(r["n"] / n * abs(float(r["acc"] - r["conf"]))
                  for r in rows)
        mce = max(abs(g[4]) for g in gaps)
        brier = sum(float(r["__ssq__"]) for r in rows) / n
        out_bins = spark.createDataFrame(
            sorted(gaps), "bin int, n long, conf double, acc double, "
                          "gap double")
        summary = spark.createDataFrame(
            [(int(n), float(ece), float(mce), float(brier))],
            "n long, ece double, mce double, brier double")
        return [out_bins, summary]
