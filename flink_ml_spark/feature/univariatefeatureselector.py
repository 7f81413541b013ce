"""UnivariateFeatureSelector / Model.

Reference: feature/univariatefeatureselector/UnivariateFeatureSelector.java:92
— scores features against the label with a test chosen by featureType ×
labelType (categorical×categorical → chi2; continuous×categorical →
ANOVA-F; continuous×continuous → F-value), then selects by mode:
numTopFeatures / percentile / fpr / fdr / fwe.  Reuses the §2.7 stats ops.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..api import Estimator, Model
from ..param import (FloatParam, HasFeaturesCol, HasLabelCol, HasOutputCol,
                     ParamValidators, StringParam)


class UnivariateFeatureSelector(Estimator, HasFeaturesCol, HasLabelCol,
                                HasOutputCol):
    featureType = StringParam("featureType", "categorical | continuous.", None,
                              ParamValidators.in_array(["categorical", "continuous"]))
    labelType = StringParam("labelType", "categorical | continuous.", None,
                            ParamValidators.in_array(["categorical", "continuous"]))
    selectionMode = StringParam(
        "selectionMode", "numTopFeatures | percentile | fpr | fdr | fwe.",
        "numTopFeatures",
        ParamValidators.in_array(["numTopFeatures", "percentile", "fpr", "fdr", "fwe"]))
    selectionThreshold = FloatParam("selectionThreshold",
                                    "Mode-dependent threshold (count or rate).", None)

    def fit(self, *inputs: DataFrame) -> "UnivariateFeatureSelectorModel":
        from ..stats import ANOVATest, ChiSqTest, FValueTest
        (df,) = inputs
        ft, lt = self.get_("featureType"), self.get_("labelType")
        if ft == "categorical" and lt == "categorical":
            test = ChiSqTest(flatten=True,
                              featuresCol=self.get_("featuresCol"),
                             labelCol=self.get_("labelCol"))
        elif ft == "continuous" and lt == "categorical":
            test = ANOVATest(flatten=True,
                              featuresCol=self.get_("featuresCol"),
                             labelCol=self.get_("labelCol"))
        elif ft == "continuous" and lt == "continuous":
            test = FValueTest(flatten=True,
                              featuresCol=self.get_("featuresCol"),
                              labelCol=self.get_("labelCol"))
        else:
            raise ValueError(f"unsupported featureType={ft} labelType={lt}")
        scores = test.transform(df)[0].collect()
        pvals = [(r["featureIndex"], r["pValue"]) for r in scores]
        n = len(pvals)
        mode = self.get_("selectionMode")
        thr = self.get_("selectionThreshold")
        if thr is None:
            thr = 50 if mode == "numTopFeatures" else (0.1 if mode == "percentile" else 0.05)
        by_p = sorted(pvals, key=lambda t: (t[1], t[0]))
        if mode == "numTopFeatures":
            keep = [i for i, _ in by_p[: int(thr)]]
        elif mode == "percentile":
            keep = [i for i, _ in by_p[: int(np.ceil(thr * n))]]
        elif mode == "fpr":
            keep = [i for i, p in pvals if p < thr]
        elif mode == "fdr":  # Benjamini-Hochberg
            keep = []
            max_k = 0
            for rank, (i, p) in enumerate(by_p, start=1):
                if p <= thr * rank / n:
                    max_k = rank
            keep = [i for i, _ in by_p[:max_k]]
        else:  # fwe (Bonferroni)
            keep = [i for i, p in pvals if p < thr / n]
        model = UnivariateFeatureSelectorModel()
        model.set_(featuresCol=self.get_("featuresCol"),
                   outputCol=self.get_("outputCol"))
        model.model_data = {"indices": sorted(keep)}
        return model


class UnivariateFeatureSelectorModel(Model, HasFeaturesCol, HasOutputCol):
    def _transform(self, df: DataFrame) -> DataFrame:
        col = F.col(self.get_("featuresCol"))
        out = F.array(*[F.element_at(col, int(i) + 1)
                        for i in self.model_data["indices"]])
        return df.withColumn(self.get_("outputCol"), out)

    def transform_local(self, pdf):
        idx = [int(i) for i in self.model_data["indices"]]
        out = pdf.copy()
        out[self.get_("outputCol")] = [
            [x[i] for i in idx] for x in pdf[self.get_("featuresCol")]]
        return out
