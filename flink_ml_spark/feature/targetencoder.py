"""TargetEncoder — smoothed mean (m-estimate) encoding of a categorical
column, with a leakage-safe out-of-fold mode for encoding training data.

The standard high-cardinality categorical treatment (Micci-Barreca 2001
"A preprocessing scheme for high-cardinality categorical attributes";
sklearn's TargetEncoder): replace category c with

    enc(c) = (Σ_c y + m·ȳ) / (n_c + m)

the Bayesian m-estimate shrinking rare categories toward the global
prior ȳ.  Encoding the SAME rows the statistics were fit on leaks the
label; the standard fix is out-of-fold encoding — here the folds are
DETERMINISTIC (the corpus-prep LCG over an id column), so the encoding
is reproducible, retry-stable, and exactly replayable by a SQL oracle,
unlike RNG fold assignment.

Scale design: fit = ONE groupBy(category) aggregation carrying (n, Σy)
— map-side combine, category-cardinality-sized model (guarded by
``maxCategories``).  Out-of-fold transform needs per-(category, fold)
partials: one groupBy((category, fold)) — k× the model size — and the
out-of-fold statistic is pure arithmetic: (N_c − n_cf, S_c − s_cf).
Both transforms are broadcast-join row functions; nothing corpus-sized
ever reaches the driver beyond the guarded category relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..api import Estimator, Model
from ..param import (FloatParam, HasLabelCol, IntParam, ParamValidators,
                     StringParam)

# the corpus-prep LCG (sampling._unit_hash) — folds must be engine-
# reproducible, so the fold key is ((id % M)·A + salt) % M % k
_HASH_MOD = 2147483648
_HASH_MULT = 2654435761


class TargetEncoder(Estimator, HasLabelCol):
    inputCol = StringParam("inputCol", "Categorical column.", "category")
    outputCol = StringParam("outputCol", "Encoded column.", "encoded")
    smoothing = FloatParam("smoothing", "m-estimate pseudo-count toward "
                           "the global prior.", 20.0,
                           ParamValidators.gt_eq(0))
    maxCategories = IntParam("maxCategories", "Fail fast above this many "
                             "distinct categories.", 10_000_000,
                             ParamValidators.gt(0))

    def fit(self, *inputs: DataFrame) -> "TargetEncoderModel":
        (df,) = inputs
        # categories key by their STRING form everywhere (fit, both
        # transforms, persistence) — save dumps strings and load
        # restored '__cat__ string', so a model fit on a numeric
        # category column used to stop matching after reload
        c = F.col(self.get_("inputCol")).cast("string")
        y = F.col(self.get_("labelCol")).cast("double")
        stats = (df.filter(c.isNotNull() & y.isNotNull())
                 .groupBy(c.alias("__cat__"))
                 .agg(F.count("*").alias("__n__"), F.sum(y).alias("__s__"))
                 .localCheckpoint(eager=True))
        m = stats.count()
        if m > self.get_("maxCategories"):
            raise ValueError(
                f"TargetEncoder saw {m} categories in "
                f"'{self.get_('inputCol')}' (> maxCategories="
                f"{self.get_('maxCategories')}); is this an id column?")
        tot = stats.agg(F.sum("__n__"), F.sum("__s__")).first()
        n_all = int(tot[0] or 0)
        if n_all == 0:
            raise ValueError("TargetEncoder: no non-null (category, label) "
                             "rows to fit on")
        model = TargetEncoderModel()
        model.set_(inputCol=self.get_("inputCol"),
                   outputCol=self.get_("outputCol"),
                   labelCol=self.get_("labelCol"))
        model.set(TargetEncoderModel.smoothing, self.get_("smoothing"))
        model.model_data = {"prior": float(tot[1]) / n_all, "n": n_all}
        model._stats = stats
        return model


class TargetEncoderModel(Model, HasLabelCol):
    inputCol = StringParam("inputCol", "Categorical column.", "category")
    outputCol = StringParam("outputCol", "Encoded column.", "encoded")
    smoothing = FloatParam("smoothing", "m-estimate pseudo-count.", 20.0)
    idCol = StringParam("idCol", "Integer id column driving the "
                        "deterministic fold hash (out-of-fold mode).", "id")
    numFolds = IntParam("numFolds", "Folds for transform_oof.", 5,
                        ParamValidators.gt(1))
    foldSalt = IntParam("foldSalt", "Fold-hash salt.", 7)

    def _transform(self, df: DataFrame) -> DataFrame:
        """Plain encoding (for data DISJOINT from the fit split): smoothed
        mean per category, prior for unseen/null categories."""
        m = float(self.get_("smoothing"))
        prior = float(self.model_data["prior"])
        enc = ((F.col("__s__") + m * prior)
               / (F.col("__n__") + m)).alias(self.get_("outputCol"))
        joined = df.join(
            F.broadcast(self._stats),
            df[self.get_("inputCol")].cast("string") == F.col("__cat__"),
            "left")
        return (joined.withColumn(self.get_("outputCol"),
                                  F.coalesce(enc, F.lit(prior)))
                .drop("__cat__", "__n__", "__s__"))

    def transform_oof(self, df: DataFrame) -> DataFrame:
        """Leakage-safe encoding of the FIT split itself: each row is
        encoded with the statistics of every fold EXCEPT its own
        (fold = deterministic LCG of ``idCol`` mod ``numFolds``)."""
        m = float(self.get_("smoothing"))
        prior = float(self.model_data["prior"])
        k = int(self.get_("numFolds"))
        salt = int(self.get_("foldSalt"))
        cat = F.col(self.get_("inputCol")).cast("string")
        y = F.col(self.get_("labelCol")).cast("double")
        idc = F.col(self.get_("idCol"))
        inner = ((idc % _HASH_MOD) + _HASH_MOD) % _HASH_MOD
        fold = (((inner * _HASH_MULT + F.lit(salt)) % _HASH_MOD
                 + _HASH_MOD) % _HASH_MOD % k).cast("int")
        tagged = df.withColumn("__fold__", fold)
        per_cf = (tagged.filter(cat.isNotNull() & y.isNotNull())
                  .groupBy(cat.alias("__cat__"), F.col("__fold__"))
                  .agg(F.count("*").alias("__nf__"),
                       F.sum(y).alias("__sf__")))
        full = (per_cf.groupBy("__cat__")
                .agg(F.sum("__nf__").alias("__n__"),
                     F.sum("__sf__").alias("__s__")))
        stats = per_cf.join(full, "__cat__")
        joined = tagged.join(
            F.broadcast(stats),
            (tagged[self.get_("inputCol")].cast("string")
             == F.col("__cat__"))
            & (tagged["__fold__"] == stats["__fold__"]), "left") \
            .drop(stats["__fold__"])
        oof_n = F.col("__n__") - F.col("__nf__")
        oof_s = F.col("__s__") - F.col("__sf__")
        enc = (oof_s + m * prior) / (oof_n + m)
        return (joined.withColumn(self.get_("outputCol"),
                                  F.coalesce(enc, F.lit(prior)))
                .drop("__cat__", "__n__", "__s__", "__nf__", "__sf__",
                      "__fold__"))

    def _save_model_data(self, path: str) -> None:
        import json
        import os
        rows = [(r["__cat__"], int(r["__n__"]), float(r["__s__"]))
                for r in self._stats.collect()]
        with open(os.path.join(path, "model_data.json"), "w") as f:
            json.dump({"prior": self.model_data["prior"],
                       "n": self.model_data["n"], "stats": rows}, f)

    def _load_model_data(self, spark, path: str) -> None:
        import json
        import os
        with open(os.path.join(path, "model_data.json")) as f:
            data = json.load(f)
        self.model_data = {"prior": data["prior"], "n": data["n"]}
        self._stats = spark.createDataFrame(
            [tuple(r) for r in data["stats"]],
            "__cat__ string, __n__ long, __s__ double")


class RareCategoryCollapser(Estimator):
    """Collapse long-tail categories into one sentinel value — the
    standard prep ahead of one-hot / target encoding (unbounded
    vocabularies leak ids and overfit singletons).  Keep rule:
    ``count ≥ minCount`` AND ``count/n ≥ minFraction`` (the fraction
    form is scale-invariant — the same categories survive at sf0.01 and
    at 100 TB if the distribution holds).

    Fit = ONE groupBy count (maxCategories-guarded); the model holds the
    keep set and transforms via a broadcast left_semi-style join — no
    literal IN list that would blow the plan at large keep sets;
    ``transform_local`` serves from the same set."""

    inputCol = StringParam("inputCol", "Categorical column.", "category")
    outputCol = StringParam("outputCol", "Collapsed column.", "collapsed")
    minCount = IntParam("minCount", "Absolute keep threshold.", 2,
                        ParamValidators.gt_eq(0))
    minFraction = FloatParam("minFraction", "Relative keep threshold.",
                             0.0, ParamValidators.in_range(0, 1))
    otherValue = StringParam("otherValue", "Sentinel for collapsed "
                             "categories.", "__other__")
    maxCategories = IntParam("maxCategories", "Fail fast above this many "
                             "distinct categories.", 10_000_000,
                             ParamValidators.gt(0))

    def fit(self, *inputs: DataFrame) -> "RareCategoryCollapserModel":
        (df,) = inputs
        # string-keyed keep set (persistence round-trips strings; see
        # TargetEncoder.fit)
        c = F.col(self.get_("inputCol")).cast("string")
        stats = (df.filter(c.isNotNull())
                 .groupBy(c.alias("__cat__"))
                 .agg(F.count("*").alias("__n__"))
                 .localCheckpoint(eager=True))
        m = stats.count()
        if m > self.get_("maxCategories"):
            raise ValueError(
                f"RareCategoryCollapser saw {m} categories (> "
                f"maxCategories={self.get_('maxCategories')})")
        n = stats.agg(F.sum("__n__")).first()[0] or 0
        # exact rational ceil: integer count ≥ minFraction·n ⇔ count ≥
        # ⌈minFraction·n⌉; float floor kept categories slightly BELOW
        # the documented keep rule, and float ceil can err at exact
        # multiples (0.045·n = k±ulp)
        import math
        from fractions import Fraction
        frac = Fraction(str(self.get_("minFraction")))
        thresh = max(int(self.get_("minCount")),
                     math.ceil(frac * n) if n else 0)
        keep = stats.filter(F.col("__n__") >= thresh).select("__cat__")
        model = RareCategoryCollapserModel()
        model.set_(inputCol=self.get_("inputCol"),
                   outputCol=self.get_("outputCol"),
                   otherValue=self.get_("otherValue"))
        model._keep = keep.localCheckpoint(eager=True)
        model.model_data = {"n": int(n), "threshold": int(thresh)}
        return model


class RareCategoryCollapserModel(Model):
    inputCol = StringParam("inputCol", "Categorical column.", "category")
    outputCol = StringParam("outputCol", "Collapsed column.", "collapsed")
    otherValue = StringParam("otherValue", "Sentinel.", "__other__")

    def _transform(self, df: DataFrame) -> DataFrame:
        ic = self.get_("inputCol")
        joined = df.join(
            F.broadcast(self._keep.withColumn("__keep__", F.lit(True))),
            df[ic].cast("string") == F.col("__cat__"), "left")
        # output is always string: the sentinel is a string, and ANSI
        # type coercion would otherwise try to cast IT to a numeric
        # input column's type
        return (joined.withColumn(
                    self.get_("outputCol"),
                    F.when(F.col("__keep__"), F.col(ic).cast("string"))
                     .otherwise(F.lit(self.get_("otherValue"))))
                .drop("__cat__", "__keep__"))

    def transform_local(self, pdf):
        keep = {r["__cat__"] for r in self._keep.collect()}
        out = pdf.copy()
        ic = self.get_("inputCol")
        other = self.get_("otherValue")
        out[self.get_("outputCol")] = [
            str(v) if v is not None and str(v) in keep else other
            for v in out[ic]]
        return out

    def _save_model_data(self, path: str) -> None:
        import json
        import os
        with open(os.path.join(path, "model_data.json"), "w") as f:
            json.dump({**self.model_data,
                       "keep": sorted(str(r["__cat__"])
                                      for r in self._keep.collect())}, f)

    def _load_model_data(self, spark, path: str) -> None:
        import json
        import os
        with open(os.path.join(path, "model_data.json")) as f:
            data = json.load(f)
        self.model_data = {"n": data["n"], "threshold": data["threshold"]}
        self._keep = spark.createDataFrame(
            [(v,) for v in data["keep"]], "__cat__ string")
