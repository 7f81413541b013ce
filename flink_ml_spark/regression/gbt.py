"""GBTRegressor — gradient-boosted regression trees (squared loss).

Boosting on top of :class:`DecisionTreeRegressor` (Friedman 2001):
F₀ = exact global label mean, then each round fits a bit-exact
histogram tree to the CURRENT residuals and adds it with shrinkage
``learningRate``.  For squared loss the gradient IS the residual, so
each round is: residual column update (pure codegen arithmetic) →
one tree fit (maxDepth corpus scans) → localCheckpoint (bounded
lineage).  The whole ensemble inherits the tree's determinism: exact
decimal histogram sums + exact-rational split comparisons mean the
SAME forest on any partitioning, any cluster size, any engine.

Inference compiles F₀ + η·Σ trees into one stack of nested codegen
CASE expressions — zero shuffles; ``transform_local`` serves the same
ensemble over pandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..api import Estimator, Model
from ..param import (FloatParam, HasFeaturesCol, HasLabelCol,
                     HasPredictionCol, IntParam, ParamValidators,
                     StringParam)
from .tree import DecisionTreeRegressor

# past this many accumulated tree nodes, the residual chain folds into a
# stored column (one materialization) instead of growing the expression —
# round t otherwise re-evaluates all t-1 prior trees' CASE walks in every
# level pass, O(numTrees² · depth) expression work and unbounded codegen
# (the tree fit's _NODE_EXPR_LIMIT, applied to the boosting dimension)
_RESID_EXPR_LIMIT = 512


def _tree_pred_bins(nodes: dict[int, dict]):
    """Tree prediction routed by the BIN columns: bin ≤ split-bin ⟺
    x ≤ thr (a row's bin is the count of thresholds strictly below x —
    the lemma the random_forest oracle already replays), so this equals
    the model's x-based CASE exactly on every non-NaN feature value.
    Used inside GBT's residual chain, where only the binned frame is
    materialized."""

    def expr(node: int):
        info = nodes.get(node)
        if info is None:
            return F.lit(None).cast("double")
        if "value" in info:
            return F.lit(float(info["value"]))
        return F.when(
            F.col(f"b{int(info['feat'])}") <= F.lit(int(info["bin"])),
            expr(2 * node + 1)).otherwise(expr(2 * node + 2))

    return expr(0)


class GBTRegressor(Estimator, HasFeaturesCol, HasLabelCol,
                   HasPredictionCol):
    numTrees = IntParam("numTrees", "Boosting rounds.", 10,
                        ParamValidators.gt(0))
    learningRate = FloatParam("learningRate", "Shrinkage η.", 0.3,
                              ParamValidators.in_range(
                                  0, 1, lower_inclusive=False))
    maxDepth = IntParam("maxDepth", "Depth per tree.", 3,
                        ParamValidators.in_range(1, 12))
    maxBins = IntParam("maxBins", "Histogram bins per feature.", 32,
                       ParamValidators.in_range(2, 1024))
    minInstancesPerNode = IntParam(
        "minInstancesPerNode", "Minimum rows per split side.", 1,
        ParamValidators.gt(0))
    labelScale = IntParam("labelScale", "Fixed-point decimals for the "
                          "per-tree residual grid.", 6,
                          ParamValidators.in_range(0, 9))
    binStrategy = StringParam(
        "binStrategy", "uniform | quantile bin edges.", "uniform",
        ParamValidators.in_array(["uniform", "quantile"]))

    def fit(self, *inputs: DataFrame) -> "GBTRegressorModel":
        (df,) = inputs
        fcol = self.get_("featuresCol")
        eta = float(self.get_("learningRate"))
        scale = 10 ** int(self.get_("labelScale"))
        y = F.col(self.get_("labelCol")).cast("double")
        cur = (df.select(F.col(fcol).cast("array<double>").alias("x"),
                         y.alias("y"))
               .filter(F.col("x").isNotNull() & F.col("y").isNotNull()))
        # F0 = exact global mean: decimal sum of grid labels / n; the
        # same aggregation carries the feature width (first row's dim,
        # as the tree fit would read it) — no separate probe job — and a
        # NaN-feature fail-fast: _tree_pred_bins routes NaN left (every
        # `x > thr` is false → bin 0) while the returned model's x-based
        # CASE routes NaN right (`x <= thr` false), so a NaN-featured fit
        # would silently train against residuals the model cannot replay
        agg = cur.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("y") * scale).cast("long")
                  .cast("decimal(38,0)")).alias("s"),
            F.size(F.first("x")).alias("d"),
            F.max(F.exists("x", F.isnan)).alias("has_nan")).first()
        n = int(agg["n"])
        if n == 0:
            raise ValueError("GBTRegressor: no training rows")
        if agg["has_nan"]:
            raise ValueError(
                "GBTRegressor: NaN feature values are unsupported (the "
                "binned residual chain and the fitted model route NaN to "
                "opposite split sides); impute or drop NaN rows first")
        f0 = int(agg["s"] or 0) / n / scale
        dim = int(agg["d"])
        base_tree = DecisionTreeRegressor(
            featuresCol="x", labelCol="y",
            maxDepth=int(self.get_("maxDepth")),
            maxBins=int(self.get_("maxBins")),
            minInstancesPerNode=int(self.get_("minInstancesPerNode")),
            labelScale=int(self.get_("labelScale")),
            binStrategy=self.get_("binStrategy"))
        # r09 restructure (guide §1.2 — don't recompute what doesn't
        # change): thresholds and bin indices depend on the FEATURES
        # only, which are constant across the residual chain, so they
        # are computed once and the boosting loop runs entirely over ONE
        # checkpointed (y − F0, bins) frame.  Each round's residual is a
        # column expression — (y − F0) − η·Σ tree_t(bins) with trees
        # routed by the `bin ≤ split-bin ⟺ x ≤ thr` lemma — evaluated
        # in the same left-to-right order the old per-round checkpoint
        # stored, so every tree sees bit-identical labels while the old
        # shape's per-round threshold job, full re-bin, transform job
        # and TWO materializations per round all disappear.
        thresholds = base_tree._thresholds(cur, dim)
        binned = DecisionTreeRegressor._bin_frame(
            cur.withColumn("y", F.col("y") - F.lit(f0)), thresholds) \
            .localCheckpoint(eager=True)
        resid = F.col("y")
        trees = []
        acc_nodes = 0  # CASE nodes accumulated in the resid expression
        for t in range(int(self.get_("numTrees"))):
            grid = F.round(resid * scale).cast("long")
            frame = binned.select(
                grid.alias("y"),
                *[F.col(f"b{i}") for i in range(dim)])
            nodes = base_tree._fit_binned(frame, thresholds, scale)
            trees.append({str(k): v for k, v in nodes.items()})
            if t + 1 < int(self.get_("numTrees")):
                resid = resid - F.lit(eta) * _tree_pred_bins(nodes)
                acc_nodes += len(nodes)
                if acc_nodes > _RESID_EXPR_LIMIT:
                    # long chain: materialize the residual prefix once
                    # (doubles are left-fold-evaluated either way, so the
                    # stored value is bit-identical to the lazy chain)
                    binned = binned.select(
                        resid.alias("y"),
                        *[F.col(f"b{i}") for i in range(dim)]) \
                        .localCheckpoint(eager=True)
                    resid = F.col("y")
                    acc_nodes = 0
        model = GBTRegressorModel()
        model.set_(featuresCol=fcol,
                   predictionCol=self.get_("predictionCol"))
        model.model_data = {"f0": float(f0), "eta": eta, "trees": trees,
                            "dim": dim}
        return model


class GBTRegressorModel(Model, HasFeaturesCol, HasPredictionCol):
    def _transform(self, df: DataFrame) -> DataFrame:
        eta = float(self.model_data["eta"])
        pred = F.lit(float(self.model_data["f0"]))
        x = F.col(self.get_("featuresCol")).cast("array<double>")
        for nodes in self.model_data["trees"]:
            nm = {int(k): v for k, v in nodes.items()}

            def expr(node: int, nm=nm):
                info = nm.get(node)
                if info is None:
                    return F.lit(0.0)
                if "value" in info:
                    return F.lit(float(info["value"]))
                return F.when(x[info["feat"]] <= F.lit(info["thr"]),
                              expr(2 * node + 1, nm)) \
                    .otherwise(expr(2 * node + 2, nm))

            pred = pred + F.lit(eta) * expr(0)
        return df.withColumn(self.get_("predictionCol"), pred)

    def transform_local(self, pdf):
        eta = float(self.model_data["eta"])
        out = pdf.copy()

        def walk(nm, vec) -> float:
            node = 0
            while True:
                info = nm.get(node)
                if info is None:
                    return 0.0
                if "value" in info:
                    return float(info["value"])
                node = (2 * node + 1 if vec[info["feat"]] <= info["thr"]
                        else 2 * node + 2)

        maps = [{int(k): v for k, v in nodes.items()}
                for nodes in self.model_data["trees"]]
        out[self.get_("predictionCol")] = [
            float(self.model_data["f0"])
            + eta * sum(walk(nm, v) for nm in maps)
            for v in pdf[self.get_("featuresCol")]]
        return out

    def feature_importances(self) -> list[float]:
        """Gain-based importances over all boosting rounds (zeros for a
        pre-gain artifact)."""
        from .tree import ensemble_importances
        dim = int(self.model_data.get(
            "dim", 1 + max((int(v["feat"])
                            for nodes in self.model_data["trees"]
                            for v in nodes.values() if "feat" in v),
                           default=-1)))
        return ensemble_importances(self.model_data["trees"], dim)
