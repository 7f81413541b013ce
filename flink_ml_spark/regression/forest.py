"""RandomForestRegressor — bagged bit-exact histogram trees.

Closes the ensemble family next to :class:`GBTRegressor`: ``numTrees``
independent :class:`DecisionTreeRegressor` fits, each on a
DETERMINISTIC row subsample (the corpus-prep LCG over ``idCol``, one
salt per tree — reproducible and SQL-replayable, no RNG) and an
optionally sub-sampled feature set (``featureSubset="sqrt"`` draws a
per-tree LCG subset; node feature indices are remapped back to the
original space so inference reads the full feature array).  Prediction
= mean of the trees, compiled into one stack of codegen CASE
expressions — zero shuffles at inference.

The forest inherits the tree's bit-exactness: identical forests on any
partitioning, any cluster size, any engine.  Each tree costs maxDepth
corpus-subsample scans; ``parallelism > 1`` submits that many tree fits
from concurrent driver threads (Spark schedules independent jobs
concurrently — the 100 TB path when the cluster has headroom per fit);
trees are independent and deterministic, so results are IDENTICAL at
any parallelism and tree order is preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..api import Estimator, Model
from ..param import (HasFeaturesCol, HasLabelCol, HasPredictionCol,
                     IntParam, ParamValidators, StringParam)
from .tree import DecisionTreeRegressor

_M = 2147483648
_MULT = 2654435761


def _keep_pct(id_col: str, salt: int, pct: int):
    idc = F.col(id_col)
    inner = ((idc % _M) + _M) % _M
    return (((inner * _MULT + F.lit(salt)) % _M + _M) % _M % 100) < pct


class RandomForestRegressor(Estimator, HasFeaturesCol, HasLabelCol,
                            HasPredictionCol):
    numTrees = IntParam("numTrees", "Trees in the forest.", 10,
                        ParamValidators.gt(0))
    maxDepth = IntParam("maxDepth", "Depth per tree.", 4,
                        ParamValidators.in_range(1, 12))
    maxBins = IntParam("maxBins", "Histogram bins per feature.", 32,
                       ParamValidators.in_range(2, 1024))
    minInstancesPerNode = IntParam(
        "minInstancesPerNode", "Minimum rows per split side.", 1,
        ParamValidators.gt(0))
    labelScale = IntParam("labelScale", "Fixed-point label grid "
                          "decimals.", 6, ParamValidators.in_range(0, 9))
    binStrategy = StringParam(
        "binStrategy", "uniform | quantile bin edges.", "uniform",
        ParamValidators.in_array(["uniform", "quantile"]))
    idCol = StringParam("idCol", "Integer id column driving the "
                        "deterministic bagging hash.", "id")
    subsamplePct = IntParam("subsamplePct", "Percent of rows each tree "
                            "trains on (LCG hash buckets of 100).", 70,
                            ParamValidators.in_range(1, 100))
    bagSalt = IntParam("bagSalt", "Base salt; tree t uses bagSalt + t.",
                       7)
    featureSubset = StringParam(
        "featureSubset", "all | sqrt features per tree.", "all",
        ParamValidators.in_array(["all", "sqrt"]))
    parallelism = IntParam(
        "parallelism", "Concurrent tree fits (driver threads submitting "
        "independent Spark jobs).  Trees are deterministic and "
        "independent — results are identical at any value.", 1,
        ParamValidators.gt(0))

    def fit(self, *inputs: DataFrame) -> "RandomForestRegressorModel":
        (df,) = inputs
        fcol = self.get_("featuresCol")
        first = df.select(F.col(fcol).cast("array<double>")
                          .alias("x")).filter(
            F.col("x").isNotNull()).first()
        if first is None:
            raise ValueError("RandomForestRegressor: no training rows")
        dim = len(first["x"])
        pct = int(self.get_("subsamplePct"))
        salt0 = int(self.get_("bagSalt"))
        base_tree = dict(
            maxDepth=int(self.get_("maxDepth")),
            maxBins=int(self.get_("maxBins")),
            minInstancesPerNode=int(self.get_("minInstancesPerNode")),
            labelScale=int(self.get_("labelScale")),
            binStrategy=self.get_("binStrategy"))
        def fit_tree(t: int) -> dict:
            sub = df.filter(_keep_pct(self.get_("idCol"), salt0 + t, pct))
            if self.get_("featureSubset") == "sqrt":
                k = max(1, int(dim ** 0.5))
                # deterministic per-tree feature draw: order features by
                # an LCG of (tree, index), take the first k (sorted)
                ranked = sorted(
                    range(dim),
                    key=lambda i: ((i * _MULT + salt0 + 31 * t) % _M, i))
                chosen = sorted(ranked[:k])
            else:
                chosen = list(range(dim))
            x = F.col(self.get_("featuresCol")).cast("array<double>")
            proj = sub.select(
                F.array(*[x[i] for i in chosen]).alias("__xf__"),
                F.col(self.get_("labelCol")).alias("__yf__"))
            tm = DecisionTreeRegressor(featuresCol="__xf__",
                                       labelCol="__yf__",
                                       **base_tree).fit(proj)
            nodes = tm.model_data["nodes"]
            for info in nodes.values():  # remap to original indices
                if "feat" in info:
                    info["feat"] = chosen[info["feat"]]
            return nodes

        n_trees = int(self.get_("numTrees"))
        par = int(self.get_("parallelism"))
        if par <= 1:
            trees = [fit_tree(t) for t in range(n_trees)]
        else:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=par) as pool:
                trees = list(pool.map(fit_tree, range(n_trees)))
        model = RandomForestRegressorModel()
        model.set_(featuresCol=fcol,
                   predictionCol=self.get_("predictionCol"))
        model.model_data = {"trees": trees, "dim": dim}
        return model


class RandomForestRegressorModel(Model, HasFeaturesCol,
                                 HasPredictionCol):
    def _transform(self, df: DataFrame) -> DataFrame:
        x = F.col(self.get_("featuresCol")).cast("array<double>")
        trees = self.model_data["trees"]
        total = F.lit(0.0)
        for nodes in trees:
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

            total = total + expr(0)
        return df.withColumn(self.get_("predictionCol"),
                             total / len(trees))

    def transform_local(self, pdf):
        out = pdf.copy()
        maps = [{int(k): v for k, v in nodes.items()}
                for nodes in self.model_data["trees"]]

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

        out[self.get_("predictionCol")] = [
            sum(walk(nm, v) for nm in maps) / len(maps)
            for v in pdf[self.get_("featuresCol")]]
        return out

    def feature_importances(self) -> list[float]:
        """Gain-based importances over the whole forest (zeros for a
        pre-gain artifact)."""
        from .tree import ensemble_importances
        dim = int(self.model_data.get(
            "dim", 1 + max((int(v["feat"])
                            for nodes in self.model_data["trees"]
                            for v in nodes.values() if "feat" in v),
                           default=-1)))
        return ensemble_importances(self.model_data["trees"], dim)
