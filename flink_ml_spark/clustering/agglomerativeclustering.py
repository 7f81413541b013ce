"""AgglomerativeClustering — hierarchical bottom-up clustering, local to
each window/group.

Reference: clustering/agglomerativeclustering/AgglomerativeClustering.java:82
— clustering is inherently local to a window/mini-batch (:76-82); linkages
ward / complete / single / average; stop at numClusters or
distanceThreshold; outputs (assignments, merge-tree table).

Spark-first: ``applyInPandas`` per group (GlobalWindows → one group), with
a pure-numpy Lance-Williams agglomeration (no scipy in the image; the
update formulas are the standard public ones, equivalent to
scipy.cluster.hierarchy.linkage).  O(n³) worst case — appropriate because
the operator is by definition windowed-local (the reference buffers each
window in state and clusters it in one task too).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..api import AlgoOperator
from ..param import (FloatParam, HasDistanceMeasure, HasFeaturesCol,
                     HasPredictionCol, IntParam, ParamValidators, StringParam)

LINKAGES = ["ward", "complete", "single", "average"]


def agglomerate(x: np.ndarray, linkage: str, n_clusters: int | None,
                distance_threshold: float | None):
    """Returns (labels, merges) where merges rows are
    (cluster_a, cluster_b, distance, new_size) in scipy convention
    (original points 0..n-1, merged clusters n, n+1, ...)."""
    n = len(x)
    # pairwise euclidean distances; ward operates on squared distances
    diff = x[:, None, :] - x[None, :, :]
    d = np.sqrt((diff ** 2).sum(axis=2))
    if linkage == "ward":
        work = d ** 2  # Lance-Williams in squared space
    else:
        work = d.copy()
    np.fill_diagonal(work, np.inf)
    active = {i: (i, 1) for i in range(n)}  # slot -> (cluster id, size)
    labels_of = {i: [i] for i in range(n)}  # slot -> member rows
    merges = []
    next_id = n
    stop_k = n_clusters if n_clusters is not None else 1
    while len(active) > stop_k:
        slots = sorted(active)
        sub = work[np.ix_(slots, slots)]
        flat = np.argmin(sub)
        ai, bi = divmod(flat, len(slots))
        if ai > bi:
            ai, bi = bi, ai
        sa, sb = slots[ai], slots[bi]
        dist = work[sa, sb]
        real_dist = np.sqrt(dist) if linkage == "ward" else dist
        if distance_threshold is not None and real_dist > distance_threshold:
            break
        ida, na = active[sa]
        idb, nb = active[sb]
        merges.append((min(ida, idb), max(ida, idb), float(real_dist), na + nb))
        # Lance-Williams update of distances from merged (sa) to others
        for sc in slots:
            if sc in (sa, sb):
                continue
            _, nc = active[sc]
            dac, dbc, dab = work[sa, sc], work[sb, sc], dist
            if linkage == "single":
                nd = min(dac, dbc)
            elif linkage == "complete":
                nd = max(dac, dbc)
            elif linkage == "average":
                nd = (na * dac + nb * dbc) / (na + nb)
            else:  # ward (squared space)
                tot = na + nb + nc
                nd = ((na + nc) * dac + (nb + nc) * dbc - nc * dab) / tot
            work[sa, sc] = work[sc, sa] = nd
        active[sa] = (next_id, na + nb)
        labels_of[sa] = labels_of[sa] + labels_of[sb]
        del active[sb]
        labels_of.pop(sb)
        work[sb, :] = np.inf
        work[:, sb] = np.inf
        next_id += 1
    labels = np.empty(n, dtype=np.int64)
    # cluster label = order of first appearance (deterministic)
    for lab, slot in enumerate(sorted(active, key=lambda s: min(labels_of[s]))):
        labels[labels_of[slot]] = lab
    return labels, merges


class AgglomerativeClustering(AlgoOperator, HasFeaturesCol, HasPredictionCol,
                              HasDistanceMeasure):
    numClusters = IntParam("numClusters", "Target cluster count.", 2)
    distanceThreshold = FloatParam("distanceThreshold",
                                   "Stop merging above this distance.", None)
    linkage = StringParam("linkage", "ward | complete | single | average.", "ward",
                          ParamValidators.in_array(LINKAGES))
    windowCol = StringParam("windowCol", "Optional grouping column (None = whole input).", None)
    computeFullTree = IntParam("computeFullTree", "1 = also return merge tree.", 1)

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        fcol = self.get_("featuresCol")
        pcol = self.get_("predictionCol")
        wcol = self.get_("windowCol")
        linkage = self.get_("linkage")
        k = self.get_("numClusters")
        thr = self.get_("distanceThreshold")
        if thr is not None:
            k = None  # threshold mode (reference: exactly one of the two)

        group_col = wcol or "__g__"
        src = df if wcol else df.withColumn("__g__", F.lit(0))
        out_schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in src.schema.fields
        ) + f", {pcol} long"

        def cluster(pdf: pd.DataFrame) -> pd.DataFrame:
            x = np.stack(pdf[fcol].to_numpy())
            labels, _ = agglomerate(x, linkage, k, thr)
            return pdf.assign(**{pcol: labels})

        assigned = src.groupBy(group_col).applyInPandas(cluster, out_schema)
        if not wcol:
            assigned = assigned.drop("__g__")

        tree_schema = f"{group_col} long, cluster_a long, cluster_b long, distance double, size long"

        def tree(pdf: pd.DataFrame) -> pd.DataFrame:
            x = np.stack(pdf[fcol].to_numpy())
            _, merges = agglomerate(x, linkage, k, thr)
            g = pdf[group_col].iloc[0] if len(pdf) else 0
            return pd.DataFrame(
                [(g, a, b, dd, s) for a, b, dd, s in merges],
                columns=[group_col, "cluster_a", "cluster_b", "distance", "size"])

        merge_tree = src.groupBy(group_col).applyInPandas(tree, tree_schema)
        return [assigned, merge_tree]
