"""MinHashLSH / MinHashLSHModel — Jaccard LSH with the reference's API.

Reference: feature/lsh/MinHashLSH.java:37, LSH.java:60, LSHModel.java:71,
MinHashLSHModelData.java:46.  A vector is treated as a SET of its active
(non-zero) indices; hash function h_{a,b}(set) = min over active index j
of ((1+j)·a + b) mod P, P = 2038074743 (the reference's prime).  The model
offers:

- ``transform``: append array of numHashTables × numHashFunctionsPerTable
  hash values;
- ``approx_nearest_neighbors(dataset, key, k)``: candidate filter = shares
  ≥1 hash-table signature with the key, then exact Jaccard-distance top-k
  (LSHModel.java:142-178);
- ``approx_similarity_join(A, B, threshold)``: explode table signatures →
  equi-join on (table, signature) → dedup pairs → exact distance filter
  (LSHModel.java:211-276 — same plan shape, Spark does the shuffle).

The (a,b) coefficients come from a seeded counter-based generator (no RNG
library), so oracles can replay them.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F

from ..api import Estimator, Model
from ..llmdata.dedup import MINHASH_PRIME, _hash_family
from ..param import (HasInputCol, HasOutputCol, HasSeed, IntParam,
                     ParamValidators)


def _active_indices(col: Column, dtype: str) -> Column:
    """Vector → sorted array of non-zero indices (the Jaccard set)."""
    if dtype.startswith("struct"):
        return col["indices"]
    return F.filter(F.sequence(F.lit(0), F.size(col) - 1),
                    lambda i: F.element_at(col, i + 1) != 0.0)


def jaccard_distance(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.lit(1.0) - F.when(union > 0, inter / union).otherwise(0.0)


class MinHashLSH(Estimator, HasInputCol, HasOutputCol, HasSeed):
    numHashTables = IntParam("numHashTables", "Number of hash tables.", 1,
                             ParamValidators.gt(0))
    numHashFunctionsPerTable = IntParam("numHashFunctionsPerTable",
                                        "Hash functions per table.", 1,
                                        ParamValidators.gt(0))

    def fit(self, *inputs: DataFrame) -> "MinHashLSHModel":
        n = self.get_("numHashTables") * self.get_("numHashFunctionsPerTable")
        fam = _hash_family(n, self.get_("seed") or 0)
        model = MinHashLSHModel()
        model.set_(inputCol=self.get_("inputCol"), outputCol=self.get_("outputCol"))
        model.set(MinHashLSHModel.numHashTables, self.get_("numHashTables"))
        model.set(MinHashLSHModel.numHashFunctionsPerTable,
                  self.get_("numHashFunctionsPerTable"))
        model.model_data = {"coeffA": [a for a, _ in fam],
                            "coeffB": [b for _, b in fam]}
        return model


class MinHashLSHModel(Model, HasInputCol, HasOutputCol):
    numHashTables = IntParam("numHashTables", "Number of hash tables.", 1)
    numHashFunctionsPerTable = IntParam("numHashFunctionsPerTable",
                                        "Hash functions per table.", 1)

    def _dtype(self, df: DataFrame) -> str:
        return dict((f.name, f.dataType.simpleString())
                    for f in df.schema.fields)[self.get_("inputCol")]

    def _signature(self, idx: Column) -> Column:
        """array of per-table signature strings (table = joined min-hashes)."""
        a_list = self.model_data["coeffA"]
        b_list = self.model_data["coeffB"]
        per = self.get_("numHashFunctionsPerTable")
        tables = []

        def mh(a: int, b: int) -> Column:
            return F.array_min(F.transform(
                idx, lambda j: ((j + 1).cast("long") * a + b) % MINHASH_PRIME))
        all_h = [mh(a, b) for a, b in zip(a_list, b_list)]
        for t in range(self.get_("numHashTables")):
            parts = all_h[t * per: (t + 1) * per]
            tables.append(F.concat_ws("_", *[p.cast("string") for p in parts]))
        return F.array(*tables)

    def _transform(self, df: DataFrame) -> DataFrame:
        idx = _active_indices(F.col(self.get_("inputCol")), self._dtype(df))
        return df.withColumn(self.get_("outputCol"), self._signature(idx))

    def approx_nearest_neighbors(self, dataset: DataFrame, key,
                                 k: int = 5, id_col: str = "id",
                                 dist_col: str = "distCol") -> DataFrame:
        """Top-k by exact Jaccard among rows sharing ≥1 table signature
        with ``key`` (a list of active indices)."""
        key_arr = F.array(*[F.lit(int(i)) for i in sorted(key)])
        dtype = self._dtype(dataset)
        idx = _active_indices(F.col(self.get_("inputCol")), dtype)
        with_sig = dataset.withColumn("__sig__", self._signature(idx)) \
                          .withColumn("__idx__", idx)
        key_sig = self._signature(key_arr.cast("array<int>"))
        cand = with_sig.filter(
            F.size(F.array_intersect(F.col("__sig__"), key_sig)) > 0)
        scored = cand.withColumn(
            dist_col, jaccard_distance(F.col("__idx__"), key_arr.cast("array<int>")))
        return (scored.orderBy(F.asc(dist_col), F.asc(id_col)).limit(k)
                .drop("__sig__", "__idx__"))

    def approx_similarity_join(self, a: DataFrame, b: DataFrame,
                               threshold: float, id_col: str = "id",
                               dist_col: str = "distCol") -> DataFrame:
        """Pairs (id_a, id_b, dist) with Jaccard distance ≤ threshold among
        LSH candidates (explode signatures → equi-join → dedup → filter)."""
        dtype = self._dtype(a)

        def prep(df: DataFrame, side: str) -> DataFrame:
            idx = _active_indices(F.col(self.get_("inputCol")), dtype)
            return (df.withColumn("__idx__", idx)
                    .withColumn("__sig__", self._signature(idx))
                    .select(F.col(id_col).alias(f"id_{side}"),
                            F.col("__idx__").alias(f"idx_{side}"),
                            F.posexplode("__sig__").alias("table", f"sig_{side}")))

        pa, pb = prep(a, "a"), prep(b, "b")
        pairs = (pa.join(pb, (pa["table"] == pb["table"])
                         & (pa["sig_a"] == pb["sig_b"]))
                 .select("id_a", "id_b", "idx_a", "idx_b")
                 .dropDuplicates(["id_a", "id_b"]))
        return (pairs.withColumn(dist_col,
                                 jaccard_distance(F.col("idx_a"), F.col("idx_b")))
                .filter(F.col(dist_col) <= threshold)
                .select("id_a", "id_b", dist_col))
