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
    """Vector → sorted array of non-zero indices (the Jaccard set).

    Guarded for zero-length dense vectors: sequence(0, -1) would yield
    [0, -1] and element_at(col, 0) raises, so empty input short-circuits
    to an empty int array."""
    if dtype.startswith("struct"):
        return col["indices"]
    nonzero = F.filter(F.sequence(F.lit(0), F.size(col) - 1),
                       lambda i: F.element_at(col, i + 1) != 0.0)
    return F.when(F.size(col) > 0, nonzero).otherwise(
        F.array().cast("array<int>"))


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

    def _sig_fn(self):
        """Closure-free signature function (plain captured values — the
        executor pickle must not drag the Stage/Param machinery along)."""
        A = np.asarray(self.model_data["coeffA"], dtype=np.int64)[None, :]
        B = np.asarray(self.model_data["coeffB"], dtype=np.int64)[None, :]
        per = self.get_("numHashFunctionsPerTable")
        nt = self.get_("numHashTables")

        def sig_py(idx: np.ndarray) -> list[str]:
            if len(idx) == 0:
                # reference leaves minv = HASH_PRIME when no index is active
                # (MinHashLSHModelData.java:135-137)
                mins = np.full(A.shape[1], MINHASH_PRIME, dtype=np.int64)
            else:
                mins = (((idx.astype(np.int64) + 1)[:, None] * A + B)
                        % MINHASH_PRIME).min(axis=0)
            return ["_".join(str(int(v)) for v in mins[t * per:(t + 1) * per])
                    for t in range(nt)]
        return sig_py

    def _signature_py(self, idx: np.ndarray) -> list[str]:
        return self._sig_fn()(idx)

    def _signature(self, vec: Column, dtype: str) -> Column:
        """array of per-table signature strings (table = joined min-hashes).
        One Arrow UDF applies ALL hash functions in a single (set × hashes)
        numpy pass — a per-hash array_min(transform(...)) expression stack
        re-evaluates the (possibly expensive) input expression per hash
        function, numHashes× the work."""
        from pyspark.sql.functions import pandas_udf
        is_struct = dtype.startswith("struct")
        sig_py = self._sig_fn()

        @pandas_udf("array<string>")
        def sigs(col):
            import pandas as pd
            out = []
            for v in col:
                arr = np.asarray(v if v is not None else [])
                idx = arr if is_struct else np.nonzero(arr)[0]
                out.append(sig_py(idx))
            return pd.Series(out)

        # struct input: pass only the indices field (plain field access —
        # a higher-order-lambda argument breaks ArrowEvalPython)
        return sigs(vec["indices"] if is_struct else vec)

    def _transform(self, df: DataFrame) -> DataFrame:
        dtype = self._dtype(df)
        return df.withColumn(
            self.get_("outputCol"),
            self._signature(F.col(self.get_("inputCol")), dtype))

    def approx_nearest_neighbors(self, dataset: DataFrame, key,
                                 k: int = 5, id_col: str = "id",
                                 dist_col: str = "distCol") -> DataFrame:
        """Top-k by exact Jaccard among rows sharing ≥1 table signature
        with ``key`` (a list of active indices)."""
        key_arr = F.array(*[F.lit(int(i)) for i in sorted(key)])
        dtype = self._dtype(dataset)
        idx = _active_indices(F.col(self.get_("inputCol")), dtype)
        with_sig = dataset.withColumn(
            "__sig__",
            self._signature(F.col(self.get_("inputCol")), dtype)) \
            .withColumn("__idx__", idx)
        # key signature computed driver-side (fixed-size model state)
        key_sig = F.array(*[F.lit(s) for s in
                            self._signature_py(np.array(sorted(key)))])
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
        LSH candidates (explode signatures → equi-join → dedup → filter).

        The band join carries ids ONLY — the (large) index sets are joined
        back by id after the pair dedup, so signature explosion never
        multiplies the set payload (reference shape, LSHModel.java:211-276:
        dedup pairs first, compute distance after)."""
        dtype = self._dtype(a)

        def prep(df: DataFrame, side: str) -> DataFrame:
            return (df.withColumn("__sig__",
                                  self._signature(F.col(self.get_("inputCol")),
                                                  dtype))
                    .select(F.col(id_col).alias(f"id_{side}"),
                            F.posexplode("__sig__").alias("table", f"sig_{side}")))

        def idx_of(df: DataFrame, side: str) -> DataFrame:
            idx = _active_indices(F.col(self.get_("inputCol")), dtype)
            return df.select(F.col(id_col).alias(f"id_{side}"),
                             idx.alias(f"idx_{side}"))

        pa, pb = prep(a, "a"), prep(b, "b")
        pairs = (pa.join(pb, (pa["table"] == pb["table"])
                         & (pa["sig_a"] == pb["sig_b"]))
                 .select("id_a", "id_b")
                 .dropDuplicates(["id_a", "id_b"]))
        pairs = (pairs.join(idx_of(a, "a"), "id_a")
                 .join(idx_of(b, "b"), "id_b"))
        return (pairs.withColumn(dist_col,
                                 jaccard_distance(F.col("idx_a"), F.col("idx_b")))
                .filter(F.col(dist_col) <= threshold)
                .select("id_a", "id_b", dist_col))
