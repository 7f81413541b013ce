"""HashingTF + FeatureHasher — hashing-trick features.

Reference: feature/hashingtf/HashingTF.java:58 (term array → sparse count
vector, ``binary`` option) and feature/featurehasher/FeatureHasher.java:68
(categorical ``name=value`` → 1.0, numeric ``name`` → value, collisions
accumulate; MurmurHash3).

Spark-first: term hashing uses ``F.hash`` (Spark's JVM MurmurHash3 x86_32,
seed 42 — same family the reference uses) and the whole transform is
higher-order expressions, no Python.  ``hashAlgorithm='poly'`` swaps in a
deterministic polynomial rolling hash expressible in any SQL engine, which
the oracle queries use for cross-engine verification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..api import Transformer
from ..param import (BoolParam, HasCategoricalCols, HasInputCol, HasInputCols,
                     HasNumFeatures, HasOutputCol, ParamValidators, StringParam)

POLY_MOD = 2147483647  # 2^31-1, keeps the fold in int64 range


def _poly_hash(col: Column) -> Column:
    """h = fold(h*31 + ascii(char)) mod (2^31-1), left-to-right."""
    ords = F.transform(F.sequence(F.lit(1), F.length(col)),
                       lambda i: F.ascii(F.substr(col, i, F.lit(1))))
    return F.aggregate(ords, F.lit(0).cast("long"),
                       lambda acc, o: (acc * 31 + o) % POLY_MOD)


def term_index(term: Column, num_features: int, algo: str) -> Column:
    if algo == "poly":
        h = _poly_hash(term)
    else:
        h = F.hash(term).cast("long")
    return F.pmod(h, F.lit(num_features)).cast("int")


class HashingTF(Transformer, HasInputCol, HasOutputCol, HasNumFeatures):
    binary = BoolParam("binary", "Output 1.0 instead of term counts.", False)
    hashAlgorithm = StringParam("hashAlgorithm", "native (murmur3) or poly.", "native",
                                ParamValidators.in_array(["native", "poly"]))

    def _transform(self, df: DataFrame) -> DataFrame:
        # One Arrow UDF does hash + count with a per-batch memo of distinct
        # terms — O(n) per row.  Hashing in Python rather than a JVM
        # expression: the Python murmur3 is verified bit-exact against
        # F.hash, and a higher-order lambda can't be nested inside a Python
        # UDF argument (Catalyst INTERNAL_ERROR after CollapseProject).
        from pyspark.sql.functions import pandas_udf
        from ..common.hashing import poly_hash31, spark_murmur3_32
        n = self.get_("numFeatures")
        algo = self.get_("hashAlgorithm")
        binary = self.get_("binary")
        raw = poly_hash31 if algo == "poly" else spark_murmur3_32

        @pandas_udf("struct<size:int,indices:array<int>,values:array<double>>")
        def to_sparse(tokens):
            import pandas as pd
            from collections import Counter
            memo: dict = {}

            def bucket(t):
                i = memo.get(t)
                if i is None:
                    i = memo[t] = raw(t) % n
                return i

            out = {"size": [], "indices": [], "values": []}
            for toks in tokens:
                items = sorted(Counter(bucket(t) for t in toks).items())
                out["size"].append(n)
                out["indices"].append([i for i, _ in items])
                out["values"].append([1.0 if binary else float(c) for _, c in items])
            return pd.DataFrame(out)

        return df.withColumn(self.get_("outputCol"),
                             to_sparse(F.col(self.get_("inputCol"))))


class FeatureHasher(Transformer, HasInputCols, HasOutputCol, HasCategoricalCols,
                    HasNumFeatures):
    hashAlgorithm = StringParam("hashAlgorithm", "native (murmur3) or poly.", "native",
                                ParamValidators.in_array(["native", "poly"]))

    def _transform(self, df: DataFrame) -> DataFrame:
        # Arrow UDF over a struct of the input columns; numeric column
        # buckets (hash of the column NAME) are precomputed driver-side,
        # categorical ``name=value`` buckets are memoized per batch
        from pyspark.sql.functions import pandas_udf
        from ..common.hashing import poly_hash31, spark_murmur3_32
        n = self.get_("numFeatures")
        algo = self.get_("hashAlgorithm")
        cat = set(self.get_("categoricalCols") or [])
        schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        cols = list(self.get_("inputCols"))
        raw = poly_hash31 if algo == "poly" else spark_murmur3_32
        is_cat = {c: (c in cat or schema[c] in ("string", "boolean")) for c in cols}
        num_bucket = {c: raw(c) % n for c in cols if not is_cat[c]}

        @pandas_udf("struct<size:int,indices:array<int>,values:array<double>>")
        def to_sparse(block):
            import numpy as np
            import pandas as pd
            memo: dict = {}

            def bucket(term):
                i = memo.get(term)
                if i is None:
                    i = memo[term] = raw(term) % n
                return i

            m = len(block)
            c = len(cols)
            B = np.empty((m, c), dtype=np.int64)
            V = np.empty((m, c), dtype=np.float64)
            for j, col in enumerate(cols):
                s = block[col]
                if is_cat[col]:
                    # categorical arity is small → hash distinct values
                    # once, then one C-level dict map over the column
                    mapping = {v: bucket(f"{col}={v}") for v in s.unique()}
                    B[:, j] = s.map(mapping).to_numpy()
                    V[:, j] = 1.0
                else:
                    B[:, j] = num_bucket[col]
                    V[:, j] = s.to_numpy(dtype=np.float64)
            # row-sort buckets, fold duplicate buckets left→right (collisions
            # accumulate), then slice the surviving entries per row
            order = np.argsort(B, axis=1, kind="stable")
            B = np.take_along_axis(B, order, 1)
            V = np.take_along_axis(V, order, 1)
            keep = np.ones((m, c), dtype=bool)
            for j in range(c - 1):
                dup = B[:, j] == B[:, j + 1]
                V[dup, j + 1] += V[dup, j]
                keep[dup, j] = False
            out = {"size": np.full(m, n), "indices": [], "values": []}
            for r in range(m):
                k = keep[r]
                out["indices"].append(B[r, k].tolist())
                out["values"].append(V[r, k].tolist())
            return pd.DataFrame(out)

        block = F.struct(*[F.col(c).cast("string").alias(c) if is_cat[c]
                           else F.col(c).cast("double").alias(c) for c in cols])
        return df.withColumn(self.get_("outputCol"), to_sparse(block))
