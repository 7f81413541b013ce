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
    """h = fold(h*31 + ascii(char)) mod (2^31-1), left-to-right.

    O(len) expression (split → per-char fold).  Interpreted HOFs — fine as
    the rarely-hit fallback of the oracle hash; the production algorithm is
    ``native`` (codegen'd murmur3 ``F.hash``)."""
    chars = F.slice(F.split(col, ""), 1, F.length(col))
    return F.aggregate(chars, F.lit(0).cast("long"),
                       lambda acc, ch: (acc * 31 + F.ascii(ch)) % POLY_MOD)


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
        # Hybrid plan: the per-row HASHING runs JVM-side inside whole-stage
        # codegen (murmur3 = native F.hash; poly = map literal over the
        # column's distinct values, one tiny agg job per categorical col,
        # with a lazy expression-hash fallback for values unseen at plan
        # time), producing a fixed-width (bucket, value) column block.  One
        # Arrow UDF then assembles the sparse vector fully vectorized —
        # numpy row-sort + collision fold, pyarrow ListArray built from
        # flat arrays + offsets, no per-row Python.  Null inputs are
        # skipped (reference FeatureHasher.java:122,128); bucket -1 marks
        # a skipped entry across the Arrow boundary.
        from pyspark.sql.functions import pandas_udf
        from ..common.hashing import poly_hash31, spark_murmur3_32
        n = self.get_("numFeatures")
        algo = self.get_("hashAlgorithm")
        cat = set(self.get_("categoricalCols") or [])
        schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        cols = list(self.get_("inputCols"))
        raw = poly_hash31 if algo == "poly" else spark_murmur3_32
        is_cat = {c: (c in cat or schema[c] in ("string", "boolean")) for c in cols}

        poly_maps: dict[str, Column] = {}
        cat_cols = [c for c in cols if is_cat[c]]
        if algo == "poly" and cat_cols:
            # one scan for all columns' distinct values (collect_set has
            # map-side partial aggregation — only distincts shuffle)
            row = df.agg(*[F.collect_set(F.col(c).cast("string")).alias(c)
                           for c in cat_cols]).first()
            for c in cat_cols:
                poly_maps[c] = F.create_map(
                    *[x for v in row[c]
                      for x in (F.lit(v), F.lit(poly_hash31(f"{c}={v}") % n))])

        def bucket_value(c: str) -> tuple[Column, Column]:
            if is_cat[c]:
                term = F.concat(F.lit(c + "="), F.col(c).cast("string"))
                if algo == "poly":
                    idx = F.coalesce(poly_maps[c][F.col(c).cast("string")],
                                     term_index(term, n, algo))
                else:
                    idx = term_index(term, n, algo)
                val = F.lit(1.0)
            else:
                idx = F.lit(raw(c) % n)
                val = F.col(c).cast("double")
            skip = F.col(c).isNull()
            return (F.when(skip, F.lit(-1)).otherwise(idx),
                    F.when(skip, F.lit(0.0)).otherwise(val))

        c_num = len(cols)

        @pandas_udf("struct<size:int,indices:array<int>,values:array<double>>")
        def assemble(block):
            import numpy as np
            import pandas as pd
            import pyarrow as pa
            m = len(block)
            B = np.column_stack([block[f"b{j}"].to_numpy(dtype=np.int64)
                                 for j in range(c_num)])
            V = np.column_stack([block[f"v{j}"].to_numpy(dtype=np.float64)
                                 for j in range(c_num)])
            order = np.argsort(B, axis=1, kind="stable")
            B = np.take_along_axis(B, order, 1)
            V = np.take_along_axis(V, order, 1)
            keep = np.ones((m, c_num), dtype=bool)
            for j in range(c_num - 1):
                dup = B[:, j] == B[:, j + 1]
                V[dup, j + 1] += V[dup, j]
                keep[dup, j] = False
            keep &= B >= 0  # null inputs were marked -1 → skipped
            counts = keep.sum(axis=1)
            offsets = np.zeros(m + 1, dtype=np.int32)
            np.cumsum(counts, out=offsets[1:])
            ind = pa.ListArray.from_arrays(pa.array(offsets),
                                           pa.array(B[keep].astype(np.int32)))
            val = pa.ListArray.from_arrays(pa.array(offsets), pa.array(V[keep]))
            return pd.DataFrame({
                "size": np.full(m, n, dtype=np.int32),
                "indices": ind.to_pandas(),
                "values": val.to_pandas()})

        parts = []
        for j, c in enumerate(cols):
            b, v = bucket_value(c)
            parts += [b.alias(f"b{j}"), v.alias(f"v{j}")]
        return df.withColumn(self.get_("outputCol"), assemble(F.struct(*parts)))
