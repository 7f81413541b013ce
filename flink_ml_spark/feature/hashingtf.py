"""HashingTF + FeatureHasher — hashing-trick features.

Reference: feature/hashingtf/HashingTF.java:58 (term array → sparse count
vector, ``binary`` option) and feature/featurehasher/FeatureHasher.java:68
(categorical ``name=value`` → 1.0, numeric ``name`` → value, collisions
accumulate; MurmurHash3).

Spark-first split of work: fixed-width hashing (FeatureHasher) runs
JVM-side in whole-stage codegen (murmur3 = ``F.hash``, seed 42 — the
family the reference uses); variable-length sparse assembly crosses Arrow
once and is fully numpy-vectorized (flat buffers + ListArrays, no per-row
Python).  ``hashAlgorithm='poly'`` swaps in a polynomial rolling hash
expressible in any SQL engine — the oracle queries' cross-engine path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..api import Transformer
from ..param import (BoolParam, HasCategoricalCols, HasInputCol, HasInputCols,
                     HasNumFeatures, HasOutputCol, ParamValidators, StringParam)

POLY_MOD = 2147483647  # 2^31-1, keeps the fold in int64 range

# poly-map pre-aggregation cap: categorical columns with more distinct
# values than this never reach the driver (they fall back to the lazy
# expression hash, identical outputs); module-level so tests can shrink it
MAX_MAP_DISTINCTS = 4096


def _poly_hash(col: Column) -> Column:
    """h = fold(h*31 + ascii(char)) mod (2^31-1), left-to-right.

    O(len) expression (split → per-char fold).  Interpreted HOFs — fine as
    the rarely-hit fallback of the oracle hash; the production algorithm is
    ``native`` (codegen'd murmur3 ``F.hash``)."""
    chars = F.slice(F.split(col, ""), 1, F.length(col))
    return F.aggregate(chars, F.lit(0).cast("long"),
                       lambda acc, ch: (acc * 31 + F.ascii(ch)) % POLY_MOD)


def _np_poly31(tokens) -> "np.ndarray":
    """Vectorized poly_hash31 (mod 2^31-1) over a 1-D string sequence:
    codepoint matrix fold, one numpy pass per character position."""
    import numpy as np
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    u = np.asarray(tokens, dtype="U")
    width = u.dtype.itemsize // 4
    if width == 0:
        return np.zeros(n, dtype=np.int64)
    C = u.view(np.uint32).reshape(n, width).astype(np.int64)
    h = np.zeros(n, dtype=np.int64)
    for j in range(width):
        c = C[:, j]
        h = np.where(c == 0, h, (h * 31 + c) % POLY_MOD)
    return h


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
        # One Arrow UDF, vectorized: flatten the batch's tokens, hash each
        # DISTINCT token once (np.unique inverse; the poly hash is a pure
        # numpy codepoint fold, murmur3 runs per distinct only — verified
        # bit-exact against F.hash), count (row, bucket) pairs with one
        # np.unique over composite keys, and build the per-row ListArrays
        # from flat buffers.  No per-row or per-token Python.
        from pyspark.sql.functions import pandas_udf
        from ..common.hashing import spark_murmur3_32
        n = self.get_("numFeatures")
        algo = self.get_("hashAlgorithm")
        binary = self.get_("binary")

        @pandas_udf("struct<size:int,indices:array<int>,values:array<double>>")
        def to_sparse(tokens):
            import numpy as np
            import pandas as pd
            import pyarrow as pa
            from flink_ml_spark.llmdata.dedup import flat_tokens
            flat, lens, _ = flat_tokens(tokens)
            m = len(lens)
            if len(flat):
                uniq, inv = np.unique(flat, return_inverse=True)
                if algo == "poly":
                    uh = _np_poly31(uniq)
                else:
                    uh = np.fromiter((spark_murmur3_32(t) for t in uniq),
                                     dtype=np.int64, count=len(uniq))
                buckets = np.mod(uh, n)[inv]
                row_of = np.repeat(np.arange(m, dtype=np.int64), lens)
                keys, counts = np.unique(row_of * n + buckets,
                                         return_counts=True)
                krow, kbkt = keys // n, keys % n
            else:
                krow = np.empty(0, dtype=np.int64)
                kbkt = counts = krow
            per_row = np.bincount(krow, minlength=m)
            offsets = np.zeros(m + 1, dtype=np.int32)
            np.cumsum(per_row, out=offsets[1:])
            vals = (np.ones(len(kbkt)) if binary
                    else counts.astype(np.float64))
            ind = pa.ListArray.from_arrays(pa.array(offsets),
                                           pa.array(kbkt.astype(np.int32)))
            val = pa.ListArray.from_arrays(pa.array(offsets), pa.array(vals))
            return pd.DataFrame({"size": np.full(m, n, dtype=np.int32),
                                 "indices": ind.to_pandas(),
                                 "values": val.to_pandas()})

        return df.withColumn(self.get_("outputCol"),
                             to_sparse(F.col(self.get_("inputCol"))))

    def transform_local(self, pdf):
        from ..common.hashing import poly_hash31, spark_murmur3_32
        n = self.get_("numFeatures")
        algo = self.get_("hashAlgorithm")
        binary = self.get_("binary")
        hash_fn = poly_hash31 if algo == "poly" else spark_murmur3_32
        rows = []
        for toks in pdf[self.get_("inputCol")]:
            counts: dict[int, float] = {}
            for t in toks or []:
                b = hash_fn(t) % n
                counts[b] = counts.get(b, 0.0) + 1.0
            items = sorted(counts.items())
            rows.append({"size": n,
                         "indices": [i for i, _ in items],
                         "values": [1.0 if binary else c for _, c in items]})
        out = pdf.copy()
        out[self.get_("outputCol")] = rows
        return out


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
            # distinct-value map literals are driver state → cap them.
            # ONE corpus scan for all categorical columns (the r3 perf
            # audit's ask), but through a spillable distinct instead of a
            # global collect_set: a collect_set buffer accumulates the
            # full distinct set in ONE final-agg task before any slice()
            # can bound it, so a high-cardinality column (unique-per-row
            # id declared categorical) would OOM the executor.  Here the
            # (col, value) distinct is a hash aggregation (partial
            # map-side dedup, spills under pressure), checkpointed once;
            # the per-column count and the ≤CAP collect are then tiny
            # jobs over that relation — over-cap columns never reach the
            # driver and fall back to the lazy expression hash, same
            # values.
            pairs = df.select(F.explode(F.array(*[
                F.struct(F.lit(c).alias("c"),
                         F.col(c).cast("string").alias("v"))
                for c in cat_cols])).alias("p")).select("p.c", "p.v")
            dist = (pairs.filter(F.col("v").isNotNull()).distinct()
                    .localCheckpoint(eager=True))
            ok_cols = [r["c"] for r in dist.groupBy("c").count()
                       .filter(F.col("count") <= MAX_MAP_DISTINCTS)
                       .collect()]
            if ok_cols:
                vals: dict[str, list[str]] = {c: [] for c in ok_cols}
                for r in dist.filter(F.col("c").isin(ok_cols)).collect():
                    vals[r["c"]].append(r["v"])
                for c in ok_cols:
                    poly_maps[c] = F.create_map(
                        *[x for v in vals[c]
                          for x in (F.lit(v),
                                    F.lit(poly_hash31(f"{c}={v}") % n))])

        def bucket_value(c: str) -> tuple[Column, Column]:
            if is_cat[c]:
                term = F.concat(F.lit(c + "="), F.col(c).cast("string"))
                if algo == "poly" and c in poly_maps:
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
