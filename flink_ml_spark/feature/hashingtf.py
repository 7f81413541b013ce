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
        n = self.get_("numFeatures")
        algo = self.get_("hashAlgorithm")
        toks = F.col(self.get_("inputCol"))
        idx = F.array_sort(F.transform(toks, lambda t: term_index(t, n, algo)))
        uniq = F.array_distinct(idx)
        if self.get_("binary"):
            vals = F.transform(uniq, lambda i: F.lit(1.0))
        else:
            vals = F.transform(
                uniq, lambda i: F.size(F.filter(idx, lambda x: x == i)).cast("double"))
        out = F.struct(F.lit(n).alias("size"), uniq.alias("indices"), vals.alias("values"))
        return df.withColumn(self.get_("outputCol"), out)


class FeatureHasher(Transformer, HasInputCols, HasOutputCol, HasCategoricalCols,
                    HasNumFeatures):
    hashAlgorithm = StringParam("hashAlgorithm", "native (murmur3) or poly.", "native",
                                ParamValidators.in_array(["native", "poly"]))

    def _transform(self, df: DataFrame) -> DataFrame:
        n = self.get_("numFeatures")
        algo = self.get_("hashAlgorithm")
        cat = set(self.get_("categoricalCols") or [])
        schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        entries = []
        for c in self.get_("inputCols"):
            is_cat = c in cat or schema[c] in ("string", "boolean")
            if is_cat:
                term = F.concat(F.lit(c + "="), F.col(c).cast("string"))
                entries.append(F.struct(term_index(term, n, algo).alias("i"),
                                        F.lit(1.0).alias("v")))
            else:
                entries.append(F.struct(term_index(F.lit(c), n, algo).alias("i"),
                                        F.col(c).cast("double").alias("v")))
        arr = F.array(*entries)
        idx = F.array_sort(F.array_distinct(F.transform(arr, lambda e: e["i"])))
        vals = F.transform(
            idx,
            lambda i: F.aggregate(
                F.filter(arr, lambda e: e["i"] == i),
                F.lit(0.0), lambda acc, e: acc + e["v"]))
        out = F.struct(F.lit(n).alias("size"), idx.alias("indices"), vals.alias("values"))
        return df.withColumn(self.get_("outputCol"), out)
