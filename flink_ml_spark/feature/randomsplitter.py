"""RandomSplitter — split a table into N tables by weights, seeded.

Reference: feature/randomsplitter/RandomSplitter.java:47.
Spark-first: ``DataFrame.randomSplit`` (per-partition Bernoulli split, no
shuffle, scales linearly).

Beyond the reference, ``splitStrategy='hash'`` derives the split from a
multiplicative hash of a key column instead of an RNG: the assignment is a
pure row function — stable under repartitioning / retries / engines (a
seeded Bernoulli split is partition-order dependent), which is what a
100 TB train/eval split actually wants, and what lets the driver's DuckDB
oracle verify the split exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..api import AlgoOperator
from ..param import (FloatArrayParam, HasSeed, ParamValidators, StringParam)

HASH_MULT = 2654435761  # Knuth multiplicative constant
HASH_MOD = 1 << 31


class RandomSplitter(AlgoOperator, HasSeed):
    weights = FloatArrayParam("weights", "Split weights.", [1.0, 1.0],
                              ParamValidators.non_empty_array())
    splitStrategy = StringParam(
        "splitStrategy", "random (seeded Bernoulli, reference semantics) or "
        "hash (deterministic row-function split on hashCol).", "random",
        ParamValidators.in_array(["random", "hash"]))
    hashCol = StringParam(
        "hashCol", "Long column the hash split keys on.", None)

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        seed = self.get_("seed")
        weights = list(self.get_("weights"))
        if self.get_("splitStrategy") == "random":
            return df.randomSplit(weights, seed=seed)
        key = F.col(self.get_("hashCol")).cast("long")
        u = F.pmod(key * F.lit(HASH_MULT) + F.lit(int(seed or 0)),
                   F.lit(HASH_MOD)) / float(HASH_MOD)
        total = sum(weights)
        bounds, acc = [], 0.0
        for w in weights[:-1]:
            acc += w / total
            bounds.append(acc)
        out = []
        lo = None
        for i in range(len(weights)):
            hi = bounds[i] if i < len(bounds) else None
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (u >= F.lit(lo))
            if hi is not None:
                cond = cond & (u < F.lit(hi))
            out.append(df.where(cond))
            lo = hi
        return out
