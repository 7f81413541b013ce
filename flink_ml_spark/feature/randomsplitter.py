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

A STRING ``hashCol`` makes this a LEAKAGE-SAFE GROUP SPLIT: the key is
first reduced with the cross-engine polynomial hash (dedup.poly_token_hash),
so every row sharing the key (a domain, a normalized URL, a dedup-cluster
id) lands in the SAME split — near-duplicate documents from one site can
never straddle train/eval, the standard contamination hazard of row-level
splitting (cf. the deduplicate-then-split discipline in Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better").  Zero
shuffle either way: the assignment stays a pure row function.
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
        "hashCol", "Column the hash split keys on: long columns are used "
        "directly; a string column (group key — domain/url/cluster id) is "
        "poly-hashed first so the whole group shares one split.", None)

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        seed = self.get_("seed")
        weights = list(self.get_("weights"))
        if self.get_("splitStrategy") == "random":
            return df.randomSplit(weights, seed=seed)
        hc = self.get_("hashCol")
        if df.schema[hc].dataType.simpleString() == "string":
            from ..llmdata.dedup import poly_token_hash
            key = poly_token_hash(F.coalesce(F.col(hc), F.lit("")))
        else:
            key = F.col(hc).cast("long")
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
