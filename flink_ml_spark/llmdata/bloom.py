"""Bloom-filter membership prefilter for incremental pipelines.

At 100 TB the incremental-dedup batch join touches the (corpus-sized)
signature store for EVERY new document, even though in steady state most
documents are genuinely new.  A Bloom filter over the store's digests is
the classic fix (Bloom 1970; used by every LSM engine): ship a compact
bitmap to the executors, let definitely-new rows skip the store join
entirely, and resolve only the ``maybe`` rows exactly.  No false
negatives, so composing ``prefilter → exact join on the maybe subset``
returns byte-identical results to the plain join — the filter is purely a
physical optimization, which is what makes it oracle-checkable.

Plan shape: fit = ONE mapInPandas pass over JVM-computed xxhash64 pairs
(per-partition bitmap partials, OR-merged on the driver — the allReduce
shape); transform = zero-shuffle pandas UDF testing k bits against the
broadcast bitmap.  Sizing: m = -n·ln(p)/ln²2 bits — 1 M digests at 1 %
FP ≈ 1.2 MB; a 1 B-digest store ≈ 1.2 GB, at which point shard the
filter by digest prefix (fit one per shard with a groupBy) rather than
growing a single bitmap past executor broadcast comfort.
"""

from __future__ import annotations

import base64
import math

import numpy as np

from pyspark.sql import DataFrame, functions as F

from ..api import Estimator, Model
from ..param import (FloatParam, HasInputCol, HasOutputCol, IntParam,
                     ParamValidators, StringParam)

# second xxhash64 salt column for double hashing (Kirsch & Mitzenmacher
# 2006: k indices from two independent hashes, g_i = h1 + i·h2)
_SALT2 = 0x5F3A


def _bit_indices(h1: np.ndarray, h2: np.ndarray, i: int,
                 m: int) -> np.ndarray:
    # int64 → uint64 view keeps the full entropy; uint64 wrap-around
    # arithmetic is exact mod 2^64, then reduce mod m
    return (h1 + np.uint64(i) * h2) % np.uint64(m)


def _build_bitmap(df: DataFrame, col: str, m: int, k: int) -> np.ndarray:
    """One mapInPandas pass: per-partition bitmap partials over JVM
    xxhash64 double-hash pairs, OR-merged driver-side."""
    nbytes = m // 8

    def build(batches):
        import pandas as pd
        bm = np.zeros(nbytes, dtype=np.uint8)
        for pdf in batches:
            h1 = pdf["h1"].to_numpy(np.int64).view(np.uint64)
            h2 = pdf["h2"].to_numpy(np.int64).view(np.uint64)
            for i in range(k):
                idx = _bit_indices(h1, h2, i, m)
                np.bitwise_or.at(bm, (idx >> np.uint64(3)).astype(np.int64),
                                 (np.uint64(1) << (idx & np.uint64(7)))
                                 .astype(np.uint8))
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    partials = (df.select(F.xxhash64(col).alias("h1"),
                          F.xxhash64(col, F.lit(_SALT2)).alias("h2"))
                .mapInPandas(build, "bm binary").collect())
    bm = np.zeros(nbytes, dtype=np.uint8)
    for r in partials:
        bm |= np.frombuffer(r["bm"], dtype=np.uint8)
    return bm


class DigestBloomFilter(Estimator, HasInputCol):
    """Fit a Bloom filter over the distinct values of ``inputCol``
    (typically a content digest).  ``expectedItems=None`` sizes from a
    ``count()`` of the input; pass it explicitly to skip that job when
    the store's cardinality is already tracked.

    Incremental ingest: ``model.update(new_items)`` ORs a new batch into
    the existing bitmap (bloom insertion is idempotent and monotone), so
    a steady-state pipeline — including a ``foreachBatch`` streaming
    store — fits once and updates per batch instead of refitting over
    the grown store.  The FP rate degrades gracefully past the fitted
    capacity; refit at a larger ``m`` when total inserts exceed ~2× the
    original ``expectedItems``."""

    fpp = FloatParam("fpp", "Target false-positive rate.", 0.01,
                     ParamValidators.in_range(0, 1, lower_inclusive=False,
                                              upper_inclusive=False))
    expectedItems = IntParam(
        "expectedItems", "Expected distinct item count; None = count().",
        None)

    def fit(self, *inputs: DataFrame) -> "DigestBloomFilterModel":
        (df,) = inputs
        col = self.get_("inputCol")
        n = self.get_("expectedItems")
        if n is None:
            n = df.count()
        n = max(int(n), 1)
        p = self.get_("fpp")
        m = int(-n * math.log(p) / (math.log(2) ** 2))
        m = max((m + 63) // 64 * 64, 1024)
        k = max(1, round(m / n * math.log(2)))
        bm = _build_bitmap(df, col, m, k)
        model = DigestBloomFilterModel()
        model.set_(inputCol=col)
        model.model_data = {
            "bitmap": base64.b64encode(bm.tobytes()).decode("ascii"),
            "numBits": m, "numHashes": k, "fittedItems": n}
        return model


class DigestBloomFilterModel(Model, HasInputCol, HasOutputCol):
    """Adds ``outputCol`` (default "maybe"): False ⇒ the value is
    DEFINITELY not in the fitted set (no false negatives); True ⇒
    probably present (FP rate ≈ fpp).  Use as a join prefilter:
    ``batch.where(~maybe)`` rows skip the store join, ``maybe`` rows
    resolve exactly.  No local path: the bit indices come from Spark's
    xxhash64, which only exists JVM-side (a served deployment re-tests
    membership against the store anyway)."""

    outputCol = StringParam("outputCol", "Boolean membership column.",
                            "maybe")

    def update(self, new_items: DataFrame) -> "DigestBloomFilterModel":
        """OR a new batch into the bitmap (same m/k — bloom insertion is
        monotone and idempotent, so replayed batches are harmless).
        ``fittedItems`` (sizing capacity at fit, plus each update's
        insert count) feeds the refit heuristic."""
        m = int(self.model_data["numBits"])
        k = int(self.model_data["numHashes"])
        old = np.frombuffer(base64.b64decode(self.model_data["bitmap"]),
                            dtype=np.uint8)
        delta = _build_bitmap(new_items, self.get_("inputCol"), m, k)
        n1 = new_items.count()
        self.model_data = {
            **self.model_data,
            "bitmap": base64.b64encode((old | delta).tobytes())
            .decode("ascii"),
            "fittedItems": int(self.model_data["fittedItems"]) + int(n1)}
        return self

    def _transform(self, df: DataFrame) -> DataFrame:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf
        m = int(self.model_data["numBits"])
        k = int(self.model_data["numHashes"])
        bm_bytes = base64.b64decode(self.model_data["bitmap"])
        bc = df.sparkSession.sparkContext.broadcast(bm_bytes)

        def probe(h1s, h2s):
            bm = np.frombuffer(bc.value, dtype=np.uint8)
            h1 = h1s.to_numpy(np.int64).view(np.uint64)
            h2 = h2s.to_numpy(np.int64).view(np.uint64)
            res = np.ones(len(h1), dtype=bool)
            for i in range(k):
                idx = _bit_indices(h1, h2, i, m)
                bits = (bm[(idx >> np.uint64(3)).astype(np.int64)]
                        >> (idx & np.uint64(7)).astype(np.uint8)) & 1
                res &= bits.astype(bool)
            return pd.Series(res)

        probe.__annotations__ = {"h1s": pd.Series, "h2s": pd.Series,
                                 "return": pd.Series}
        probe = pandas_udf(probe, "boolean")
        col = self.get_("inputCol")
        return df.withColumn(
            self.get_("outputCol"),
            probe(F.xxhash64(col), F.xxhash64(col, F.lit(_SALT2))))
