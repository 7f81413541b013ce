"""Streaming corpus-drift monitoring — the unbounded counterpart of
``llmdata.textanalysis.TokenDriftProfiler``.

An ingestion pipeline wants a per-micro-batch data-quality gate: "does
this batch still look like the corpus the reference model was fit on?"
The monitor holds a fitted reference token histogram (top-``vocabSize``
vocabulary + an OOV bucket — model-sized by construction, the
UnigramLMScorer shape) and scores every batch with its Jensen-Shannon
divergence from the reference, so a crawl-source regression, an encoding
bug, or a boilerplate flood shows up as a JS spike the batch it happens.

100 TB plan: per batch ONE token-count shuffle (groupBy token with
map-side combine), then a broadcast join against the model-sized vocab
folds the batch histogram onto the reference space (vocab + OOV) — at
most ``vocabSize + 1`` rows ever reach the driver per batch, regardless
of batch bytes.  The reference itself never re-counts.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def _tokens(text_col):
    return F.array_remove(F.split(F.lower(text_col), r"\s"), "")


class StreamingDriftMonitor:
    """Per-micro-batch Jensen-Shannon divergence of the batch token
    distribution vs a fitted reference, over the space (reference
    vocabulary ∪ OOV) with add-``smoothing`` smoothing:

        JSD(p, q) = 0.5·KL(p‖m) + 0.5·KL(q‖m),  m = (p + q)/2

    — bounded in [0, ln 2], symmetric, finite even for disjoint support
    (unlike raw KL), which is what a monitor needs: an all-OOV batch
    reports ≈ln 2, not infinity.

    ``fit_reference(df)`` = one count aggregation (top-k vocabulary by
    count desc / token asc, remaining mass becomes the reference OOV
    bucket).  ``process_batch(batch_df)`` returns a dict with the batch
    histogram folded onto the reference space and its divergence;
    ``foreach_batch(collect_fn)`` adapts it to Structured Streaming's
    foreachBatch (the monitor is pure per-batch measurement — no
    cross-batch state, so replays are trivially idempotent).
    """

    OOV = "\x00oov"  # reserved bucket key (never a whitespace token)

    def __init__(self, input_col: str = "text", vocab_size: int = 50_000,
                 smoothing: float = 0.5):
        if vocab_size <= 0 or smoothing <= 0:
            raise ValueError("vocab_size and smoothing must be positive")
        self.input_col = input_col
        self.vocab_size = vocab_size
        self.smoothing = smoothing
        self.ref: dict[str, int] | None = None  # vocab + OOV bucket counts

    # --- reference -----------------------------------------------------
    def fit_reference(self, df: DataFrame) -> "StreamingDriftMonitor":
        toks = df.select(F.explode(_tokens(F.col(self.input_col)))
                         .alias("t"))
        cnt = toks.groupBy("t").count().persist()
        try:
            total = cnt.agg(F.sum("count")).first()[0] or 0
            rows = (cnt.orderBy(F.col("count").desc(), F.col("t"))
                    .limit(self.vocab_size).collect())
        finally:
            cnt.unpersist()
        ref = {r["t"]: int(r["count"]) for r in rows}
        ref[self.OOV] = int(total) - sum(ref.values())
        self.ref = ref
        return self

    # --- per-batch measurement ------------------------------------------
    def _batch_counts(self, batch_df: DataFrame) -> dict[str, int]:
        spark = batch_df.sparkSession
        vocab = spark.createDataFrame(
            [(t,) for t in self.ref if t != self.OOV], "t string")
        toks = batch_df.select(
            F.explode(_tokens(F.col(self.input_col))).alias("t"))
        # corpus-sized shuffle happens ONCE (raw-token groupBy with
        # partial aggregation); the vocab fold is a broadcast join over
        # the already-aggregated (≤ batch-vocab) relation
        folded = (toks.groupBy("t").count()
                  .join(F.broadcast(vocab.withColumn("__v__", F.lit(1))),
                        "t", "left")
                  .select(F.when(F.col("__v__").isNotNull(), F.col("t"))
                          .otherwise(F.lit(self.OOV)).alias("t"), "count")
                  .groupBy("t").agg(F.sum("count").alias("n")))
        return {r["t"]: int(r["n"]) for r in folded.collect()}

    def divergence(self, counts: dict[str, int]) -> float:
        """JS divergence of smoothed ``counts`` vs the reference over
        the (vocab + OOV) space.  Driver-local: the space is
        model-sized."""
        if self.ref is None:
            raise ValueError("fit_reference must run first")
        a = self.smoothing
        space = list(self.ref)  # vocab + OOV, insertion-ordered
        t_ref = sum(self.ref.values())
        t_b = sum(counts.values())
        d_ref = t_ref + a * len(space)
        d_b = t_b + a * len(space)
        js = 0.0
        for t in space:
            p = (self.ref[t] + a) / d_ref
            q = (counts.get(t, 0) + a) / d_b
            m = 0.5 * (p + q)
            js += 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
        return js

    def process_batch(self, batch_df: DataFrame) -> dict:
        counts = self._batch_counts(batch_df)
        return {"n_tokens": sum(counts.values()),
                "js": self.divergence(counts)}

    def foreach_batch(self, collect_fn):
        """A ``foreachBatch`` function: measures the batch and hands
        (result_dict, batch_id) to ``collect_fn``."""
        def fb(batch_df: DataFrame, batch_id: int) -> None:
            collect_fn(self.process_batch(batch_df), batch_id)
        return fb
