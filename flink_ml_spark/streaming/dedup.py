"""Streaming exact deduplication — the unbounded counterpart of
``llmdata.dedup.ExactDeduplicator``.

A continuously-ingested corpus can't re-shuffle all history per batch;
Structured Streaming's ``dropDuplicatesWithinWatermark`` keeps per-key
dedup state partitioned across executors and lets the watermark expire
it, so state is proportional to keys seen within the deduplication
horizon, not to the corpus.  Keys are fixed-width digests of the dedup
columns (the same 32-byte-shuffle rule as the batch family): state and
shuffle volume never carry document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class StreamingExactDeduplicator:
    """Emit the first-seen row per content digest from an unbounded
    stream; duplicates arriving within ``watermark_delay`` of the
    original (in event time) are dropped, and the digest's state is
    freed once the watermark passes.

    ``apply`` works on both streaming and batch DataFrames (the batch
    path is plain ``dropDuplicates`` on the digest — same keep-one
    semantics, no state).  Only the digest and declared passthrough
    columns are emitted: which duplicate's payload survives is
    processing-order dependent in a distributed stream, so the
    deterministic contract is the deduplicated key set.
    """

    def __init__(self, content_cols: list[str],
                 watermark_col: str = "ts_t",
                 watermark_delay: str = "10 minutes",
                 digest_col: str = "content_sha"):
        if not content_cols:
            raise ValueError("content_cols must be non-empty")
        self.content_cols = list(content_cols)
        self.watermark_col = watermark_col
        self.watermark_delay = watermark_delay
        self.digest_col = digest_col

    def _with_digest(self, df: DataFrame) -> DataFrame:
        payload = F.concat_ws("\x1f", *[F.col(c).cast("string")
                                        for c in self.content_cols])
        return df.withColumn(self.digest_col, F.sha2(payload, 256))

    def apply(self, df: DataFrame) -> DataFrame:
        out = self._with_digest(df)
        if not out.isStreaming:
            return out.dropDuplicates([self.digest_col])
        return (out.withWatermark(self.watermark_col, self.watermark_delay)
                .dropDuplicatesWithinWatermark([self.digest_col]))
