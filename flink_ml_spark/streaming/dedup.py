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


class StreamingIncrementalDeduplicator:
    """Streaming NEAR-dup dedup: every micro-batch runs
    ``llmdata.IncrementalMinHashDeduplicator`` against a signature store
    that accumulates across batches — exact streaming dedup's
    dropDuplicatesWithinWatermark can't do similarity, and re-shingling
    history per batch can't scale, so the store IS the streaming state:
    (id, numHashes longs) per surviving document, held as an
    executor-distributed localCheckpoint (never driver memory), swapped
    atomically per batch from ``foreachBatch``.

    ``process_batch(batch_df)`` returns the batch's matches
    (id, match_id, est_jaccard) and folds the non-matched signatures into
    the store; the first batch matches against an empty store, so its
    documents all seed the state.  Store growth is the corpus's unique-
    document rate; production retention (drop signatures older than the
    dedup horizon) composes by filtering ``store`` between batches.

    **Fault tolerance caveat**: the localCheckpoint store is NOT
    recoverable — executor loss drops its blocks mid-run, and a query
    restart from ``checkpointLocation`` starts with an EMPTY store, so
    replayed batches re-emit no matches against pre-restart history.  For
    production, persist the signature table between batches (e.g.
    ``io.write_bucketed`` on the id — ~``numHashes``×8 bytes/doc, ~0.1%
    of corpus bytes) and re-seed on restart with ``seed_store``; within a
    healthy run the in-memory store stays the hot path.
    """

    def __init__(self, id_col: str, text_col: str, shingle_size: int = 3,
                 num_hashes: int = 32, band_size: int = 4,
                 threshold: float = 0.7, seed: int = 42,
                 max_band_doc_freq: int | None = None):
        from ..llmdata.dedup import IncrementalMinHashDeduplicator
        self.id_col = id_col
        self._op = IncrementalMinHashDeduplicator(
            idCol=id_col, textCol=text_col, shingleSize=shingle_size,
            numHashes=num_hashes, bandSize=band_size, threshold=threshold,
            seed=seed).set_(maxBandDocFreq=max_band_doc_freq)
        self.store: DataFrame | None = None

    def process_batch(self, batch_df: DataFrame) -> DataFrame:
        if self.store is None:
            self.store = (batch_df.select(F.col(self.id_col)).limit(0)
                          .withColumn("sig",
                                      F.lit(None).cast("array<long>")))
        matches, sig, store = self._op._plan(batch_df, self.store)
        # materialize matches FIRST, then derive the store update from the
        # checkpointed result — the candidate band join runs once per
        # batch, not once per output; foreachBatch replays (at-least-once
        # delivery) are idempotent because updated_store anti-joins both
        # the matches and the already-committed store ids
        matches = matches.localCheckpoint(eager=True)
        updated = self._op.updated_store(matches, sig, store)
        self.store = updated.localCheckpoint(eager=True)
        return matches

    def seed_store(self, store_df: DataFrame) -> None:
        """Restart path: adopt a persisted ``(id, sig)`` signature table
        (written by the caller between batches) as the store, so a query
        restarted from its checkpoint matches against pre-restart
        history instead of an empty store."""
        if self.store is not None:
            raise ValueError("seed_store must run before the first batch")
        self.store = store_df.select(F.col(self.id_col), "sig")

    def foreach_batch(self, collect_fn):
        """A ``foreachBatch`` function: runs the batch through the store
        and hands (matches_df, batch_id) to ``collect_fn``."""
        def fb(batch_df: DataFrame, batch_id: int) -> None:
            collect_fn(self.process_batch(batch_df), batch_id)
        return fb
