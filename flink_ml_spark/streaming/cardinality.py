"""StreamingCardinalityMonitor — incremental distinct-count over an
unbounded stream via exactly-mergeable HyperLogLog sketches.

The streaming face of ``llmdata.sketches.HyperLogLogSketch``: each
micro-batch is sketched independently (one map-side-combined aggregate,
2^p-register output) and merged into the running sketch by
register-wise max — HLL merge is EXACT, so the accumulated registers
after any number of batches are bit-identical to a single batch fit
over the union of all rows seen.  That identity is the operator's
contract (and what its oracle query gates): replays, reordered
batches, and batch/stream parity all fall out of it.

State is one 2^p integer array on the driver — constant, never
key-proportional — which is precisely why a sketch (and not
``dropDuplicates`` state or an exact distinct) is the 100 TB answer for
"how many distinct users/urls/keys has this stream seen".
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..llmdata.sketches import HyperLogLogSketch, HyperLogLogSketchModel


class StreamingCardinalityMonitor:
    """``process_batch(df)`` sketches one micro-batch and merges it in,
    returning the running estimate; ``foreach_batch(collect_fn)``
    adapts to Structured Streaming.  ``model`` holds the accumulated
    :class:`HyperLogLogSketchModel` (registers / estimate / merge)."""

    def __init__(self, input_col: str, precision: int = 9):
        self.input_col = input_col
        self.precision = int(precision)
        self.model: HyperLogLogSketchModel | None = None
        self.history: list[dict] = []  # (batch_id, estimate) per batch

    def process_batch(self, batch_df: DataFrame,
                      batch_id: int = -1) -> dict:
        sk = HyperLogLogSketch(inputCol=self.input_col,
                               precision=self.precision).fit(batch_df)
        self.model = sk if self.model is None else self.model.merge(sk)
        rec = {"batch_id": int(batch_id),
               "estimate": float(self.model.estimate())}
        self.history.append(rec)
        return rec

    def foreach_batch(self, collect_fn=None):
        def fn(batch_df: DataFrame, batch_id: int):
            rec = self.process_batch(batch_df, batch_id)
            if collect_fn is not None:
                collect_fn(rec)
        return fn
