"""Window strategies for online mini-batching.

Reference: flink-ml-core/.../common/window/Windows.java:22 and subtypes
(GlobalWindows, CountTumblingWindows.java:42, EventTimeTumblingWindows.java:41,
ProcessingTimeTumblingWindows, EventTimeSessionWindows,
ProcessingTimeSessionWindows); dispatch in DataStreamUtils.java:407-430.

Spark mapping (SURVEY §2.10): GlobalWindows → one model update per
micro-batch with cumulative state; CountTumblingWindows → re-chunk batches
to exact counts in the driver harness; EventTimeTumblingWindows →
``F.window`` buckets; session windows → ``F.session_window``.  JSON-able
so stages can persist their window choice.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Windows:
    kind: str = "global"      # global | count | event_time | session | sliding
    size: int | None = None   # count, window millis, or session gap millis
    slide: int | None = None  # sliding only: hop millis (slide <= size)

    @staticmethod
    def global_windows() -> "Windows":
        return Windows("global", None)

    @staticmethod
    def count_tumbling(n: int) -> "Windows":
        return Windows("count", n)

    @staticmethod
    def event_time_tumbling(millis: int) -> "Windows":
        return Windows("event_time", millis)

    @staticmethod
    def event_time_session(gap_millis: int) -> "Windows":
        """EventTimeSessionWindows.withGap — windows close after
        ``gap_millis`` of event-time silence."""
        return Windows("session", gap_millis)

    @staticmethod
    def event_time_sliding(size_millis: int, slide_millis: int) -> "Windows":
        """Sliding (hopping) event-time windows — beyond the reference's
        window set (its online estimators only consume tumbling/session
        windows), but table stakes for rate/trend features at scale;
        maps to Spark's native ``F.window(size, slide)``, where each row
        lands in size/slide overlapping windows."""
        if slide_millis <= 0 or slide_millis > size_millis:
            raise ValueError("require 0 < slide <= size")
        return Windows("sliding", size_millis, slide_millis)

    @staticmethod
    def processing_time_tumbling(millis: int) -> "Windows":
        """ProcessingTimeTumblingWindows → arrival-stamp mapping: rows are
        stamped with the wall-clock time of processing
        (:func:`attach_processing_time`; in Structured Streaming
        ``current_timestamp()`` is the micro-batch's logical time) and the
        stamp feeds the same ``F.window`` machinery as event time.
        Residual semantic difference vs the reference: stamp granularity
        is the micro-batch, not the individual record (SURVEY §2.10)."""
        return Windows("proc_time", millis)

    @staticmethod
    def processing_time_session(gap_millis: int) -> "Windows":
        """ProcessingTimeSessionWindows — arrival-stamp mapping as in
        :meth:`processing_time_tumbling`, through ``F.session_window``."""
        return Windows("proc_session", gap_millis)

    @property
    def is_processing_time(self) -> bool:
        return self.kind in ("proc_time", "proc_session")

    def to_json(self) -> dict:
        d = {"kind": self.kind, "size": self.size}
        if self.slide is not None:
            d["slide"] = self.slide
        return d

    @staticmethod
    def from_json(d: dict) -> "Windows":
        return Windows(d["kind"], d.get("size"), d.get("slide"))


def attach_processing_time(df, out_col: str = "__proc_t__", clock=None):
    """Stamp rows with their processing (arrival) time.  In Structured
    Streaming ``current_timestamp()`` resolves to the micro-batch's
    logical timestamp, so the stamp is exactly "when this engine
    processed the row" at micro-batch granularity; in batch it is the
    job's wall clock.  ``clock`` injects a deterministic Column for
    tests (the stamp is wall-clock state, so production outputs are not
    replay-reproducible — inherent to processing time, as in the
    reference)."""
    from pyspark.sql import functions as F
    return df.withColumn(out_col,
                         clock if clock is not None
                         else F.current_timestamp())
