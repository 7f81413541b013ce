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
        """ProcessingTimeTumblingWindows: in the micro-batch harness each
        foreachBatch invocation IS a processing-time window, so this maps
        to per-batch (global) processing — documented Spark difference
        (SURVEY §2.10)."""
        return Windows("global", millis)

    def to_json(self) -> dict:
        d = {"kind": self.kind, "size": self.size}
        if self.slide is not None:
            d["slide"] = self.slide
        return d

    @staticmethod
    def from_json(d: dict) -> "Windows":
        return Windows(d["kind"], d.get("size"), d.get("slide"))
