"""Streaming per-micro-batch data-quality gating — the unbounded
counterpart of ``llmdata.profiler.ConstraintGate`` and the third member
of the streaming monitor family (drift gate, dedup, quality gate).

The production shape this models: a circuit breaker IN FRONT of the
stateful stages of an ingest pipeline.  A poisoned micro-batch (nulls
from a schema regression, out-of-range values from a unit bug, an
unknown enum from an upstream deploy) that reaches a signature store,
an online model, or a published table corrupts state that replays can't
cheaply undo — so each batch is validated first and either forwarded or
quarantined whole.

100 TB plan: the whole constraint suite is ONE aggregation pass per
batch (map-side partials; see ConstraintGate), so the gate adds a
single cheap job ahead of the sink.  The gate holds NO cross-batch
state — foreachBatch replays re-validate and re-route identically, so
at-least-once delivery stays idempotent as long as the sinks are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..llmdata.profiler import ConstraintGate


class StreamingQualityGate:
    """Wraps a ``ConstraintGate`` suite for Structured Streaming.

    ``process_batch(batch_df)`` → ``(passed, report_rows)`` where the
    report carries one (constraint, column, observed, threshold,
    passed) row per rule.  ``foreach_batch(sink_fn, quarantine_fn,
    report_fn)`` adapts it to ``writeStream.foreachBatch``: a clean
    batch goes to ``sink_fn(batch_df, batch_id)``, a violating batch
    goes WHOLE to ``quarantine_fn`` (default: dropped), and
    ``report_fn(report_rows, batch_id, passed)`` observes every verdict
    (feed it a metrics sink).  ``on_violation="fail"`` raises instead —
    the stop-the-world posture for pipelines where quarantine loss is
    worse than downtime.
    """

    def __init__(self, constraints: list[dict],
                 on_violation: str = "quarantine"):
        if on_violation not in ("quarantine", "fail"):
            raise ValueError("on_violation must be 'quarantine' or 'fail'")
        self._gate = ConstraintGate(constraints=constraints,
                                    failOnViolation=(on_violation == "fail"))
        self.on_violation = on_violation

    def process_batch(self, batch_df: DataFrame) -> tuple[bool, list]:
        return self._gate.check(batch_df)

    def foreach_batch(self, sink_fn, quarantine_fn=None, report_fn=None):
        def fb(batch_df: DataFrame, batch_id: int) -> None:
            passed, report = self.process_batch(batch_df)
            if report_fn is not None:
                report_fn(report, batch_id, passed)
            if passed:
                sink_fn(batch_df, batch_id)
            elif quarantine_fn is not None:
                quarantine_fn(batch_df, batch_id)
        return fb
