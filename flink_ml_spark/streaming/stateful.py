"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's session windows (flink-ml-core/.../common/window/
EventTimeSessionWindows.java) fold inside its DataStream runtime; the
batch mapping in this repo is ``F.session_window`` (streaming/windows.py).
This module adds the genuinely-streaming shape: a per-key GroupState
session aggregator with an event-time timeout, the standard Structured
Streaming sessionization pattern (Spark docs, ``applyInPandasWithState``).

At scale this is the right physical plan for unbounded sessionization:
state is one fixed-width tuple per LIVE key (not per event), partitioned
by the grouping key across executors, and the watermark bounds both state
retention and late-data wait — 100 TB/day of events needs state only
proportional to concurrently-active keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType)


class StatefulSessionizer:
    """Per-key event-time session aggregation with gap-close semantics
    matching ``F.session_window`` (a new session starts when an event
    arrives ``>= gap_ms`` after the previous one; window end is
    last-event + gap exclusive).  The parity claim holds for streams
    whose per-key events arrive in event-time order across micro-batches
    (within a batch, order is irrelevant — events are sorted): a late
    cross-batch event that precedes the stored session's start by more
    than ``gap_ms`` is merged conservatively into that session rather
    than split into its own earlier (already-past-watermark) session,
    where ``F.session_window`` over the full batch data would report
    two.

    Sessions closed by an observed gap (within or across micro-batches)
    emit immediately in ``append`` mode; the trailing open session per
    key is held in ``GroupState`` with an event-time timeout at
    (last_event + gap_ms), so it emits once the watermark passes the gap
    with no further events.  Emitted rows: (key, s_start, s_end,
    n_events, sum_value) with millisecond-epoch bounds.
    """

    def __init__(self, key_col: str = "user_id", ts_col: str = "ts_ms",
                 value_col: str = "value", gap_ms: int = 600_000,
                 watermark_col: str = "ts_t",
                 watermark_delay: str = "1 minute"):
        self.key_col = key_col
        self.ts_col = ts_col
        self.value_col = value_col
        self.gap_ms = int(gap_ms)
        self.watermark_col = watermark_col
        self.watermark_delay = watermark_delay

    def output_schema(self) -> StructType:
        return StructType([
            StructField(self.key_col, LongType()),
            StructField("s_start", LongType()),
            StructField("s_end", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ])

    @staticmethod
    def state_schema() -> StructType:
        return StructType([
            StructField("s", LongType()), StructField("e", LongType()),
            StructField("n", LongType()), StructField("tot", DoubleType()),
        ])

    def _make_fn(self):
        # closure factory — capture the params as locals, never via
        # default args (see verify-skill gotcha on lambda capture)
        key_col, ts_col, value_col = self.key_col, self.ts_col, self.value_col
        gap_ms = self.gap_ms
        cols = [key_col, "s_start", "s_end", "n_events", "sum_value"]

        def fn(key, pdfs, state):
            import numpy as np
            import pandas as pd
            (k,) = key
            if state.hasTimedOut:
                s, e, n, tot = state.get
                state.remove()
                yield pd.DataFrame([[k, s, e, n, tot]], columns=cols)
                return
            parts = [p for p in pdfs if len(p)]
            out: list[list] = []
            if state.exists:
                s, e, n, tot = state.get
            else:
                s = e = None
                n, tot = 0, 0.0
            if parts:
                df = pd.concat(parts, ignore_index=True)
                ts = df[ts_col].to_numpy(dtype="int64")
                vals = df[value_col].to_numpy(dtype="float64")
                order = np.argsort(ts, kind="stable")
                for t, v in zip(ts[order], vals[order]):
                    t = int(t)
                    if s is None:
                        s, e, n, tot = t, t, 1, float(v)
                    elif t - e >= gap_ms:
                        out.append([k, s, e, n, tot])
                        s, e, n, tot = t, t, 1, float(v)
                    else:
                        # a late (within-watermark) event from a later
                        # micro-batch may precede the stored span — merge
                        # conservatively, never regress the session end
                        s, e = min(s, t), max(e, t)
                        n, tot = n + 1, tot + float(v)
            if s is not None:
                state.update((int(s), int(e), int(n), float(tot)))
                state.setTimeoutTimestamp(int(e) + gap_ms)
            if out:
                yield pd.DataFrame(out, columns=cols)

        return fn

    def apply(self, stream_df: DataFrame) -> DataFrame:
        """streaming events -> streaming closed-session rows (append)."""
        from pyspark.sql.streaming.state import GroupStateTimeout
        return (stream_df
                .withWatermark(self.watermark_col, self.watermark_delay)
                .groupBy(self.key_col)
                .applyInPandasWithState(
                    self._make_fn(), self.output_schema(),
                    self.state_schema(), "append",
                    GroupStateTimeout.EventTimeTimeout))


class StreamingFunnel:
    """Streaming ordered-funnel conversion — the unbounded counterpart
    of ``common.temporal.FunnelAnalyzer``: per-user greedy
    earliest-completion stage times maintained in ``GroupState`` (k
    longs per user — constant per key), final row emitted when the
    event-time watermark passes the user's last activity plus the
    inactivity gap.

    Events are applied in event-time order within each micro-batch;
    with batches arriving in event-time order (the watermark
    discipline), the incremental update equals the batch greedy funnel
    — which is exactly what the oracle gates (streaming replay ≡ batch
    FunnelAnalyzer SQL).  A cross-batch LATE stage-1 event that
    precedes an already-fixed later stage is the one case that cannot
    be repaired incrementally; it is bounded by the watermark delay and
    documented, matching FunnelAnalyzer's one-conversion-per-user
    contract.

    Emitted rows: (user, t_1 .. t_k millis — -1 for unreached,
    stages_completed).
    """

    def __init__(self, user_col: str, type_col: str, ts_col: str,
                 stages: list[str], inactivity_ms: int = 3_600_000,
                 watermark_col: str = "ts_t",
                 watermark_delay: str = "1 minute"):
        if len(stages) < 2:
            raise ValueError("StreamingFunnel: need at least 2 stages")
        if len(set(stages)) != len(stages):
            raise ValueError("StreamingFunnel: stages must be distinct")
        self.user_col, self.type_col, self.ts_col = (user_col, type_col,
                                                     ts_col)
        self.stages = list(stages)
        self.inactivity_ms = int(inactivity_ms)
        self.watermark_col = watermark_col
        self.watermark_delay = watermark_delay

    def output_schema(self) -> StructType:
        return StructType(
            [StructField(self.user_col, LongType())]
            + [StructField(f"t{i + 1}", LongType())
               for i in range(len(self.stages))]
            + [StructField("stages_completed", LongType())])

    def state_schema(self) -> StructType:
        # t1..tk (-1 = unreached) + last activity ts
        return StructType([StructField(f"t{i + 1}", LongType())
                           for i in range(len(self.stages))]
                          + [StructField("last", LongType())])

    def _make_fn(self):
        user_col, type_col, ts_col = (self.user_col, self.type_col,
                                      self.ts_col)
        stages, gap = self.stages, self.inactivity_ms
        k = len(stages)
        stage_of = {s: i for i, s in enumerate(stages)}
        cols = ([user_col] + [f"t{i + 1}" for i in range(k)]
                + ["stages_completed"])

        def fn(key, pdfs, state):
            import pandas as pd
            (u,) = key
            if state.hasTimedOut:
                vals = list(state.get)
                t = vals[:k]
                state.remove()
                # match FunnelAnalyzer's contract: only users who
                # reached stage 1 appear in the output
                if t[0] >= 0:
                    done = sum(1 for x in t if x >= 0)
                    yield pd.DataFrame(
                        [[u] + t + [done]], columns=cols)
                return
            if state.exists:
                vals = list(state.get)
                t, last = vals[:k], vals[k]
            else:
                t, last = [-1] * k, -1
            rows = []
            for pdf in pdfs:
                if len(pdf):
                    rows.append(pdf[[ts_col, type_col]])
            if rows:
                ev = pd.concat(rows, ignore_index=True)
                ev = ev.sort_values(ts_col, kind="stable")
                for ts, ty in zip(ev[ts_col], ev[type_col]):
                    i = stage_of.get(ty)
                    if i is None:
                        continue
                    ts = int(ts)
                    last = max(last, ts)
                    if i == 0:
                        if t[0] < 0 or ts < t[0]:
                            t[0] = ts
                    elif t[i - 1] >= 0 and ts > t[i - 1] \
                            and (t[i] < 0 or ts < t[i]):
                        t[i] = ts
            if last >= 0:
                state.update(tuple(int(x) for x in t) + (int(last),))
                state.setTimeoutTimestamp(int(last) + gap)
            return
            yield  # generator contract

        return fn

    def apply(self, stream_df: DataFrame) -> DataFrame:
        from pyspark.sql.streaming.state import GroupStateTimeout
        return (stream_df
                .withWatermark(self.watermark_col, self.watermark_delay)
                .groupBy(self.user_col)
                .applyInPandasWithState(
                    self._make_fn(), self.output_schema(),
                    self.state_schema(), "append",
                    GroupStateTimeout.EventTimeTimeout))
