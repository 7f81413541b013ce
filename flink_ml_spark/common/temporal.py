"""Temporal join primitives — as-of (point-in-time) join and bucketed
range join.

Spark has no native as-of or interval join (the naive formulations are a
broadcast-only hack or an O(|L|x|R|) BroadcastNestedLoopJoin); the
reference engine family solves point-in-time lookups with keyed state
(as this repo's ``streaming/online.py`` model-version as-of join does for
the bounded-version case).  These are the general, scale-first batch
formulations:

- ``asof_join``: union-tag both sides, one shuffle on the join key, one
  partitioned sort, then a ``last(<struct>, ignorenulls)`` running carry
  picks each left row's most recent (or next, for ``direction='forward'``)
  right row.  Shuffle volume is |L|+|R| rows keyed on the join key — the
  same as a plain sort-merge join of the two tables, with no broadcast
  requirement on either side, so it survives two 100 TB inputs.  The
  carried value is a single struct of the matched right row, so right
  columns that are legitimately NULL are carried faithfully (a per-column
  ``last(ignorenulls)`` would skip them to an older row).
- ``range_join``: intervals explode to the fixed-width time buckets they
  cover, points carry exactly one bucket, and the pair matches through an
  equi-join on (keys..., bucket) plus a residual containment filter.
  Catalyst plans a shuffled hash/sort-merge join instead of a BNLJ;
  duplicate volume is sum(span)/bucket_width rows, so pick
  ``bucket_width`` near the typical interval span.  Each (point,
  interval) pair is produced at most once because a point owns exactly
  one bucket — no post-join dedup.

Both are deterministic row functions of their inputs (given unique
(keys, time) on the right for as-of ties), which is what lets the
driver's DuckDB oracle (``ASOF JOIN`` / inequality join) verify them
value-for-value.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str | Sequence[str],
              left_time: str, right_time: str | None = None,
              right_cols: Sequence[str] | None = None,
              direction: str = "backward",
              tolerance: int | None = None,
              suffix: str = "_right",
              skew_bucket_width: int | None = None) -> DataFrame:
    """For each left row, attach the single right row with the largest
    ``right_time`` <= ``left_time`` (``direction='backward'``, inclusive)
    or smallest ``right_time`` >= ``left_time`` (``'forward'``) within the
    same ``on`` key — pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
    semantics, left-outer: unmatched left rows keep NULL right columns.

    ``tolerance`` (same units as the time columns) drops matches farther
    than that from the left time.  Right columns arrive under their own
    names, ``suffix``-renamed on collision with a left column; the matched
    right time is always emitted as ``right_time + suffix``.

    NULL join keys never match (SQL semantics): rows with a NULL key are
    kept (left) / ignored (right).

    ``skew_bucket_width`` switches to the two-phase hot-key formulation:
    rows shuffle on (key, floor(time/width)) so one pathological key
    spreads over its time range instead of a single partition's sort;
    cross-bucket lookback goes through per-(key, bucket) right-row tails
    (one tiny keyed window over #buckets rows) joined back per bucket.
    Identical semantics, ~2x shuffle volume — use it when a key can hold
    a meaningful fraction of a partition's worth of rows.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    right_time = right_time or left_time
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c != right_time and c not in keys]
    sgn = 1 if direction == "backward" else -1

    payload = F.struct(
        F.col(right_time).cast("long").alias("__t"),
        *[F.col(c).alias(c) for c in right_cols])
    r = right.where(F.col(right_time).isNotNull()).select(
        *[F.col(k) for k in keys],
        (F.col(right_time).cast("long") * sgn).alias("__ord"),
        F.lit(0).alias("__side"),
        payload.alias("__p"))
    payload_type = r.schema["__p"].dataType

    l = (left
         .withColumn("__ord", F.col(left_time).cast("long") * sgn)
         .withColumn("__side", F.lit(1))
         .withColumn("__p", F.lit(None).cast(payload_type)))
    # right rows contribute NULL for every left-only column
    u = l.unionByName(r, allowMissingColumns=True)

    # NULL keys never match: drop right rows with a NULL key, so the
    # NULL-key window partition holds only left rows and their carry
    # stays NULL (left rows themselves are always kept).
    for k in keys:
        u = u.where(F.col(k).isNotNull() | (F.col("__side") == 1))

    if skew_bucket_width is None:
        w = (Window.partitionBy(*keys)
             .orderBy("__ord", "__side")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        out = (u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
               .where(F.col("__side") == 1))
    else:
        # two-phase: in-bucket carry + cross-bucket tail lookback.
        # __ord already encodes direction (negated for forward), so
        # bucketing __ord keeps "earlier in scan order" = smaller bucket.
        u = u.withColumn(
            "__b", F.floor(F.col("__ord") / F.lit(int(skew_bucket_width))))
        w_in = (Window.partitionBy(*keys, "__b")
                .orderBy("__ord", "__side")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        u = u.withColumn("__in", F.last("__p", ignorenulls=True).over(w_in))
        tails = (u.where(F.col("__side") == 0)
                 .groupBy(*keys, "__b")
                 .agg(F.max_by("__p", F.col("__ord")).alias("__tail")))
        spine = (u.select(*keys, "__b").distinct()
                 .join(tails, keys + ["__b"], "left"))
        w_sp = (Window.partitionBy(*keys).orderBy("__b")
                .rowsBetween(Window.unboundedPreceding, -1))
        spine = spine.withColumn(
            "__prev", F.last("__tail", ignorenulls=True).over(w_sp)) \
            .select(*keys, "__b", "__prev")
        out = (u.where(F.col("__side") == 1)
               .join(spine, keys + ["__b"], "left")
               .withColumn("__m", F.coalesce("__in", "__prev")))
    if tolerance is not None:
        dist = (F.col(left_time).cast("long") - F.col("__m")["__t"]) * sgn
        out = out.withColumn(
            "__m", F.when(dist <= F.lit(int(tolerance)), F.col("__m")))
    left_names = set(left.columns)
    proj = [F.col(c) for c in left.columns]
    proj.append(F.col("__m")["__t"].alias(right_time + suffix))
    for c in right_cols:
        name = c + suffix if c in left_names else c
        proj.append(F.col("__m")[c].alias(name))
    return out.select(*proj)


def range_join(points: DataFrame, intervals: DataFrame, point_time: str,
               start_col: str, end_col: str, on: Sequence[str] = (),
               bucket_width: int = 3600_000,
               include_end: bool = True) -> DataFrame:
    """Inner-join each point row to every interval row whose
    ``[start_col, end_col]`` (closed, or half-open with
    ``include_end=False``) contains ``point_time``, matching on the
    optional equality keys ``on`` — without a nested-loop join.

    Column names must be disjoint between the two inputs apart from the
    ``on`` keys (pre-select/alias otherwise).  Degenerate intervals
    (end < start) match nothing.  An interval spanning B buckets is
    duplicated B times in the shuffle — size ``bucket_width`` near the
    typical span, and cap pathological spans upstream.
    """
    keys = list(on)
    pt = points.withColumn(
        "__b", F.floor(F.col(point_time).cast("long") / F.lit(bucket_width)))
    iv = intervals.withColumn(
        "__bs", F.sequence(
            F.floor(F.col(start_col).cast("long") / F.lit(bucket_width)),
            F.floor(F.col(end_col).cast("long") / F.lit(bucket_width))))
    iv = (iv.where(F.col(end_col).cast("long")
                   >= F.col(start_col).cast("long"))
          .withColumn("__b", F.explode("__bs")).drop("__bs"))
    upper = (F.col(point_time) <= F.col(end_col) if include_end
             else F.col(point_time) < F.col(end_col))
    joined = pt.join(iv, keys + ["__b"], "inner") \
        .where((F.col(point_time) >= F.col(start_col)) & upper)
    return joined.drop("__b")


class FunnelAnalyzer:
    """Ordered-funnel conversion over an event log: for each user, the
    classic greedy stage times t_1 = min ts of stage 1, t_i = min ts of
    stage i AFTER t_{i-1} (optionally within ``max_span_ms`` of t_1) —
    the standard product-analytics funnel (strictly ordered, earliest-
    completion semantics, one conversion per user).

    ``transform(events)`` → one row per user who reached stage 1:
    (user, t_1 .. t_k millis, stages_completed).  Greedy min-time is a
    deterministic integer function of the log, so a SQL oracle replays
    it exactly.

    Scale plan: stage i is ONE equi-join (user key) between the
    filtered stage-i stream and the stage-(i−1) conversion relation
    (user-cardinality-sized, shrinking monotonically down the funnel)
    plus a map-side-combined min aggregate — k small joins, no window
    over the whole log, no per-user event collection.  The conversion
    relations are broadcast when small; Catalyst/AQE picks that up from
    size estimates, so no hint is forced here.
    """

    def __init__(self, user_col: str, type_col: str, ts_col: str,
                 stages: Sequence[str], max_span_ms: int = 0):
        if len(stages) < 2:
            raise ValueError("FunnelAnalyzer: need at least 2 stages")
        if len(set(stages)) != len(stages):
            raise ValueError("FunnelAnalyzer: stages must be distinct")
        self.user_col, self.type_col, self.ts_col = user_col, type_col, ts_col
        self.stages = list(stages)
        self.max_span_ms = int(max_span_ms)

    def transform(self, events: DataFrame) -> DataFrame:
        u, ty, ts = self.user_col, self.type_col, self.ts_col
        conv = (events.filter(F.col(ty) == self.stages[0])
                .groupBy(u).agg(F.min(F.col(ts).cast("long")).alias("t1")))
        for i, st in enumerate(self.stages[1:], start=2):
            nxt = events.filter(F.col(ty) == st).select(
                F.col(u).alias("__fu__"), F.col(ts).cast("long").alias("__ft__"))
            cond = (nxt["__fu__"] == conv[u]) & \
                   (F.col("__ft__") > F.col(f"t{i - 1}"))
            if self.max_span_ms > 0:
                cond = cond & (F.col("__ft__")
                               <= F.col("t1") + self.max_span_ms)
            step = (nxt.join(conv, cond)
                    .groupBy("__fu__")
                    .agg(F.min("__ft__").alias(f"t{i}"))
                    .withColumnRenamed("__fu__", "__fk__"))
            conv = (conv.join(step, conv[u] == step["__fk__"], "left")
                    .drop("__fk__"))
        reached = sum((F.col(f"t{i}").isNotNull().cast("int")
                       for i in range(2, len(self.stages) + 1)),
                      F.lit(1))
        return conv.withColumn("stages_completed", reached)


class CohortRetention:
    """Cohort retention analysis over an event log: users are cohorted
    by the period of their FIRST event; retention cell (cohort, k) =
    distinct users of that cohort active k periods later.  The
    product-analytics standard (triangle retention matrix); every cell
    is an integer and the rate is one division of two exact integers,
    so a SQL oracle replays it bit-for-bit.

    ``transform(events)`` → (cohort, k, users, cohort_size, rate).

    Scale plan: first-event relation = ONE user-keyed min aggregate;
    cells = ONE (user-join + distinct-count) aggregate over (cohort, k)
    — both map-side combined, output triangle-sized (periods²), never
    corpus-sized.  The user→cohort relation joins broadcast when users
    fit; otherwise it is a plain user-keyed shuffle join, the same key
    the distinct needs anyway."""

    def __init__(self, user_col: str, ts_col: str, period_ms: int):
        if period_ms <= 0:
            raise ValueError("CohortRetention: period_ms must be > 0")
        self.user_col, self.ts_col = user_col, ts_col
        self.period_ms = int(period_ms)

    def transform(self, events: DataFrame) -> DataFrame:
        u = self.user_col
        per = F.lit(self.period_ms)
        ts = F.col(self.ts_col).cast("long")
        base = events.select(F.col(u).alias("__cu__"),
                             F.floor(ts / per).alias("__p__"))
        first = (base.groupBy("__cu__")
                 .agg(F.min("__p__").alias("cohort")))
        sizes = (first.groupBy("cohort")
                 .agg(F.count(F.lit(1)).alias("cohort_size")))
        cells = (base.join(first, "__cu__")
                 .select("cohort", (F.col("__p__") - F.col("cohort"))
                         .alias("k"), "__cu__")
                 .groupBy("cohort", "k")
                 .agg(F.count_distinct("__cu__").alias("users")))
        return (cells.join(sizes, "cohort")
                .withColumn("rate", F.col("users").cast("double")
                            / F.col("cohort_size").cast("double"))
                .select("cohort", "k", "users", "cohort_size", "rate"))
