"""Dataflow primitives — the reference's "physical operator" layer (SURVEY
§2.8), re-expressed on Spark's public API.

Reference: flink-ml-core/src/main/java/org/apache/flink/ml/common/
datastream/DataStreamUtils.java (mapPartition :120, reduce :155-233,
aggregate :238-295, sample :300-321, allReduceSum :107 +
AllReduceImpl.java:24-40, coGroup :388-412, windowAllAndProcess :333-385,
generateBatchData :718) and broadcast/BroadcastUtils.java:41-110.

Most primitives collapse to one-line Spark built-ins — that is the point:
partial-then-final aggregation, sort-merge co-group, broadcast joins and
managed spill are Catalyst/Tungsten features, not library code.  They are
still exposed here as named functions so every reference utility has a
checkable, tested equivalent, and so algorithm code reads like the
reference design docs.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F


def map_partition(df: DataFrame, func: Callable, schema) -> DataFrame:
    """Buffer a partition, apply ``func(iterator[pandas.DataFrame]) ->
    iterator[pandas.DataFrame]`` (DataStreamUtils.mapPartition:120).
    Arrow-batched; ``func`` sees one partition per task."""
    return df.mapInPandas(func, schema=schema)


def reduce_rows(df: DataFrame, *aggs: Column):
    """Global partial→final reduction (DataStreamUtils.reduce:155-233).
    Spark plans a map-side partial HashAggregate per partition and a final
    merge — the explicit p-parallel → p=1 topology of the reference."""
    return df.agg(*aggs).first()


def aggregate_keyed(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    """Keyed ACC-based aggregation (DataStreamUtils.aggregate:238-295)."""
    return df.groupBy(*keys).agg(*aggs)


def sample_n(df: DataFrame, n: int, seed: int = 0) -> list:
    """n rows without replacement (DataStreamUtils.sample:300-321 — the
    2-round distributed reservoir).  Driver receives exactly n rows; the
    oversample fraction bounds the collect size."""
    total = df.count()
    if total <= n:
        return df.collect()
    frac = min(1.0, (n * 4.0) / total + 1e-6)
    got = df.sample(False, frac, seed=seed).limit(n).collect()
    if len(got) < n:  # rare under-sample: fall back to exact
        got = df.limit(n).collect()
    return got


def top_k_per_key(df: DataFrame, part_cols: Sequence[str],
                  order_cols: Sequence[Column], k: int,
                  salt_cols: Sequence[str],
                  salt_buckets: int = 32,
                  rank_col: str | None = None) -> DataFrame:
    """Exact top-k per key with bounded task size (hot-key safe).

    A plain ``Window.partitionBy(key)`` rank puts EVERY row of a hot key
    through one task.  This is the classic two-stage refinement: stage 1
    ranks within (key, salt) — per-task rows bounded by key_rows /
    salt_buckets — and keeps k per salt; stage 2 ranks the surviving
    ≤ salt_buckets × k rows per key.  ``order_cols`` must be a TOTAL order
    (include a tiebreaker) so both stages agree and the result equals the
    single-stage rank exactly.  ``salt_cols`` name the columns whose
    deterministic hash spreads a key's rows across salts (use the unique
    tiebreaker, e.g. the per-row id).  ``rank_col`` keeps the final
    1-based rank.
    """
    from pyspark.sql import Window
    salt = F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets))
    salted = df.withColumn("__salt__", salt)
    w1 = Window.partitionBy(*part_cols, "__salt__").orderBy(*order_cols)
    pruned = (salted.withColumn("__rn1__", F.row_number().over(w1))
              .filter(F.col("__rn1__") <= k).drop("__rn1__"))
    w2 = Window.partitionBy(*part_cols).orderBy(*order_cols)
    ranked = pruned.withColumn(rank_col or "__rn2__",
                               F.row_number().over(w2))
    out = ranked.filter(F.col(rank_col or "__rn2__") <= k).drop("__salt__")
    return out if rank_col else out.drop("__rn2__")


def all_reduce_sum(df: DataFrame, vec_col: str) -> np.ndarray:
    """Sum one vector per row across the cluster and return it to the
    driver (DataStreamUtils.allReduceSum:107, AllReduceImpl.java:24-40).
    The reference's 3-stage chunked all-reduce becomes a partial/final
    aggregate: only one vector per partition crosses the shuffle, and the
    driver re-broadcasts the result — same communication volume, no custom
    protocol."""
    dim = len(df.select(vec_col).first()[0])
    row = df.agg(*[F.sum(F.col(vec_col)[i]).alias(f"s{i}")
                   for i in range(dim)]).first()
    return np.array([row[f"s{i}"] or 0.0 for i in range(dim)])


def co_group(left: DataFrame, right: DataFrame, left_key: str, right_key: str,
             func: Callable, schema) -> DataFrame:
    """Keyed two-input co-group (DataStreamUtils.coGroup:388-412, sort
    machinery datastream/sort/*).  Spark's cogroup + applyInPandas handles
    the sort/spill natively."""
    return (left.groupBy(left_key).cogroup(right.groupBy(right_key))
            .applyInPandas(func, schema=schema))


def window_all_and_process(df: DataFrame, windows, time_col: str | None,
                           *aggs: Column, clock: Column | None = None
                           ) -> DataFrame:
    """Apply a Windows strategy to the whole table
    (DataStreamUtils.windowAllAndProcess:333-385).  GlobalWindows → plain
    agg; tumbling event-time windows → F.window groups; count windows →
    monotonic-id bucketing (batch analogue of countWindowAll);
    processing-time windows → arrival stamp (``clock`` overrides the wall
    clock for deterministic tests) through the event-time machinery."""
    from ..streaming.windows import Windows, attach_processing_time
    w: Windows = windows
    if w.kind == "global":
        return df.agg(*aggs)
    if w.is_processing_time:
        df = attach_processing_time(df, "__proc_t__", clock)
        inner = Windows("event_time" if w.kind == "proc_time" else "session",
                        w.size)
        return window_all_and_process(df, inner, "__proc_t__", *aggs)
    if w.kind == "event_time":
        win = F.window(F.col(time_col), f"{w.size} milliseconds")
        return (df.groupBy(win.alias("w")).agg(*aggs)
                .withColumn("window_start", F.col("w")["start"]).drop("w"))
    if w.kind == "sliding":
        win = F.window(F.col(time_col), f"{w.size} milliseconds",
                       f"{w.slide} milliseconds")
        return (df.groupBy(win.alias("w")).agg(*aggs)
                .withColumn("window_start", F.col("w")["start"]).drop("w"))
    if w.kind == "session":
        win = F.session_window(F.col(time_col), f"{w.size} milliseconds")
        return (df.groupBy(win.alias("w")).agg(*aggs)
                .withColumn("window_start", F.col("w")["start"]).drop("w"))
    if w.kind == "count":
        # count windows impose a global sequence (countWindowAll) — built
        # two-phase (per-partition counts → broadcast offsets), never a
        # global single-task sort
        return (with_contiguous_id(df, "__seq__")
                .groupBy(F.floor((F.col("__seq__") - 1) / w.size)
                         .alias("window_id")).agg(*aggs))
    raise ValueError(f"unsupported window kind {w.kind}")


def with_contiguous_id(df: DataFrame, out_col: str = "__seq__") -> DataFrame:
    """Append a 1-based gap-free global row id
    (monotonically_increasing_id is partition-sparse).

    Two-phase: one tiny job counts rows per partition, the offsets come
    back as a broadcast join, and the rank itself is per-partition — the
    same geometry as the evaluator's range-partitioned cumsum; no
    unpartitioned Window puts all rows through one task.  Requires a
    deterministic source (both jobs must see identical partitioning —
    true for (cached) file scans)."""
    from pyspark.sql import Window
    d = df.withColumn("__pid__", F.spark_partition_id())
    cnts = sorted(d.groupBy("__pid__").count().collect(),
                  key=lambda r: r["__pid__"])
    offs, acc = [], 0
    for r in cnts:
        offs.append((int(r["__pid__"]), acc))
        acc += int(r["count"])
    spark = df.sparkSession
    odf = spark.createDataFrame(offs or [(0, 0)], "__pid__ int, __off__ long")
    w = Window.partitionBy("__pid__").orderBy(F.monotonically_increasing_id())
    return (d.join(F.broadcast(odf), "__pid__")
            .withColumn(out_col, F.row_number().over(w) + F.col("__off__"))
            .drop("__pid__", "__off__"))


def generate_batch_data(df: DataFrame, batch_size: int) -> Iterable[DataFrame]:
    """Re-chunk a bounded table into global batches of ``batch_size``
    (DataStreamUtils.generateBatchData:718) — batch analogue used by the
    online estimators' tests; streaming uses real micro-batches."""
    n = df.count()
    num = max(1, -(-n // batch_size))
    tagged = with_contiguous_id(df, "__seq__") \
        .withColumn("__batch__", F.floor((F.col("__seq__") - 1) / batch_size)) \
        .drop("__seq__")
    for b in range(num):
        yield tagged.filter(F.col("__batch__") == b).drop("__batch__")


def with_broadcast(df: DataFrame, small: DataFrame, on, how: str = "inner") -> DataFrame:
    """Broadcast-join a small table into every task
    (BroadcastUtils.withBroadcastStream:41-110).  No deadlock machinery
    needed: fit already materialized the broadcast side."""
    return df.join(F.broadcast(small), on=on, how=how)


def numpy_block_rdd(df: DataFrame, col: str, parallelism: int | None = None):
    """Cache-ready RDD of one (rows × dim) float64 matrix per partition,
    built Arrow-vectorized (mapInArrow reshapes the list-array value
    buffer; one pickled blob per partition crosses the DF→RDD boundary —
    never a per-row Python object).  This is Spark MLlib's block-cache
    architecture for iterative learners: per-round work becomes
    mapPartitions(numpy) + treeReduce, with no query planning, columnar
    cache decode, or Arrow conversion inside the loop."""
    import pickle

    import pyarrow as pa

    data = df.select(F.col(col).cast("array<double>").alias("__v__"))
    if parallelism:
        parts = data.rdd.getNumPartitions()
        if parts < parallelism:
            data = data.repartition(parallelism)

    def conv(batches):
        mats = []
        for b in batches:
            arr = b.column(0)
            n = len(arr)
            if n == 0:
                continue
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            mats.append(flat.reshape(n, len(flat) // n))
        if mats:
            X = np.vstack(mats)
            yield pa.RecordBatch.from_arrays(
                [pa.array([pickle.dumps(X)])], ["blob"])

    return (data.mapInArrow(conv, "blob binary")
            .rdd.map(lambda r: pickle.loads(bytes(r[0]))))
