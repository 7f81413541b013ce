"""Query registry backing __spark_entry__ (driver correctness gate).

Each module exports ``QUERIES: dict[name, (spark_fn, oracle_sql | None)]``
where ``spark_fn(spark, sf_dir) -> DataFrame`` demonstrates one operator
from SURVEY §2 and ``oracle_sql`` is equivalent DuckDB SQL over the same
parquet tables.  Conventions (driver compares by column-name-sorted
order-insensitive value hash):

- outputs are scalar columns only (vectors are exploded to rows);
- every float column is quantized with q4() = CAST(ROUND(x*10000) AS
  BIGINT) on BOTH sides, making the hash immune to last-ulp engine
  differences while still checking 4 decimal places;
- aliases match exactly between Spark and SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def q4(col: Column) -> Column:
    """Quantize a double for cross-engine hash comparison."""
    return F.round(col * 10000).cast("long")


SQL_Q4 = "CAST(ROUND(({}) * 10000) AS BIGINT)"


def load(spark, sf_dir: str, *names: str):
    """Read a testdata table; fan a small single-file scan out across the
    cluster's cores.  A tiny parquet (sf0.1 documents is one 1.5 MB file)
    arrives as ONE input split, serializing every downstream stage onto a
    single task; a cheap round-robin repartition unlocks the other cores.
    At production scale inputs are many-file/many-split so the gate never
    fires — this is a small-input fix, not a shuffle in the hot path."""
    cores = spark.sparkContext.defaultParallelism
    out = []
    for n in names:
        path = f"{sf_dir}/{n}.parquet"
        df = spark.read.parquet(path)
        if path not in _SPLIT_CACHE:
            _SPLIT_CACHE[path] = df.rdd.getNumPartitions()
        # only the truly-degenerate case (1-2 input splits on a many-core
        # cluster): a mid-size scan (e.g. 11 splits / 32 cores) overlaps
        # fine across stages, and an unconditional shuffle costs more than
        # it buys — measured 2x regression on the lineitem queries
        if _SPLIT_CACHE[path] <= 2 and cores >= 8:
            df = df.repartition(cores)
        out.append(df)
    return out[0] if len(out) == 1 else out


_SPLIT_CACHE: dict[str, int] = {}


def load_events(spark, sf_dir: str):
    """events.parquet has carried either TIMESTAMP(NANOS) (older testdata,
    read as nanos-long via ``nanosAsLong``) or TIMESTAMP(MICROS) (current,
    read as TIMESTAMP_NTZ).  Branch on the read dtype and expose ``ts_ms``
    (epoch millis, naive-as-UTC to match DuckDB's ``epoch_ms``) plus a
    millis-precision ``ts_t`` timestamp."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if df.schema["ts"].dataType.simpleString() == "bigint":  # nanos-long
        ts_ms = F.expr("ts div 1000000")
    else:  # timestamp / timestamp_ntz at micros precision
        ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    return (df.withColumn("ts_ms", ts_ms)
            .withColumn("ts_t", F.timestamp_millis(F.col("ts_ms"))))


def all_queries():
    from . import (feature_queries, llmdata_queries, ml_queries,
                   probe_queries, streaming_queries, text_queries)
    out = {}
    for mod in (feature_queries, text_queries, ml_queries, llmdata_queries,
                streaming_queries, probe_queries):
        out.update(mod.QUERIES)
    # The driver's correctness run caps at 50 queries per round; order the
    # ones needing fresh evidence first (local tools/check_oracle.py covers
    # the full set every session regardless).
    prio = [
        # r07 head 0: the five r04–r06 driver-red rows, oracles fixed this
        # round (bare sum(int) output columns were DuckDB HUGEINT — the
        # driver's fetch path normalizes HUGEINT unlike Spark's long; all
        # five now CAST to BIGINT; see probe_queries docstring)
        "mutual_information", "conformal_interval", "vocab_growth",
        "cross_validation", "llm_prep_pipeline_v13",
        # r07 head 1: their probe decomposition + engine-parity canaries
        # (VERDICT r06 item 1) — sub-relation bisect if any red survives
        "mi_probe_cells", "mi_probe_marginals",
        "vg_probe_docs", "vg_probe_tokens", "vg_probe_first",
        "conf_probe_calib", "conf_probe_q", "conf_probe_cov",
        "cv_probe_folds", "cv_probe_cell", "v13_probe_labels",
        "canary_engine", "canary_types",
        # r07 head 2: tokenization-parity witness + the last r02-stale
        # cohort (VERDICT r06 item 3; token_count doubles as the
        # tokenizer-divergence probe)
        "token_count", "language_id", "text_quality", "fingerprint",
        # r07 head 3: queries whose code changed this round (tree quantile
        # default, CV pipeline clone, ALS guards, BM25 load fallback)
        "decision_tree", "decision_tree_cls", "random_forest", "gbt",
        "als", "als_recommend", "bm25_incremental", "media_codec_pipeline",
        # r07 head 3b: brand-new queries this round
        "platt_calibration", "decision_tree_splits",
        "llm_prep_pipeline_v14", "quantile_regression",
        "huber_regression",
        # r07 head 4: oldest-evidence rotation (r03 cohort; VERDICT r06
        # item 7) fills the remaining cap slots
        "tokenizer", "tfidf", "count_vectorizer", "kmeans",
        "logistic_regression", "graph_dag", "exact_dedup",
        "minhash_dedup", "simhash_dedup", "line_dedup", "knn",
        "linear_svc", "linear_regression", "online_kmeans",
        "online_standard_scaler",
        # 50-cap boundary is here (positions 0-49 above); the remaining
        # r03 cohort rotates in r08
        "online_logistic_regression",
        "binary_evaluator", "asof_join", "range_join",
        "event_windows", "session_windows", "sliding_windows",
        "pca_whiten", "ann_ivf_pq", "bpe_tokenize", "naive_bayes",
        "chisq_test", "fvalue_test", "one_hot_encoder",
        "stateful_sessions",
        # everything below has green r04–r06 evidence; registry order
        # follows
    ]
    ordered = {k: out[k] for k in prio if k in out}
    ordered.update(out)
    return ordered


def queries_dict():
    return {k: v[0] for k, v in all_queries().items()}


def oracles_dict():
    return {k: v[1] for k, v in all_queries().items() if v[1] is not None}
