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
        # r08 head 0: the two engine-parity canaries stay in the cap
        # permanently (cheap drift detectors); the 13 sub-relation probes
        # earned their keep in r07 (all green — the HUGEINT diagnosis is
        # confirmed) and are demoted to sweep-only (VERDICT r07 item 6)
        "canary_engine", "canary_types",
        # r08 head 1: queries whose code changed this round (ALS long-lane
        # fast path; knn's additive fit guard is covered by its r07 row +
        # both-scale sweep + tests — its slot goes to the r03 drain)
        "als", "als_recommend",
        # r08 head 1b: brand-new queries this round
        "cms_token_freq", "hll_registers", "cooccurrence",
        "funnel_conversion", "cohort_retention", "keyword_textrank",
        "cms_heavy_hitters", "ab_proportion_test", "streaming_cardinality",
        "mann_whitney_u", "llm_prep_pipeline_v15", "media_codec_pipeline",
        "gif_frame_sample",
        # r08 head 2: evidence-freshness drain (VERDICT r07 item 1) — the
        # full r03-latest cohort (33 queries; bpe_tokenize rows-only rides
        # along to refresh its rows evidence)
        "online_logistic_regression", "binary_evaluator",
        "asof_join", "range_join",
        "event_windows", "session_windows", "sliding_windows",
        "stateful_sessions", "online_scaler_delayed",
        "streaming_dedup", "streaming_incremental_dedup",
        "hashingtf_logreg", "pca_whiten", "ann_ivf_pq",
        "llm_prep_pipeline", "llm_prep_pipeline_v2",
        "llm_prep_pipeline_v3", "llm_prep_pipeline_v4",
        "incremental_dedup", "minhash_signature", "ngram_jaccard_dedup",
        "dup_spans", "dup_clusters", "dup_keep_best",
        "decontamination", "contamination_score",
        "corpus_stats", "corpus_shuffle", "ngram_profile",
        "gopher_filter", "temperature_mixture",
        "unigram_lm_score", "bigram_lm_score",
        "bpe_tokenize",
        # r08 head 3: oldest of the r04 cohort fills the remaining cap
        # slots (the rest of r04 rotates in r09)
        "naive_bayes", "vector_indexer", "univariate_feature_selector",
        "random_splitter", "regex_tokenizer", "stop_words_remover",
        "hashing_tf", "corr_matrix", "html_extract", "ann_recall",
        "minhash_join_skewsafe", "dup_span_removal", "snapshot_diff",
        "quality_classifier", "incremental_dedup_bucketed",
        "incremental_dedup_bloom", "diversity_profile",
        "calibration_eval", "isotonic_calibration", "metric_anomaly",
        "curriculum_order", "c4_line_filter", "url_normalize",
        "word_blocklist", "pii_ccnum", "stratified_budget",
        "dsir_select", "dsir_bigram", "token_drift",
        "llm_prep_pipeline_v5", "llm_prep_pipeline_v6",
        "llm_prep_pipeline_v7", "llm_prep_pipeline_v8",
        "llm_prep_pipeline_v9", "llm_prep_pipeline_v10",
        "embedding_drift", "char_entropy", "data_profile",
        "constraint_gate", "profile_drift", "frequent_items",
        "streaming_quality_gate", "streaming_drift",
        # everything below has green r05–r07 evidence; registry order
        # follows
    ]
    ordered = {k: out[k] for k in prio if k in out}
    ordered.update(out)
    return ordered


def queries_dict():
    return {k: v[0] for k, v in all_queries().items()}


def oracles_dict():
    return {k: v[1] for k, v in all_queries().items() if v[1] is not None}
