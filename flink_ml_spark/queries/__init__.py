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
                   streaming_queries, text_queries)
    out = {}
    for mod in (feature_queries, text_queries, ml_queries, llmdata_queries,
                streaming_queries):
        out.update(mod.QUERIES)
    # The driver's correctness run caps at 50 queries per round; order the
    # ones needing fresh evidence first (local tools/check_oracle.py covers
    # the full set every session regardless).
    prio = [
        # r06 head 0: brand-new this round — zero driver evidence ever
        "cross_validation", "constraint_suggest", "als", "als_recommend",
        "decision_tree", "gbt", "decision_tree_cls", "random_forest",
        "frequent_itemsets", "assoc_rules", "llm_prep_pipeline_v13",
        # r06 head 1: contracts restructured this round to integer-exact
        # outputs (the r05 driver-red trio) — fresh evidence is the whole
        # point of the change
        "mutual_information", "conformal_interval", "vocab_growth",
        # r06 head 2: implementation rewritten/changed this round —
        # sliced AUC composite-key cumsum; the BM25 append-only store and
        # every query that routes through it; the evaluator/encoder
        # guard + string-keying fixes; the JPEG codec leg
        "sliced_auc",
        "bm25_incremental", "bm25_indexed", "bm25_retrieval",
        "hybrid_retrieval", "retrieval_eval", "dedup_recall",
        "multiclass_evaluator", "target_encoding", "rare_collapse",
        "media_codec_pipeline",
        # r06 head 3: ann_ivf's only driver evidence is ROUND 1 (it sat at
        # position 51 in r05's list — VERDICT r05 missing item 2)
        "ann_ivf",
        # r06 head 4: the 28 queries whose latest evidence is round 2 —
        # three rounds stale (VERDICT r05 missing item 3), oldest cohort
        # first
        "media_pipeline", "swing", "minhash_lsh_join", "minhash_lsh_nn",
        "agglomerative", "index_to_string", "string_indexer",
        "feature_hasher", "binarizer", "dct", "polynomial_expansion",
        "anova_test", "embedding_dedup", "embedding_dedup_lsh",
        "ann_bruteforce", "embedding_quantize", "document_chunking",
        "bm25_scoring", "dataflow_pipeline", "repetition_quality",
        "text_normalize", "pii_redaction", "domain_mixture",
        "sequence_packing", "language_id", "text_quality", "token_count",
        "fingerprint",
        # fill to the 50-cap with the most visible r03-latest rows
        "tokenizer", "tfidf", "count_vectorizer", "kmeans",
        "logistic_regression", "graph_dag", "exact_dedup",
        # below the cap: remaining r03 cohort ahead of r04/r05-fresh rows
        "minhash_dedup", "simhash_dedup", "line_dedup", "knn",
        "linear_svc", "linear_regression", "online_kmeans",
        "online_standard_scaler", "online_logistic_regression",
        "binary_evaluator", "asof_join", "range_join", "event_windows",
        "session_windows", "sliding_windows", "pca_whiten", "ann_ivf_pq",
        "bpe_tokenize",
        # everything below has green r04/r05 evidence; registry order follows
    ]
    ordered = {k: out[k] for k in prio if k in out}
    ordered.update(out)
    return ordered


def queries_dict():
    return {k: v[0] for k, v in all_queries().items()}


def oracles_dict():
    return {k: v[1] for k, v in all_queries().items() if v[1] is not None}
