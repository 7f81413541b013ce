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
        # r05 head: the one red r04 row (arithmetic made bit-deterministic
        # this round), then the two queries whose code changed this round,
        # then the brand-new value-level BPE encode gate
        "mutual_information", "semantic_dedup", "bpe_encode", "group_split",
        "llm_prep_pipeline_v11",
        # brand-new this round — zero driver evidence ever
        "regression_evaluator", "multiclass_evaluator", "ks_test",
        "spearman_corr", "paired_ttest", "negative_sampling",
        "hard_negatives", "pagerank", "trustrank", "key_skew", "fuzzy_join",
        "llm_prep_pipeline_v12", "conformal_interval", "psi_drift",
        "target_encoding", "corpus_datasheet", "vocab_growth", "sliced_auc",
        "weighted_sample", "keyness", "winsorize", "rare_collapse",
        # never driver-run, ever (parked behind the 50-cap as family
        # variants in r04 — each gets a first driver round now)
        "profile_quantiles", "profile_by_source", "bm25_indexed",
        # latest driver evidence is ROUND 1 — three rounds stale, and the
        # feature/functions guards landed since (VERDICT r04 item 1)
        "bucketizer", "standard_scaler", "minmax_scaler",
        "maxabs_scaler", "robust_scaler", "normalizer",
        "elementwise_product", "interaction", "vector_slicer",
        "vector_assembler", "imputer", "imputer_median", "kbins_quantile",
        "one_hot_encoder", "kbins_uniform", "variance_threshold",
        "sql_transformer", "ngram", "chisq_test", "fvalue_test", "ann_ivf",
        # r02/r03 evidence + the codec stub boundary changed in r04
        # (VERDICT r04 item 8)
        "media_pipeline", "media_codec_pipeline", "graph_dag",
        # code touched this round (tracking-param anchor / explode_outer /
        # update contracts) — outputs unchanged but evidence should be
        # fresher than the change
        "url_normalize", "diversity_profile", "bm25_incremental",
        # latest driver evidence is round 2 — oldest first
        "feature_hasher", "string_indexer", "binarizer", "dct",
        "polynomial_expansion", "index_to_string", "dataflow_pipeline",
        "anova_test", "swing", "minhash_lsh_join", "minhash_lsh_nn",
        "agglomerative", "bm25_scoring", "embedding_quantize",
        "document_chunking", "embedding_dedup", "embedding_dedup_lsh",
        "ann_bruteforce", "repetition_quality", "text_normalize",
        "pii_redaction", "domain_mixture", "sequence_packing",
        "language_id", "text_quality", "token_count", "fingerprint",
        "bpe_tokenize",
        # everything below has green r03/r04 evidence; registry order follows
    ]
    ordered = {k: out[k] for k in prio if k in out}
    ordered.update(out)
    return ordered


def queries_dict():
    return {k: v[0] for k, v in all_queries().items()}


def oracles_dict():
    return {k: v[1] for k, v in all_queries().items() if v[1] is not None}
