"""Probe decomposition of the five r04–r06 driver-red queries + engine
parity canaries (VERDICT r06 item 1).

Each of the five never-green rows (``mutual_information``,
``conformal_interval``, ``vocab_growth``, ``cross_validation``,
``llm_prep_pipeline_v13``) is decomposed into 2–3 probes hashing strict
sub-relations of its plan, so one driver round bisects WHERE a
divergence enters.  Root cause found while building these (r07): all
five oracles — and only they — emitted a bare ``sum(<integer>)`` output
column, which DuckDB types as HUGEINT; the driver's fetch path
normalizes HUGEINT cells differently from Spark's ``long`` (hash-red
with rows+schema green, immune to every Spark-side contract change).
The oracles now CAST those sums to BIGINT; the probes stay as (a) the
confirmation instrument if the driver still disagrees, and (b) fast
regression tripwires for each sub-relation.

Canaries push fixed constants through every cross-engine construct the
registry relies on (LCG fold hash, negative/large-id modulo, round-half,
floor-of-scaled-unit-hash, whitespace tokenization size, q4 on exact
binary fractions, every output cell type) — a red canary names an
engine-semantics or driver-normalizer gap directly.

All probe outputs are BIGINT/INT/VARCHAR only; every SQL ``sum`` is
CAST to BIGINT (the r07 lesson, now also gated in
tools/check_oracle.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load

# the corpus-prep LCG constants (tuning.fold_column / sampling._unit_hash)
_M = 2147483648
_A = 2654435761


# --- mutual_information probes ----------------------------------------------

def mi_probe_cells(spark, sf_dir):
    """Joint contingency cells only — the single distributed groupBy
    behind MutualInformation, with no driver-side marginal replay."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("c"))


MI_PROBE_CELLS_SQL = """
SELECT lang, source, count(*) AS c FROM documents GROUP BY lang, source
"""


def mi_probe_marginals(spark, sf_dir):
    """Marginals + grand total only (the cells' driver-side fold-up in
    MutualInformation), keyed by lang."""
    from ..stats import MutualInformation
    docs = load(spark, sf_dir, "documents")
    cells = MutualInformation(xCol="lang", yCol="source").transform(docs)[1]
    return (cells.groupBy("lang")
            .agg(F.min("cx").alias("cx"),
                 F.count(F.lit(1)).alias("n_cells"),
                 F.min("n").alias("n")))


MI_PROBE_MARGINALS_SQL = """
WITH j AS (SELECT lang, source, count(*) AS c FROM documents
           GROUP BY lang, source),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM j)
SELECT j.lang, CAST(sum(j.c) AS BIGINT) AS cx,
       count(*) AS n_cells, min(t.n) AS n
FROM j CROSS JOIN tot t GROUP BY j.lang
"""


# --- vocab_growth probes -----------------------------------------------------

def _slice_col(b: int = 10, salt: int = 7):
    from ..llmdata.sampling import _unit_hash
    u = _unit_hash("doc_id", salt)
    return F.least(F.floor(u * b), F.lit(b - 1)).cast("int")


_SLICE_SQL = ("LEAST(CAST(floor((((doc_id % 2147483648) * 2654435761 + 7)"
              " % 2147483648) / 2147483648.0 * 10) AS INT), 9)")


def vg_probe_docs(spark, sf_dir):
    """Per-slice DOCUMENT counts — the LCG slice assignment alone, no
    text touched."""
    docs = load(spark, sf_dir, "documents")
    return (docs.select(_slice_col().alias("slice"))
            .groupBy("slice").agg(F.count(F.lit(1)).alias("n_docs")))


VG_PROBE_DOCS_SQL = f"""
SELECT {_SLICE_SQL} AS slice, count(*) AS n_docs
FROM documents GROUP BY 1
"""


def vg_probe_tokens(spark, sf_dir):
    """Per-slice token totals — slice assignment × tokenizer, no
    first-appearance machinery."""
    from ..llmdata.textanalysis import _tokens
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        _slice_col().alias("slice"),
        F.explode(_tokens(F.coalesce(F.col("text"), F.lit(""))))
        .alias("t"))
    return tok.groupBy("slice").agg(F.count(F.lit(1)).alias("tokens"))


VG_PROBE_TOKENS_SQL = f"""
WITH d AS (SELECT {_SLICE_SQL} AS slice, text FROM documents),
tok AS (SELECT slice,
               unnest(list_filter(string_split(lower(text), ' '),
                                  t -> t <> '')) AS t
        FROM d)
SELECT slice, count(*) AS tokens FROM tok GROUP BY 1
"""


def vg_probe_first(spark, sf_dir):
    """Per-slice first-appearance type counts — the min(slice)-per-type
    aggregation alone (vocab_growth's third stage)."""
    from ..llmdata.textanalysis import _tokens
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        _slice_col().alias("slice"),
        F.explode(_tokens(F.coalesce(F.col("text"), F.lit(""))))
        .alias("t"))
    first = tok.groupBy("t").agg(F.min("slice").alias("slice"))
    return first.groupBy("slice").agg(F.count(F.lit(1)).alias("new_types"))


VG_PROBE_FIRST_SQL = f"""
WITH d AS (SELECT {_SLICE_SQL} AS slice, text FROM documents),
tok AS (SELECT slice,
               unnest(list_filter(string_split(lower(text), ' '),
                                  t -> t <> '')) AS t
        FROM d),
first AS (SELECT t, min(slice) AS slice FROM tok GROUP BY 1)
SELECT slice, count(*) AS new_types FROM first GROUP BY 1
"""


# --- conformal_interval probes ----------------------------------------------

def conf_probe_calib(spark, sf_dir):
    """Calibration split size and the exact integer rank k — the inputs
    to the order statistic, no float touched."""
    li = load(spark, sf_dir, "lineitem")
    n = (li.filter(F.col("l_orderkey") % 5 < 4)
         .agg(F.count(F.lit(1)).alias("n")))
    # k = ceil((n+1)*(1-1/5)) = ((n+1)*4 + 4) // 5, exactly as fit() does
    return n.select("n", F.expr("((n + 1) * 4 + 4) div 5").alias("kk"))


CONF_PROBE_CALIB_SQL = """
SELECT count(*) AS n, ((count(*) + 1) * 4 + 4) // 5 AS kk
FROM lineitem WHERE l_orderkey % 5 < 4
"""


def conf_probe_q(spark, sf_dir):
    """The conformal radius alone (2-dp order-statistic data value,
    reported on the integer grid) — exercises ConformalRegressor.fit's
    distributed k-th-order-statistic path end-to-end."""
    from ..regression import ConformalRegressor
    li = load(spark, sf_dir, "lineitem")
    base = li.select(F.col("l_orderkey").alias("k"),
                     F.col("l_quantity").cast("double").alias("label"),
                     (25.0 + F.col("l_discount") * 100).alias("prediction"))
    model = ConformalRegressor(alpha=0.2, labelCol="label",
                               predictionCol="prediction") \
        .fit(base.filter(F.col("k") % 5 < 4))
    return spark.range(1).select(
        F.round(F.lit(model.model_data["q"]) * 100).cast("long")
        .alias("q_c"))


CONF_PROBE_Q_SQL = """
WITH calib AS (
  SELECT abs((25.0 + l_discount * 100) - CAST(l_quantity AS DOUBLE)) AS s
  FROM lineitem WHERE l_orderkey % 5 < 4),
nk AS (SELECT ((count(*) + 1) * 4 + 4) // 5 AS kk FROM calib),
cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cc FROM (
          SELECT s AS v, count(*) AS c FROM calib GROUP BY 1))
SELECT CAST(ROUND(min(v) * 100) AS BIGINT) AS q_c
FROM cum, nk WHERE cc >= nk.kk
"""


def conf_probe_cov(spark, sf_dir):
    """Held-out group sizes only — the l_orderkey % 5 = 4 slice per
    linestatus, no interval math."""
    li = load(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_orderkey") % 5 == 4)
            .groupBy(F.col("l_linestatus").alias("ls"))
            .agg(F.count(F.lit(1)).alias("n")))


CONF_PROBE_COV_SQL = """
SELECT l_linestatus AS ls, count(*) AS n
FROM lineitem WHERE l_orderkey % 5 = 4 GROUP BY 1
"""


# --- cross_validation probes -------------------------------------------------

def cv_probe_folds(spark, sf_dir):
    """LCG fold sizes over embeddings — the split hash alone."""
    from ..tuning import fold_column
    emb = load(spark, sf_dir, "embeddings")
    return (emb.select(F.col("vec_id").alias("id"))
            .withColumn("fold", fold_column("id", 3, 7))
            .groupBy("fold").agg(F.count(F.lit(1)).alias("n")))


CV_PROBE_FOLDS_SQL = """
WITH eh AS (
  SELECT (((((vec_id % 2147483648) + 2147483648) % 2147483648)
           * 2654435761 + 7) % 2147483648 + 2147483648)
         % 2147483648 AS h
  FROM embeddings)
SELECT CAST(xor(h, h >> 16) % 3 AS INT) AS fold, count(*) AS n
FROM eh GROUP BY 1
"""


def cv_probe_cell(spark, sf_dir):
    """One (param, fold) cell of the CV report: Knn k=5 trained on
    folds≠0, scored on fold 0 — isolates the kNN fit/predict leg from
    the tuner loop."""
    from ..classification import Knn
    from ..tuning import fold_column
    emb = load(spark, sf_dir, "embeddings")
    df = (emb.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("features"),
            F.col("label").cast("double").alias("label"))
          .withColumn("fold", fold_column("id", 3, 7))
          .orderBy("id"))
    train = df.filter(F.col("fold") != 0).drop("fold")
    test = df.filter(F.col("fold") == 0).drop("fold")
    m = Knn(k=5).fit(train)
    scored = m.transform(test)[0]
    return scored.agg(
        F.sum((F.col("label") == F.col("prediction")).cast("long"))
        .alias("n_correct"),
        F.count(F.lit(1)).alias("n"))


CV_PROBE_CELL_SQL = """
WITH eh AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) v, CAST(label AS DOUBLE) y,
         (((((vec_id % 2147483648) + 2147483648) % 2147483648)
           * 2654435761 + 7) % 2147483648 + 2147483648)
         % 2147483648 AS h
  FROM embeddings),
e AS (SELECT vec_id, v, y, CAST(xor(h, h >> 16) % 3 AS INT) AS f
      FROM eh),
nn AS (
  SELECT qid, qy, ny FROM (
    SELECT a.vec_id AS qid, a.y AS qy, b.y AS ny,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_inner_product(a.v, a.v)
                      - 2 * list_inner_product(a.v, b.v)
                      + list_inner_product(b.v, b.v) ASC,
                      b.vec_id ASC) AS rn
    FROM e a JOIN e b ON a.f = 0 AND b.f <> 0)
  WHERE rn <= 5),
votes AS (SELECT qid, qy, ny, count(*) AS c FROM nn GROUP BY ALL),
pred AS (SELECT qid, qy, ny AS pred FROM votes
         QUALIFY row_number() OVER (PARTITION BY qid
                                    ORDER BY c DESC, ny ASC) = 1)
SELECT CAST(sum(CASE WHEN pred = qy THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       count(*) AS n
FROM pred
"""


# --- llm_prep_pipeline_v13 probes --------------------------------------------

def v13_probe_labels(spark, sf_dir):
    """Rule-gate label counts per lang BEFORE the tree — the feature
    derivation (chars, tokens, chars-per-token) and thresholds alone."""
    from ..llmdata.textanalysis import _tokens
    docs = load(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    f1 = F.size(toks).cast("double")
    f2 = F.col("n_chars").cast("double") / (f1 + 1.0)
    label = ((f1 >= 20) & (f1 <= 2000)
             & (f2 >= 3.0) & (f2 <= 12.0)).cast("long")
    return (docs.select("lang", label.alias("pos"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("pos").cast("long").alias("n_pos")))


V13_PROBE_LABELS_SQL = """
WITH b AS (
  SELECT lang,
         CAST(len(list_filter(string_split(lower(text), ' '),
                              t -> t <> '')) AS DOUBLE) AS f1,
         CAST(n_chars AS DOUBLE) AS f0
  FROM documents)
SELECT lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN f1 >= 20 AND f1 <= 2000
                      AND f0 / (f1 + 1.0) >= 3.0
                      AND f0 / (f1 + 1.0) <= 12.0
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
FROM b GROUP BY 1
"""


# --- engine-parity canaries --------------------------------------------------

def canary_engine(spark, sf_dir):
    """Fixed constants through every cross-engine construct the
    registry's contracts rely on: the corpus-prep LCG on small / large /
    boundary ids, sign-safe modulo, floor-of-scaled-unit-hash slice
    assignment, round-half-away-from-zero, q4 on an exact binary
    fraction, and ASCII-whitespace token counts (multi-space collapse,
    NBSP is NOT a separator for either engine).  A red row here names an
    engine-semantics gap directly; green means both engines agree on
    the constructs and any other red is data- or normalizer-side."""
    from ..llmdata.textanalysis import _tokens
    ids = [0, 1, 7, 25, 2147483646, 2147483647, 4294967297, 6942069420]
    texts = ["a b", "a  b", "", " x ", "a b", "one two  three "]
    base = spark.createDataFrame(
        [(i, texts[j % len(texts)]) for j, i in enumerate(ids)],
        "id long, s string")
    inner = ((F.col("id") % _M) + _M) % _M
    h = ((inner * _A + 7) % _M + _M) % _M
    return base.select(
        "id",
        (h % 5).cast("long").alias("lcg_mod5"),
        F.least(F.floor(h / F.lit(float(_M)) * 10), F.lit(9))
        .cast("long").alias("lcg_slice"),
        F.size(_tokens(F.col("s"))).cast("long").alias("n_tok"),
        F.round(F.lit(2.5)).cast("long").alias("r25"),
        F.round(F.lit(-2.5)).cast("long").alias("rm25"),
        F.round(F.lit(0.125) * 10000).cast("long").alias("q4_eighth"))


CANARY_ENGINE_SQL = """
WITH v(j, id) AS (VALUES (0, 0), (1, 1), (2, 7), (3, 25),
                         (4, 2147483646), (5, 2147483647),
                         (6, 4294967297), (7, 6942069420)),
t(j, s) AS (VALUES (0, 'a b'), (1, 'a  b'), (2, ''), (3, ' x '),
                   (4, 'a' || chr(160) || 'b'),
                   (5, 'one two  three ')),
b AS (SELECT v.id, t.s,
             ((((id % 2147483648) + 2147483648) % 2147483648)
              * 2654435761 + 7) % 2147483648 AS h
      FROM v JOIN t ON t.j = v.j % 6)
SELECT id,
       CAST(((h % 2147483648) + 2147483648) % 2147483648 % 5 AS BIGINT)
         AS lcg_mod5,
       CAST(LEAST(floor(((h % 2147483648 + 2147483648) % 2147483648)
                        / 2147483648.0 * 10), 9) AS BIGINT) AS lcg_slice,
       CAST(len(list_filter(string_split(lower(s), ' '), x -> x <> ''))
            AS BIGINT) AS n_tok,
       CAST(ROUND(2.5) AS BIGINT) AS r25,
       CAST(ROUND(-2.5) AS BIGINT) AS rm25,
       CAST(ROUND(0.125 * 10000) AS BIGINT) AS q4_eighth
FROM b
"""


def canary_types(spark, sf_dir):
    """One row per output-cell type the registry emits (int, bigint,
    double integral / fractional / negative, strings with separators,
    empty and non-ASCII text, a CAST-BIGINT sum and a count) — routed
    through createDataFrame + one distributed aggregation, mirroring
    the driver-side replay pattern of the red five.  A red here is a
    driver-normalizer gap, not a query bug."""
    rows = [(1, 10, 2.0, 2.5, -0.25, "plain", "with space"),
            (2, 20, 3.0, -3.5, 0.125, "pipe|pipe", ""),
            (3, 1 << 40, 4.0, 0.0001, -4.0, "αβγ", "tab-less")]
    df = spark.createDataFrame(
        rows, "i int, big long, dint double, dfrac double, dneg double, "
              "s1 string, s2 string")
    from . import q4
    return (df.groupBy("i", "big", "s1", "s2")
            .agg(F.sum("big").cast("long").alias("sum_big"),
                 F.count(F.lit(1)).alias("cnt"),
                 q4(F.min("dint")).alias("q_dint"),
                 q4(F.min("dfrac")).alias("q_dfrac"),
                 q4(F.min("dneg")).alias("q_dneg")))


CANARY_TYPES_SQL = """
WITH v(i, big, dint, dfrac, dneg, s1, s2) AS (VALUES
  (1, 10, 2.0, 2.5, -0.25, 'plain', 'with space'),
  (2, 20, 3.0, -3.5, 0.125, 'pipe|pipe', ''),
  (3, 1099511627776, 4.0, 0.0001, -4.0, 'αβγ', 'tab-less'))
SELECT CAST(i AS INT) AS i, CAST(big AS BIGINT) AS big, s1, s2,
       CAST(sum(big) AS BIGINT) AS sum_big, count(*) AS cnt,
       CAST(ROUND(min(dint) * 10000) AS BIGINT) AS q_dint,
       CAST(ROUND(min(dfrac) * 10000) AS BIGINT) AS q_dfrac,
       CAST(ROUND(min(dneg) * 10000) AS BIGINT) AS q_dneg
FROM v GROUP BY 1, 2, 3, 4
"""


QUERIES = {
    "mi_probe_cells": (mi_probe_cells, MI_PROBE_CELLS_SQL),
    "mi_probe_marginals": (mi_probe_marginals, MI_PROBE_MARGINALS_SQL),
    "vg_probe_docs": (vg_probe_docs, VG_PROBE_DOCS_SQL),
    "vg_probe_tokens": (vg_probe_tokens, VG_PROBE_TOKENS_SQL),
    "vg_probe_first": (vg_probe_first, VG_PROBE_FIRST_SQL),
    "conf_probe_calib": (conf_probe_calib, CONF_PROBE_CALIB_SQL),
    "conf_probe_q": (conf_probe_q, CONF_PROBE_Q_SQL),
    "conf_probe_cov": (conf_probe_cov, CONF_PROBE_COV_SQL),
    "cv_probe_folds": (cv_probe_folds, CV_PROBE_FOLDS_SQL),
    "cv_probe_cell": (cv_probe_cell, CV_PROBE_CELL_SQL),
    "v13_probe_labels": (v13_probe_labels, V13_PROBE_LABELS_SQL),
    "canary_engine": (canary_engine, CANARY_ENGINE_SQL),
    "canary_types": (canary_types, CANARY_TYPES_SQL),
}
