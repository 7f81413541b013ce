"""Text/token feature queries vs DuckDB oracles (documents table).

Token convention both sides: lowercase, split on single spaces, drop empty
tokens (reference Tokenizer.java:41 semantics).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..feature import (IDF, CountVectorizer, HashingTF, NGram, RegexTokenizer,
                       StopWordsRemover, Tokenizer)
from ..feature.stopwordsremover import load_default_stop_words
from . import SQL_Q4, load, q4

TOKS_SQL = "list_filter(string_split(lower(text), ' '), t -> t <> '')"


def _tokenized(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return Tokenizer(inputCol="text", outputCol="tokens").transform(docs)[0]


# --- Tokenizer -------------------------------------------------------------

def tokenizer(spark, sf_dir):
    return _tokenized(spark, sf_dir).select(
        "doc_id", F.explode("tokens").alias("token"))


TOKENIZER_SQL = f"SELECT doc_id, unnest({TOKS_SQL}) AS token FROM documents"

# --- RegexTokenizer (letter runs, gaps=False) ------------------------------

def regex_tokenizer(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    t = RegexTokenizer(inputCol="text", outputCol="tokens",
                       pattern="[a-z]+", gaps=False, minTokenLength=2)
    return t.transform(docs)[0].select("doc_id", F.explode("tokens").alias("token"))


REGEX_TOKENIZER_SQL = """
SELECT doc_id, unnest(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
                                  t -> length(t) >= 2)) AS token
FROM documents
"""

# --- NGram (bigrams) -------------------------------------------------------

def ngram(spark, sf_dir):
    toks = _tokenized(spark, sf_dir)
    g = NGram(inputCol="tokens", outputCol="grams", n=2)
    return g.transform(toks)[0].select("doc_id", F.explode("grams").alias("gram"))


NGRAM_SQL = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents)
SELECT doc_id,
       unnest(CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
              ELSE [] END) AS gram
FROM t
"""

# --- StopWordsRemover ------------------------------------------------------

def stop_words_remover(spark, sf_dir):
    toks = _tokenized(spark, sf_dir)
    r = StopWordsRemover(inputCols=["tokens"], outputCols=["filtered"])
    return r.transform(toks)[0].select("doc_id", F.explode("filtered").alias("token"))


def _stopwords_sql():
    words = load_default_stop_words("english")
    lit = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    return f"""
WITH t AS (SELECT doc_id, unnest({TOKS_SQL}) AS token FROM documents)
SELECT doc_id, token FROM t WHERE lower(token) NOT IN ({lit})
"""


STOP_WORDS_SQL = _stopwords_sql()

# --- CountVectorizer -------------------------------------------------------

VOCAB_SIZE = 64

def count_vectorizer(spark, sf_dir):
    toks = _tokenized(spark, sf_dir)
    m = CountVectorizer(inputCol="tokens", outputCol="tf",
                        vocabularySize=VOCAB_SIZE).fit(toks)
    out = m.transform(toks)[0]
    # explode_outer + not-null filter: ONE UDF evaluation (see
    # minhash_signature note — inner explode's pushed size>0 filter would
    # re-run the transform UDF below the Exchange)
    return (out.select("doc_id", F.arrays_zip(F.col("tf")["indices"],
                                              F.col("tf")["values"]).alias("z"))
            .select("doc_id", F.explode_outer("z").alias("e"))
            .filter(F.col("e").isNotNull())
            .select("doc_id", F.col("e")["indices"].alias("term_idx"),
                    F.col("e")["values"].cast("long").alias("cnt")))


COUNT_VECTORIZER_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({TOKS_SQL}) AS term FROM documents),
vocab AS (
  SELECT term, row_number() OVER (ORDER BY count(*) DESC, term ASC) - 1 AS idx
  FROM tok GROUP BY term
  ORDER BY count(*) DESC, term ASC LIMIT {VOCAB_SIZE})
SELECT tok.doc_id, CAST(vocab.idx AS INT) AS term_idx, count(*) AS cnt
FROM tok JOIN vocab ON tok.term = vocab.term
GROUP BY tok.doc_id, vocab.idx
"""

# --- TF-IDF (CountVectorizer → IDF) ----------------------------------------

def tfidf(spark, sf_dir):
    toks = _tokenized(spark, sf_dir)
    cv = CountVectorizer(inputCol="tokens", outputCol="tf",
                         vocabularySize=VOCAB_SIZE).fit(toks)
    # persist the Arrow-UDF output: IDF.fit's single action materializes
    # the cache and the final explode pass reuses it — exactly ONE UDF
    # execution over the corpus (bench/driver clear the cache per query)
    with_tf = cv.transform(toks)[0].persist()
    idf = IDF(inputCol="tf", outputCol="tfidf").fit(with_tf)
    out = idf.transform(with_tf)[0]
    return (out.select("doc_id", F.arrays_zip(F.col("tfidf")["indices"],
                                              F.col("tfidf")["values"]).alias("z"))
            .select("doc_id", F.explode_outer("z").alias("e"))
            .filter(F.col("e").isNotNull())
            .select("doc_id", F.col("e")["indices"].alias("term_idx"),
                    q4(F.col("e")["values"]).alias("w")))


TFIDF_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({TOKS_SQL}) AS term FROM documents),
vocab AS (
  SELECT term, row_number() OVER (ORDER BY count(*) DESC, term ASC) - 1 AS idx
  FROM tok GROUP BY term
  ORDER BY count(*) DESC, term ASC LIMIT {VOCAB_SIZE}),
m AS (SELECT count(*) AS n_docs FROM documents),
tf AS (
  SELECT tok.doc_id, vocab.idx, count(*) AS cnt
  FROM tok JOIN vocab ON tok.term = vocab.term
  GROUP BY tok.doc_id, vocab.idx),
df AS (SELECT idx, count(DISTINCT doc_id) AS d FROM tf GROUP BY idx)
SELECT tf.doc_id, CAST(tf.idx AS INT) AS term_idx,
       {SQL_Q4.format('tf.cnt * ln((n_docs + 1.0) / (df.d + 1.0))')} AS w
FROM tf JOIN df ON tf.idx = df.idx, m
"""

# --- HashingTF (poly hash for cross-engine determinism) --------------------

HTF_FEATURES = 64

def hashing_tf(spark, sf_dir):
    toks = _tokenized(spark, sf_dir)
    t = HashingTF(inputCol="tokens", outputCol="tf",
                  numFeatures=HTF_FEATURES, hashAlgorithm="poly")
    out = t.transform(toks)[0]
    return (out.select("doc_id", F.arrays_zip(F.col("tf")["indices"],
                                              F.col("tf")["values"]).alias("z"))
            .select("doc_id", F.explode_outer("z").alias("e"))
            .filter(F.col("e").isNotNull())
            .select("doc_id", F.col("e")["indices"].alias("idx"),
                    F.col("e")["values"].cast("long").alias("cnt")))


HASHING_TF_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({TOKS_SQL}) AS term FROM documents),
hashed AS (
  SELECT doc_id,
         CAST(list_reduce(
           list_transform(range(1, length(term) + 1),
                          i -> CAST(ascii(substr(term, CAST(i AS INT), 1)) AS BIGINT)),
           (a, b) -> (a * 31 + b) % 2147483647) % {HTF_FEATURES} AS INT) AS idx
  FROM tok)
SELECT doc_id, idx, count(*) AS cnt FROM hashed GROUP BY doc_id, idx
"""


# --- HashingTF → LogisticRegression pipeline (sparse-input acceptance) ------
# The flagship MLlib composition shape: HashingTF emits the sparse struct
# {size, indices, values} and LogisticRegression consumes it directly
# (reference testInputTypeConversion parity, KMeansTest.java:191).

HTF_LR_FEATURES = 16
HTF_LR_ITERS, HTF_LR_LR = 5, 0.5


def hashingtf_logreg(spark, sf_dir):
    from ..classification import LogisticRegression
    toks = _tokenized(spark, sf_dir)
    htf = HashingTF(inputCol="tokens", outputCol="features",
                    numFeatures=HTF_LR_FEATURES, hashAlgorithm="poly",
                    binary=True)
    df = htf.transform(toks)[0].withColumn(
        "label", (F.col("doc_id") % 2).cast("double"))
    m = LogisticRegression(featuresCol="features", labelCol="label",
                           maxIter=HTF_LR_ITERS, learningRate=HTF_LR_LR,
                           tol=0.0, globalBatchSize=1 << 40,
                           weightRounding=12).fit(df)
    out = m.transform(df)[0]
    return out.select("doc_id", q4(F.element_at("rawPrediction", 2)).alias("prob"))


def _hashingtf_logreg_sql() -> str:
    nf, iters, lr = HTF_LR_FEATURES, HTF_LR_ITERS, HTF_LR_LR
    feats = ", ".join(
        f"COALESCE(MAX(CASE WHEN c.idx = {j} THEN 1.0 END), 0.0) AS x{j}"
        for j in range(nf))
    margin = " + ".join(f"w{j} * x{j}" for j in range(nf))
    res = f"1.0/(1.0 + exp(-({margin}))) - y"
    ws = ", ".join(f"w{j}" for j in range(nf))
    zeros = ", ".join("CAST(0 AS DOUBLE)" for _ in range(nf))
    grads = ", ".join(
        f"round(w{j} - {lr} * (SELECT avg(({res}) * x{j}) FROM data), 12)"
        for j in range(nf))
    return f"""
WITH RECURSIVE tok AS (SELECT doc_id, unnest({TOKS_SQL}) AS term FROM documents),
hashed AS (
  SELECT doc_id,
         CAST(list_reduce(
           list_transform(range(1, length(term) + 1),
                          i -> CAST(ascii(substr(term, CAST(i AS INT), 1)) AS BIGINT)),
           (a, b) -> (a * 31 + b) % 2147483647) % {nf} AS INT) AS idx
  FROM tok),
data AS (
  SELECT d.doc_id, {feats}, CAST(d.doc_id % 2 AS DOUBLE) AS y
  FROM documents d LEFT JOIN hashed c ON d.doc_id = c.doc_id
  GROUP BY d.doc_id),
it(i, {ws}) AS (
  SELECT 0, {zeros}
  UNION ALL
  SELECT i + 1, {grads} FROM it WHERE i < {iters}),
w AS (SELECT {ws} FROM it ORDER BY i DESC LIMIT 1)
SELECT doc_id, {SQL_Q4.format(f'1.0/(1.0 + exp(-({margin})))')} AS prob
FROM data, w
"""


HASHINGTF_LOGREG_SQL = _hashingtf_logreg_sql()


QUERIES = {
    "tokenizer": (tokenizer, TOKENIZER_SQL),
    "regex_tokenizer": (regex_tokenizer, REGEX_TOKENIZER_SQL),
    "ngram": (ngram, NGRAM_SQL),
    "stop_words_remover": (stop_words_remover, STOP_WORDS_SQL),
    "count_vectorizer": (count_vectorizer, COUNT_VECTORIZER_SQL),
    "tfidf": (tfidf, TFIDF_SQL),
    "hashing_tf": (hashing_tf, HASHING_TF_SQL),
    "hashingtf_logreg": (hashingtf_logreg, HASHINGTF_LOGREG_SQL),
}
