"""Numeric feature-engineering queries vs DuckDB oracles (lineitem/part/
customer tables).  One entry per SURVEY §2.2/2.3 operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..feature import (Binarizer, Bucketizer, Imputer, KBinsDiscretizer,
                       MaxAbsScaler, MinMaxScaler, Normalizer, OneHotEncoder,
                       RobustScaler, SQLTransformer, StandardScaler,
                       StringIndexer, VarianceThresholdSelector,
                       VectorAssembler, VectorSlicer, ElementwiseProduct,
                       Interaction)
from . import SQL_Q4, load, q4

KEY = ["l_orderkey", "l_linenumber"]
NUM4 = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _assembled(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    va = VectorAssembler(inputCols=NUM4, outputCol="features",
                         inputSizes=[1, 1, 1, 1])
    return va.transform(li)[0]


def _explode4(df, col, prefix):
    cols = [F.col(k) for k in KEY]
    cols += [q4(F.element_at(F.col(col), i + 1)).alias(f"{prefix}{i}")
             for i in range(4)]
    return df.select(*cols)


# --- Binarizer -------------------------------------------------------------

def binarizer(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    b = Binarizer(inputCols=["l_quantity", "l_discount"],
                  outputCols=["qty_bin", "disc_bin"], thresholds=[25.0, 0.05])
    return b.transform(li)[0].select(*KEY, "qty_bin", "disc_bin")


BINARIZER_SQL = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity > 25.0 THEN 1.0 ELSE 0.0 END AS qty_bin,
       CASE WHEN l_discount > 0.05 THEN 1.0 ELSE 0.0 END AS disc_bin
FROM lineitem
"""

# --- Bucketizer ------------------------------------------------------------

_SPLITS = [0.0, 10000.0, 30000.0, 60000.0, 100000.0]


def bucketizer(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    b = Bucketizer(inputCols=["l_extendedprice"], outputCols=["price_bucket"],
                   splitsArray=[_SPLITS], handleInvalid="keep")
    return b.transform(li)[0].select(*KEY, "price_bucket")


BUCKETIZER_SQL = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_extendedprice >= 0.0 AND l_extendedprice < 10000.0 THEN 0.0
            WHEN l_extendedprice >= 10000.0 AND l_extendedprice < 30000.0 THEN 1.0
            WHEN l_extendedprice >= 30000.0 AND l_extendedprice < 60000.0 THEN 2.0
            WHEN l_extendedprice >= 60000.0 AND l_extendedprice <= 100000.0 THEN 3.0
            ELSE 4.0 END AS price_bucket
FROM lineitem
"""

# --- StandardScaler --------------------------------------------------------

def standard_scaler(spark, sf_dir):
    df = _assembled(spark, sf_dir)
    m = StandardScaler(inputCol="features", outputCol="scaled",
                       withMean=True, withStd=True).fit(df)
    return _explode4(m.transform(df)[0], "scaled", "s")


STANDARD_SCALER_SQL = f"""
WITH stats AS (
  SELECT avg(l_quantity) m0, stddev_samp(l_quantity) s0,
         avg(l_extendedprice) m1, stddev_samp(l_extendedprice) s1,
         avg(l_discount) m2, stddev_samp(l_discount) s2,
         avg(l_tax) m3, stddev_samp(l_tax) s3
  FROM lineitem)
SELECT l_orderkey, l_linenumber,
       {SQL_Q4.format('(l_quantity - m0) / s0')} AS s0,
       {SQL_Q4.format('(l_extendedprice - m1) / s1')} AS s1,
       {SQL_Q4.format('(l_discount - m2) / s2')} AS s2,
       {SQL_Q4.format('(l_tax - m3) / s3')} AS s3
FROM lineitem, stats
"""

# --- MinMaxScaler ----------------------------------------------------------

def minmax_scaler(spark, sf_dir):
    df = _assembled(spark, sf_dir)
    m = MinMaxScaler(inputCol="features", outputCol="scaled").fit(df)
    return _explode4(m.transform(df)[0], "scaled", "s")


MINMAX_SCALER_SQL = f"""
WITH stats AS (
  SELECT min(l_quantity) mn0, max(l_quantity) mx0,
         min(l_extendedprice) mn1, max(l_extendedprice) mx1,
         min(l_discount) mn2, max(l_discount) mx2,
         min(l_tax) mn3, max(l_tax) mx3
  FROM lineitem)
SELECT l_orderkey, l_linenumber,
       {SQL_Q4.format('(l_quantity - mn0) * ((1.0 - 0.0) / (mx0 - mn0)) + 0.0')} AS s0,
       {SQL_Q4.format('(l_extendedprice - mn1) * ((1.0 - 0.0) / (mx1 - mn1)) + 0.0')} AS s1,
       {SQL_Q4.format('(l_discount - mn2) * ((1.0 - 0.0) / (mx2 - mn2)) + 0.0')} AS s2,
       {SQL_Q4.format('(l_tax - mn3) * ((1.0 - 0.0) / (mx3 - mn3)) + 0.0')} AS s3
FROM lineitem, stats
"""

# --- MaxAbsScaler ----------------------------------------------------------

def maxabs_scaler(spark, sf_dir):
    df = _assembled(spark, sf_dir)
    m = MaxAbsScaler(inputCol="features", outputCol="scaled").fit(df)
    return _explode4(m.transform(df)[0], "scaled", "s")


MAXABS_SCALER_SQL = f"""
WITH stats AS (
  SELECT max(abs(l_quantity)) a0, max(abs(l_extendedprice)) a1,
         max(abs(l_discount)) a2, max(abs(l_tax)) a3
  FROM lineitem)
SELECT l_orderkey, l_linenumber,
       {SQL_Q4.format('l_quantity * (1.0 / a0)')} AS s0,
       {SQL_Q4.format('l_extendedprice * (1.0 / a1)')} AS s1,
       {SQL_Q4.format('l_discount * (1.0 / a2)')} AS s2,
       {SQL_Q4.format('l_tax * (1.0 / a3)')} AS s3
FROM lineitem, stats
"""

# --- RobustScaler (exact percentiles for the oracle path) ------------------

def robust_scaler(spark, sf_dir):
    df = _assembled(spark, sf_dir)
    m = RobustScaler(inputCol="features", outputCol="scaled",
                     withCentering=True, relativeError=0.0).fit(df)
    return _explode4(m.transform(df)[0], "scaled", "s")


def _robust_sql():
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    stats = ", ".join(
        f"quantile_cont({c}, 0.5) med{i}, quantile_cont({c}, 0.75) - quantile_cont({c}, 0.25) rng{i}"
        for i, c in enumerate(cols))
    outs = ", ".join(
        SQL_Q4.format(f"({c} - med{i}) * (CASE WHEN rng{i} <> 0 THEN 1.0 / rng{i} ELSE 1.0 END)")
        + f" AS s{i}" for i, c in enumerate(cols))
    return f"WITH stats AS (SELECT {stats} FROM lineitem)\nSELECT l_orderkey, l_linenumber, {outs} FROM lineitem, stats"


ROBUST_SCALER_SQL = _robust_sql()

# --- Normalizer ------------------------------------------------------------

def normalizer(spark, sf_dir):
    df = _assembled(spark, sf_dir)
    n = Normalizer(inputCol="features", outputCol="norm", p=2.0)
    return _explode4(n.transform(df)[0], "norm", "n")


_NORM_EXPR = "sqrt(l_quantity*l_quantity + l_extendedprice*l_extendedprice + l_discount*l_discount + l_tax*l_tax)"
NORMALIZER_SQL = f"""
SELECT l_orderkey, l_linenumber,
       {SQL_Q4.format(f'l_quantity / ({_NORM_EXPR})')} AS n0,
       {SQL_Q4.format(f'l_extendedprice / ({_NORM_EXPR})')} AS n1,
       {SQL_Q4.format(f'l_discount / ({_NORM_EXPR})')} AS n2,
       {SQL_Q4.format(f'l_tax / ({_NORM_EXPR})')} AS n3
FROM lineitem
"""

# --- ElementwiseProduct ----------------------------------------------------

def elementwise_product(spark, sf_dir):
    df = _assembled(spark, sf_dir)
    t = ElementwiseProduct(inputCol="features", outputCol="o",
                           scalingVec=[2.0, 0.001, 100.0, -1.0])
    return _explode4(t.transform(df)[0], "o", "e")


ELEMENTWISE_SQL = f"""
SELECT l_orderkey, l_linenumber,
       {SQL_Q4.format('l_quantity * 2.0')} AS e0,
       {SQL_Q4.format('l_extendedprice * 0.001')} AS e1,
       {SQL_Q4.format('l_discount * 100.0')} AS e2,
       {SQL_Q4.format('l_tax * -1.0')} AS e3
FROM lineitem
"""

# --- Interaction -----------------------------------------------------------

def interaction(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    t = Interaction(inputCols=["l_quantity", "l_discount"], outputCol="o")
    out = t.transform(li)[0]
    return out.select(*KEY, q4(F.element_at("o", 1)).alias("i0"))


INTERACTION_SQL = f"""
SELECT l_orderkey, l_linenumber, {SQL_Q4.format('l_quantity * l_discount')} AS i0
FROM lineitem
"""

# --- VectorSlicer ----------------------------------------------------------

def vector_slicer(spark, sf_dir):
    df = _assembled(spark, sf_dir)
    t = VectorSlicer(inputCol="features", outputCol="sliced", indices=[2, 0])
    out = t.transform(df)[0]
    return out.select(*KEY, q4(F.element_at("sliced", 1)).alias("v0"),
                      q4(F.element_at("sliced", 2)).alias("v1"))


VECTOR_SLICER_SQL = f"""
SELECT l_orderkey, l_linenumber,
       {SQL_Q4.format('l_discount')} AS v0, {SQL_Q4.format('l_quantity')} AS v1
FROM lineitem
"""

# --- VectorAssembler (skip mode with injected invalids) --------------------

def vector_assembler(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    df = li.withColumn("qty_n", F.when(F.col("l_quantity") > 45, None)
                       .otherwise(F.col("l_quantity")))
    va = VectorAssembler(inputCols=["qty_n", "l_tax"], outputCol="v",
                         inputSizes=[1, 1], handleInvalid="skip")
    out = va.transform(df)[0]
    return out.select(*KEY, q4(F.element_at("v", 1)).alias("v0"),
                      q4(F.element_at("v", 2)).alias("v1"))


VECTOR_ASSEMBLER_SQL = f"""
SELECT l_orderkey, l_linenumber,
       {SQL_Q4.format('l_quantity')} AS v0, {SQL_Q4.format('l_tax')} AS v1
FROM lineitem WHERE l_quantity <= 45
"""

# --- Imputer (mean over injected nulls) ------------------------------------

def imputer(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    df = li.withColumn("disc_n", F.when(F.col("l_discount") < 0.02, None)
                       .otherwise(F.col("l_discount")))
    m = Imputer(inputCols=["disc_n"], outputCols=["disc_i"],
                strategy="mean").fit(df)
    return m.transform(df)[0].select(*KEY, q4(F.col("disc_i")).alias("disc_i"))


IMPUTER_SQL = f"""
WITH base AS (
  SELECT *, CASE WHEN l_discount < 0.02 THEN NULL ELSE l_discount END AS disc_n
  FROM lineitem),
s AS (SELECT avg(disc_n) m FROM base)
SELECT l_orderkey, l_linenumber,
       {SQL_Q4.format('COALESCE(disc_n, m)')} AS disc_i
FROM base, s
"""

def imputer_median(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    df = li.withColumn("qty_n", F.when(F.col("l_quantity") > 45, None)
                       .otherwise(F.col("l_quantity")))
    m = Imputer(inputCols=["qty_n"], outputCols=["qty_i"],
                strategy="median", relativeError=0.0).fit(df)
    return m.transform(df)[0].select(*KEY, q4(F.col("qty_i")).alias("qty_i"))


IMPUTER_MEDIAN_SQL = f"""
WITH base AS (
  SELECT *, CASE WHEN l_quantity > 45 THEN NULL ELSE l_quantity END AS qty_n
  FROM lineitem),
s AS (SELECT quantile_cont(qty_n, 0.5) m FROM base)
SELECT l_orderkey, l_linenumber,
       {SQL_Q4.format('COALESCE(qty_n, m)')} AS qty_i
FROM base, s
"""


def kbins_quantile(spark, sf_dir):
    """Quantile strategy with exact percentiles (relativeError=0; the GK
    sketch with relativeError>0 remains the 100 TB path)."""
    li = load(spark, sf_dir, "lineitem")
    df = li.select(*KEY, F.array(F.col("l_quantity"),
                                 F.col("l_extendedprice")).alias("v"))
    m = KBinsDiscretizer(inputCol="v", outputCol="bins", strategy="quantile",
                         numBins=4, relativeError=0.0).fit(df)
    out = m.transform(df)[0]
    return out.select(*KEY, F.element_at("bins", 1).alias("qty_bin"),
                      F.element_at("bins", 2).alias("price_bin"))


def _kbins_quantile_sql() -> str:
    def bins(col: str, out: str) -> str:
        return (f"CASE WHEN {col} < q_{col}[2] THEN 0.0 "
                f"WHEN {col} < q_{col}[3] THEN 1.0 "
                f"WHEN {col} < q_{col}[4] THEN 2.0 ELSE 3.0 END AS {out}")
    return f"""
WITH s AS (
  SELECT quantile_cont(l_quantity, [0, 0.25, 0.5, 0.75, 1]) q_l_quantity,
         quantile_cont(l_extendedprice, [0, 0.25, 0.5, 0.75, 1]) q_l_extendedprice
  FROM lineitem)
SELECT l_orderkey, l_linenumber,
       {bins('l_quantity', 'qty_bin')}, {bins('l_extendedprice', 'price_bin')}
FROM lineitem, s
"""


KBINS_QUANTILE_SQL = _kbins_quantile_sql()

# --- StringIndexer (freqDesc, ties by value asc) ---------------------------

def string_indexer(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    m = StringIndexer(inputCols=["p_brand"], outputCols=["brand_idx"],
                      stringOrderType="freqDesc").fit(part)
    return m.transform(part)[0].select("p_partkey", "brand_idx")


STRING_INDEXER_SQL = """
WITH vocab AS (
  SELECT p_brand v, row_number() OVER (ORDER BY count(*) DESC, p_brand ASC) - 1 AS idx
  FROM part GROUP BY p_brand)
SELECT p_partkey, CAST(idx AS DOUBLE) AS brand_idx
FROM part JOIN vocab ON part.p_brand = vocab.v
"""

# --- OneHotEncoder (index col = c_nationkey) -------------------------------

def one_hot_encoder(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    m = OneHotEncoder(inputCols=["c_nationkey"], outputCols=["nation_vec"]).fit(cust)
    out = m.transform(cust)[0]
    return out.select(
        "c_custkey",
        F.col("nation_vec")["size"].alias("vec_size"),
        F.coalesce(F.try_element_at(F.col("nation_vec")["indices"], F.lit(1)), F.lit(-1)).alias("active_idx"))


ONE_HOT_SQL = """
WITH s AS (SELECT max(c_nationkey) + 1 AS arity FROM customer)
SELECT c_custkey, CAST(arity - 1 AS INT) AS vec_size,
       CAST(CASE WHEN c_nationkey < arity - 1 THEN c_nationkey ELSE -1 END AS INT) AS active_idx
FROM customer, s
"""

# --- KBinsDiscretizer (uniform) --------------------------------------------

def kbins_uniform(spark, sf_dir):
    df = _assembled(spark, sf_dir)
    m = KBinsDiscretizer(inputCol="features", outputCol="bins",
                         strategy="uniform", numBins=5).fit(df)
    out = m.transform(df)[0]
    return out.select(*KEY, F.element_at("bins", 2).alias("price_bin"))


KBINS_SQL = """
WITH s AS (SELECT min(l_extendedprice) mn, max(l_extendedprice) mx FROM lineitem),
edges AS (SELECT mn, mx, (mx - mn) / 5 w,
                 mn + 1*(mx-mn)/5 e1, mn + 2*(mx-mn)/5 e2,
                 mn + 3*(mx-mn)/5 e3, mn + 4*(mx-mn)/5 e4 FROM s)
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_extendedprice < e1 THEN 0.0
            WHEN l_extendedprice < e2 THEN 1.0
            WHEN l_extendedprice < e3 THEN 2.0
            WHEN l_extendedprice < e4 THEN 3.0
            ELSE 4.0 END AS price_bin
FROM lineitem, edges
"""

# --- VarianceThresholdSelector --------------------------------------------

def variance_threshold(spark, sf_dir):
    df = _assembled(spark, sf_dir)
    m = VarianceThresholdSelector(inputCol="features", outputCol="sel",
                                  ).set_(varianceThreshold=1.0).fit(df)
    out = m.transform(df)[0]
    return (out.select(*KEY, F.posexplode("sel").alias("dim", "val"))
            .select(*KEY, "dim", q4(F.col("val")).alias("val")))


def _vts_sql():
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    selects = []
    for i, c in enumerate(cols):
        selects.append(
            f"SELECT l_orderkey, l_linenumber, "
            f"(SELECT count(*) FROM (SELECT 1 FROM kept WHERE ki < {i})) AS dim, "
            f"{SQL_Q4.format(c)} AS val FROM lineitem "
            f"WHERE (SELECT var_samp({c}) FROM lineitem) > 1.0")
    kept = " UNION ALL ".join(
        f"SELECT {i} ki FROM (SELECT var_samp({c}) v FROM lineitem) WHERE v > 1.0"
        for i, c in enumerate(cols))
    return f"WITH kept AS ({kept})\n" + " UNION ALL ".join(selects)


VARIANCE_THRESHOLD_SQL = _vts_sql()

# --- SQLTransformer --------------------------------------------------------

def sql_transformer(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    t = SQLTransformer(statement="""
        SELECT l_orderkey, l_linenumber,
               CAST(ROUND(ABS(l_discount - 0.05) * 10000) AS BIGINT) AS v
        FROM __THIS__""")
    return t.transform(li)[0]


SQL_TRANSFORMER_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(ABS(l_discount - 0.05) * 10000) AS BIGINT) AS v
FROM lineitem
"""


# --- DCT (orthonormal DCT-II, dim 4 closed form) ----------------------------

_DCT_X = ["l_quantity / 50", "l_extendedprice / 100000", "l_discount * 10",
          "l_tax * 10"]


def dct(spark, sf_dir):
    from ..feature import DCT
    li = load(spark, sf_dir, "lineitem")
    df = li.select(
        *KEY,
        F.array(F.col("l_quantity") / 50, F.col("l_extendedprice") / 100000,
                F.col("l_discount") * 10, F.col("l_tax") * 10).alias("v"))
    out = DCT(inputCol="v", outputCol="y").transform(df)[0]
    # +1e-6 inside the quantization: DCT row k=2 degenerates to the rational
    # 0.5*(x0-x1-x2+x3) on decimal inputs, so outputs land EXACTLY on .5
    # rounding ties where engine float noise flips the direction; the
    # epsilon (>> 1e-12 noise, << 1e-4 grid) breaks ties identically
    return out.select(*KEY, *[
        F.round(F.element_at("y", i + 1) * 10000 + F.lit(1e-6)).cast("long")
        .alias(f"y{i}") for i in range(4)])


def _dct_sql() -> str:
    xs = ", ".join(f"CAST({x} AS DOUBLE) AS x{i}" for i, x in enumerate(_DCT_X))
    outs = ["0.5 * (x0 + x1 + x2 + x3)"]
    for k_ in range(1, 4):
        terms = " + ".join(f"x{n_} * cos(pi() * {2 * n_ + 1} * {k_} / 8.0)"
                           for n_ in range(4))
        outs.append(f"sqrt(0.5) * ({terms})")
    sel = ", ".join(
        f"CAST(ROUND(({o}) * 10000 + 1e-6) AS BIGINT) AS y{k_}"
        for k_, o in enumerate(outs))
    return f"""
WITH d AS (SELECT l_orderkey, l_linenumber, {xs} FROM lineitem)
SELECT l_orderkey, l_linenumber, {sel} FROM d
"""


DCT_SQL = _dct_sql()

# --- FeatureHasher (poly hash, categorical + numeric, collisions sum) -------

_FH_N = 128
_POLY_SQL = ("CAST(list_reduce(list_transform(range(1, length({s}) + 1), "
             "i -> CAST(ascii(substr({s}, CAST(i AS INT), 1)) AS BIGINT)), "
             "(a, b) -> (a * 31 + b) % 2147483647) % " + str(_FH_N)
             + " AS INT)")


def feature_hasher(spark, sf_dir):
    from ..feature import FeatureHasher
    li = load(spark, sf_dir, "lineitem")
    fh = FeatureHasher(inputCols=["l_returnflag", "l_linestatus", "l_quantity",
                                  "l_discount"],
                       categoricalCols=["l_returnflag", "l_linestatus"],
                       outputCol="fh", numFeatures=_FH_N, hashAlgorithm="poly")
    out = fh.transform(li)[0]
    # global per-bucket histogram: (l_orderkey, l_linenumber) is NOT unique
    # in the synthetic data, so per-row keyed output can't be compared
    # against a grouped oracle — the global sum checks the same hash +
    # collision-accumulate semantics
    return (out.select(F.arrays_zip(F.col("fh")["indices"],
                                    F.col("fh")["values"]).alias("z"))
            .select(F.explode("z").alias("e"))
            .select(F.col("e")["indices"].alias("idx"),
                    F.col("e")["values"].alias("v"))
            .groupBy("idx").agg(q4(F.sum("v")).alias("val")))


def _feature_hasher_sql() -> str:
    from ..common.hashing import poly_hash31
    cat = " UNION ALL ".join(
        "SELECT l_orderkey, l_linenumber, "
        + _POLY_SQL.format(s=f"'{c}=' || {c}") + " AS idx, 1.0 AS v FROM lineitem"
        for c in ("l_returnflag", "l_linestatus"))
    num = " UNION ALL ".join(
        f"SELECT l_orderkey, l_linenumber, {poly_hash31(c) % _FH_N} AS idx, "
        f"CAST({c} AS DOUBLE) AS v FROM lineitem"
        for c in ("l_quantity", "l_discount"))
    return f"""
WITH entries AS ({cat} UNION ALL {num})
SELECT idx, {SQL_Q4.format('sum(v)')} AS val
FROM entries GROUP BY idx
"""


FEATURE_HASHER_SQL = _feature_hasher_sql()

# --- PolynomialExpansion (degree 2, dim 2 → [b, b², a, ab, a²]) -------------

def polynomial_expansion(spark, sf_dir):
    from ..feature import PolynomialExpansion
    li = load(spark, sf_dir, "lineitem")
    df = li.select(*KEY, F.array(F.col("l_discount") * 10,
                                 F.col("l_tax") * 10).alias("v"))
    out = PolynomialExpansion(inputCol="v", outputCol="p", degree=2).transform(df)[0]
    return out.select(*KEY, *[q4(F.element_at("p", i + 1)).alias(f"p{i}")
                              for i in range(5)])


POLYNOMIAL_EXPANSION_SQL = f"""
WITH d AS (SELECT l_orderkey, l_linenumber, l_discount * 10 AS a, l_tax * 10 AS b
           FROM lineitem)
SELECT l_orderkey, l_linenumber,
       {SQL_Q4.format('b')} AS p0, {SQL_Q4.format('b * b')} AS p1,
       {SQL_Q4.format('a')} AS p2, {SQL_Q4.format('a * b')} AS p3,
       {SQL_Q4.format('a * a')} AS p4
FROM d
"""

# --- StringIndexer → IndexToString round trip --------------------------------

def index_to_string(spark, sf_dir):
    from ..feature import IndexToStringModel
    li = load(spark, sf_dir, "lineitem")
    si = StringIndexer(inputCols=["l_returnflag"], outputCols=["rf_idx"],
                       stringOrderType="freqDesc").fit(li)
    indexed = si.transform(li)[0]
    its = IndexToStringModel(inputCols=["rf_idx"], outputCols=["rf_back"])
    its.set_model_data_arrays(si.model_data["stringArrays"])
    return its.transform(indexed)[0].select(*KEY, "rf_back")


INDEX_TO_STRING_SQL = """
SELECT l_orderkey, l_linenumber, l_returnflag AS rf_back FROM lineitem
"""

# --- VectorIndexer (linenumber categorical, quantity passthrough) -----------

def vector_indexer(spark, sf_dir):
    from ..feature import VectorIndexer
    li = load(spark, sf_dir, "lineitem")
    df = li.select(*KEY, F.array(F.col("l_linenumber").cast("double"),
                                 F.col("l_quantity")).alias("v"))
    m = VectorIndexer(inputCol="v", outputCol="iv", maxCategories=10).fit(df)
    out = m.transform(df)[0]
    return out.select(*KEY, q4(F.element_at("iv", 1)).alias("v0"),
                      q4(F.element_at("iv", 2)).alias("v1"))


VECTOR_INDEXER_SQL = f"""
WITH m AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS idx
           FROM (SELECT DISTINCT CAST(l_linenumber AS DOUBLE) AS v FROM lineitem))
SELECT l_orderkey, l_linenumber,
       {SQL_Q4.format('m.idx')} AS v0, {SQL_Q4.format('l_quantity')} AS v1
FROM lineitem JOIN m ON CAST(l_linenumber AS DOUBLE) = m.v
"""

# --- UnivariateFeatureSelector (ANOVA, top-2 of 4 continuous dims) ----------

_UFS_X = ["l_quantity / 50", "l_extendedprice / 100000", "l_discount * 10",
          "l_tax * 10"]
_UFS_LABEL = ("CASE WHEN l_returnflag = 'A' THEN 0.0 "
              "WHEN l_returnflag = 'F' THEN 1.0 ELSE 2.0 END")


def univariate_feature_selector(spark, sf_dir):
    from ..feature import UnivariateFeatureSelector
    li = load(spark, sf_dir, "lineitem")
    df = li.select(
        *KEY,
        F.array(F.col("l_quantity") / 50, F.col("l_extendedprice") / 100000,
                F.col("l_discount") * 10, F.col("l_tax") * 10).alias("features"),
        F.when(F.col("l_returnflag") == "A", 0.0)
        .when(F.col("l_returnflag") == "F", 1.0).otherwise(2.0).alias("label"))
    m = UnivariateFeatureSelector(
        featuresCol="features", labelCol="label", outputCol="sel",
        featureType="continuous", labelType="categorical",
        selectionMode="numTopFeatures", selectionThreshold=2).fit(df)
    out = m.transform(df)[0]
    return out.select(*KEY, q4(F.element_at("sel", 1)).alias("s0"),
                      q4(F.element_at("sel", 2)).alias("s1"))


def _ufs_sql() -> str:
    # per-dim one-way ANOVA F; equal dofs across dims → p-value rank ==
    # F-desc rank; selected indices output in ascending-index order
    unions = " UNION ALL ".join(
        f"SELECT {i} AS fi, CAST({x} AS DOUBLE) AS x, {_UFS_LABEL} AS y FROM lineitem"
        for i, x in enumerate(_UFS_X))
    xs = ", ".join(f"CAST({x} AS DOUBLE) AS x{i}" for i, x in enumerate(_UFS_X))
    case0 = "CASE (SELECT fi FROM sel WHERE rn = 1) " + " ".join(
        f"WHEN {i} THEN x{i}" for i in range(4)) + " END"
    case1 = "CASE (SELECT fi FROM sel WHERE rn = 2) " + " ".join(
        f"WHEN {i} THEN x{i}" for i in range(4)) + " END"
    return f"""
WITH ex AS ({unions}),
g AS (SELECT fi, y, CAST(count(*) AS DOUBLE) n, sum(x) s, sum(x * x) ss
      FROM ex GROUP BY fi, y),
f AS (SELECT fi, sum(n) n, count(*) k, sum(s) ts, sum(ss) tss,
             sum(s * s / n) AS sb FROM g GROUP BY fi),
stats AS (SELECT fi, (sb - ts * ts / n) / (k - 1)
                     / ((tss - sb) / (n - k)) AS fv FROM f),
sel AS (SELECT fi, row_number() OVER (ORDER BY fi) AS rn
        FROM (SELECT fi FROM stats ORDER BY fv DESC, fi ASC LIMIT 2)),
d AS (SELECT l_orderkey, l_linenumber, {xs} FROM lineitem)
SELECT l_orderkey, l_linenumber,
       {SQL_Q4.format(case0)} AS s0, {SQL_Q4.format(case1)} AS s1
FROM d
"""


UFS_SQL = _ufs_sql()

# --- RandomSplitter (seeded Bernoulli split; per-row assignment is
#     engine-RNG-specific → rows-only: total rows & schema are stable) -------

def random_splitter(spark, sf_dir):
    from ..feature import RandomSplitter
    li = load(spark, sf_dir, "lineitem")
    df = li.withColumn("__k__", F.col("l_orderkey") * 8 + F.col("l_linenumber"))
    splits = RandomSplitter(weights=[0.8, 0.2], seed=42,
                            splitStrategy="hash", hashCol="__k__").transform(df)
    parts = [s.select(*KEY, F.lit(i).alias("split")) for i, s in enumerate(splits)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


RANDOM_SPLITTER_SQL = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN ((l_orderkey * 8 + l_linenumber) * 2654435761 + 42)
                 % 2147483648 / 2147483648.0 < 0.8
            THEN 0 ELSE 1 END AS split
FROM lineitem
"""


def group_split(spark, sf_dir):
    """Leakage-safe train/eval GROUP split: RandomSplitter
    (splitStrategy='hash') on a STRING key — the poly-hash keying puts
    every document of a pseudo-domain in the SAME split, so near-dups
    from one site can never straddle train/eval (the contamination
    hazard row-level splitting invites; deduplicate-then-split per Lee
    et al. 2022).  Pure row function, zero shuffle; the oracle replays
    poly-hash + threshold exactly."""
    from ..feature import RandomSplitter
    docs = load(spark, sf_dir, "documents")
    df = docs.withColumn(
        "domain", F.concat(F.col("source"), F.lit("-"),
                           (F.col("doc_id") % 40).cast("string")))
    tr, ev = RandomSplitter(weights=[4.0, 1.0], seed=7,
                            splitStrategy="hash",
                            hashCol="domain").transform(df)
    return (tr.select("doc_id", "domain", F.lit(0).alias("split"))
            .unionAll(ev.select("doc_id", "domain",
                                F.lit(1).alias("split"))))


# cross-engine polynomial string hash — the llmdata TOKHASH twin
_POLY = ("list_reduce(list_transform(range(1, length({t}) + 1), "
         "i -> CAST(ascii(substr({t}, CAST(i AS INT), 1)) AS BIGINT)), "
         "(a, b) -> (a * 31 + b) % 2038074743)")

GROUP_SPLIT_SQL = f"""
WITH d AS (SELECT doc_id,
                  source || '-' || CAST(doc_id % 40 AS VARCHAR) AS domain
           FROM documents),
h AS (SELECT doc_id, domain, {_POLY.format(t='domain')} AS hk FROM d)
SELECT doc_id, domain,
       CASE WHEN (hk * 2654435761 + 7) % 2147483648 / 2147483648.0 < 0.8
            THEN 0 ELSE 1 END AS split
FROM h
"""


def graph_dag(spark, sf_dir):
    """GraphBuilder fan-out DAG: one assembled input feeds TWO estimator
    nodes (StandardScaler, MinMaxScaler); the GraphModel returns both
    outputs, joined on the lineitem key.  Driver-green coverage for
    Graph/GraphBuilder/GraphModel (reference ml/builder/GraphBuilder.java:39,
    Graph.java:153, GraphModel.java:50)."""
    from ..graph import GraphBuilder
    df = _assembled(spark, sf_dir)
    b = GraphBuilder()
    t0 = b.new_table_id()
    (t1,) = b.add_estimator(
        StandardScaler(inputCol="features", outputCol="std",
                       withMean=True, withStd=True), [t0])
    (t2,) = b.add_estimator(MinMaxScaler(inputCol="features", outputCol="mm"),
                            [t0])
    model = b.build_estimator([t0], [t1, t2]).fit(df)
    std_df, mm_df = model.transform(df)
    # no key subset is guaranteed unique in the synthetic data (sf0.001 has
    # a (orderkey,linenumber,partkey,suppkey) collision) — join the two
    # fan-out branches on keys + the raw feature values, which identify a
    # row exactly (pure column equality, no arithmetic, so double-equality
    # is safe).  Verified: no FULL 8-column duplicate exists at any SF
    # (a duplicate would multiply through this self-join while the
    # single-pass oracle stays 1:1; re-check if the testdata changes)
    k4 = KEY + ["l_partkey", "l_suppkey"] + NUM4
    a = std_df.select(*k4, *[q4(F.element_at(F.col("std"), i + 1))
                             .alias(f"std{i}") for i in range(4)])
    c = mm_df.select(*k4, *[q4(F.element_at(F.col("mm"), i + 1))
                            .alias(f"mm{i}") for i in range(4)])
    return a.join(c, k4).drop("l_partkey", "l_suppkey", *NUM4)


GRAPH_DAG_SQL = f"""
WITH sstats AS (
  SELECT avg(l_quantity) m0, stddev_samp(l_quantity) s0,
         avg(l_extendedprice) m1, stddev_samp(l_extendedprice) s1,
         avg(l_discount) m2, stddev_samp(l_discount) s2,
         avg(l_tax) m3, stddev_samp(l_tax) s3
  FROM lineitem),
mstats AS (
  SELECT min(l_quantity) mn0, max(l_quantity) mx0,
         min(l_extendedprice) mn1, max(l_extendedprice) mx1,
         min(l_discount) mn2, max(l_discount) mx2,
         min(l_tax) mn3, max(l_tax) mx3
  FROM lineitem)
SELECT l_orderkey, l_linenumber,
       {SQL_Q4.format('(l_quantity - m0) / s0')} AS std0,
       {SQL_Q4.format('(l_extendedprice - m1) / s1')} AS std1,
       {SQL_Q4.format('(l_discount - m2) / s2')} AS std2,
       {SQL_Q4.format('(l_tax - m3) / s3')} AS std3,
       {SQL_Q4.format('(l_quantity - mn0) * ((1.0 - 0.0) / (mx0 - mn0)) + 0.0')} AS mm0,
       {SQL_Q4.format('(l_extendedprice - mn1) * ((1.0 - 0.0) / (mx1 - mn1)) + 0.0')} AS mm1,
       {SQL_Q4.format('(l_discount - mn2) * ((1.0 - 0.0) / (mx2 - mn2)) + 0.0')} AS mm2,
       {SQL_Q4.format('(l_tax - mn3) * ((1.0 - 0.0) / (mx3 - mn3)) + 0.0')} AS mm3
FROM lineitem, sstats, mstats
"""


def rare_collapse(spark, sf_dir):
    """RareCategoryCollapser over documents.source: sources under 4.5%
    share collapse into __other__ (the scale-invariant fraction rule);
    output = per collapsed-category accounting."""
    from ..feature import RareCategoryCollapser
    docs = load(spark, sf_dir, "documents")
    m = RareCategoryCollapser(inputCol="source", outputCol="src_c",
                              minCount=0, minFraction=0.045).fit(docs)
    out = m.transform(docs)[0]
    return (out.groupBy("src_c")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count_distinct("source").alias("n_sources")))


RARE_COLLAPSE_SQL = """
WITH c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY 1),
t AS (SELECT sum(cnt) AS n FROM c),
keep AS (SELECT source FROM c, t
         -- exact rational ceil(9n/200): 0.045 = 9/200, keep rule is
         -- count/n >= minFraction
         WHERE cnt >= (9 * t.n + 199) // 200),
lab AS (SELECT d.source,
               CASE WHEN k.source IS NOT NULL THEN d.source
                    ELSE '__other__' END AS src_c
        FROM documents d LEFT JOIN keep k ON k.source = d.source)
SELECT src_c, count(*) AS n, count(DISTINCT source) AS n_sources
FROM lab GROUP BY 1
"""


def winsorize(spark, sf_dir):
    """Winsorizer: clip l_extendedprice/l_quantity to fitted p01/p99
    (exactQuantiles=True for PERCENTILE_CONT oracle parity); the
    summary aggregate gates bounds AND the clipped distribution."""
    from ..feature import Winsorizer
    li = load(spark, sf_dir, "lineitem")
    m = Winsorizer(inputCols=["l_extendedprice", "l_quantity"],
                   outputCols=["p_w", "q_w"],
                   lower=0.01, upper=0.99, exactQuantiles=True).fit(li)
    out = m.transform(li)[0]
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        q4(F.min("p_w")).alias("p_min"), q4(F.max("p_w")).alias("p_max"),
        q4(F.avg("p_w")).alias("p_avg"),
        q4(F.min("q_w")).alias("q_min"), q4(F.max("q_w")).alias("q_max"),
        q4(F.avg("q_w")).alias("q_avg"))


WINSORIZE_SQL = f"""
WITH b AS (
  SELECT quantile_cont(l_extendedprice, 0.01) AS plo,
         quantile_cont(l_extendedprice, 0.99) AS phi,
         quantile_cont(l_quantity, 0.01) AS qlo,
         quantile_cont(l_quantity, 0.99) AS qhi
  FROM lineitem),
c AS (
  SELECT LEAST(GREATEST(CAST(l_extendedprice AS DOUBLE), b.plo), b.phi)
         AS pw,
         LEAST(GREATEST(CAST(l_quantity AS DOUBLE), b.qlo), b.qhi) AS qw
  FROM lineitem, b)
SELECT count(*) AS n,
       {SQL_Q4.format('min(pw)')} AS p_min, {SQL_Q4.format('max(pw)')} AS p_max,
       {SQL_Q4.format('avg(pw)')} AS p_avg,
       {SQL_Q4.format('min(qw)')} AS q_min, {SQL_Q4.format('max(qw)')} AS q_max,
       {SQL_Q4.format('avg(qw)')} AS q_avg
FROM c
"""


QUERIES = {
    "rare_collapse": (rare_collapse, RARE_COLLAPSE_SQL),
    "winsorize": (winsorize, WINSORIZE_SQL),
    "graph_dag": (graph_dag, GRAPH_DAG_SQL),
    "binarizer": (binarizer, BINARIZER_SQL),
    "dct": (dct, DCT_SQL),
    "feature_hasher": (feature_hasher, FEATURE_HASHER_SQL),
    "polynomial_expansion": (polynomial_expansion, POLYNOMIAL_EXPANSION_SQL),
    "index_to_string": (index_to_string, INDEX_TO_STRING_SQL),
    "vector_indexer": (vector_indexer, VECTOR_INDEXER_SQL),
    "univariate_feature_selector": (univariate_feature_selector, UFS_SQL),
    "random_splitter": (random_splitter, RANDOM_SPLITTER_SQL),
    "group_split": (group_split, GROUP_SPLIT_SQL),
    "bucketizer": (bucketizer, BUCKETIZER_SQL),
    "standard_scaler": (standard_scaler, STANDARD_SCALER_SQL),
    "minmax_scaler": (minmax_scaler, MINMAX_SCALER_SQL),
    "maxabs_scaler": (maxabs_scaler, MAXABS_SCALER_SQL),
    "robust_scaler": (robust_scaler, ROBUST_SCALER_SQL),
    "normalizer": (normalizer, NORMALIZER_SQL),
    "elementwise_product": (elementwise_product, ELEMENTWISE_SQL),
    "interaction": (interaction, INTERACTION_SQL),
    "vector_slicer": (vector_slicer, VECTOR_SLICER_SQL),
    "vector_assembler": (vector_assembler, VECTOR_ASSEMBLER_SQL),
    "imputer": (imputer, IMPUTER_SQL),
    "imputer_median": (imputer_median, IMPUTER_MEDIAN_SQL),
    "kbins_quantile": (kbins_quantile, KBINS_QUANTILE_SQL),
    "string_indexer": (string_indexer, STRING_INDEXER_SQL),
    "one_hot_encoder": (one_hot_encoder, ONE_HOT_SQL),
    "kbins_uniform": (kbins_uniform, KBINS_SQL),
    "variance_threshold": (variance_threshold, VARIANCE_THRESHOLD_SQL),
    "sql_transformer": (sql_transformer, SQL_TRANSFORMER_SQL),
}
