"""Vector column helpers over plain ``array<double>`` columns.

Design note (SURVEY §1.3): the reference carries custom Dense/SparseVector
types with Flink serializers (flink-ml-servable-core/.../linalg/*.java).
Spark-first we standardize on native ``array<double>`` columns so every
vector op stays inside whole-stage codegen via higher-order functions
(F.transform / F.zip_with / F.aggregate) — no UDT, no Python round-trip,
and results stay comparable by external SQL engines.  Sparse vectors are
``struct<size:int, indices:array<int>, values:array<double>>`` (sorted
indices, mirroring SparseVector.java:32).  BLAS (BLAS.java:30-204) maps to
expressions here + numpy inside pandas UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, functions as F

DOUBLE_ARRAY = "array<double>"
SPARSE_STRUCT = "struct<size:int,indices:array<int>,values:array<double>>"


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a, b) -> Column:
    """BLAS.dot for dense arrays (BLAS.java:90-118)."""
    return F.aggregate(F.zip_with(_c(a), _c(b), lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


# Above this, a single unrolled dot/norm would bloat the generated method
# toward janino's 64 KB limit; below it, unrolling beats the interpreted
# HOF fold by an order of magnitude in wide-join hot paths.
UNROLL_DIM_CAP = 128


def dot_fixed(a, b, dim: int | None) -> Column:
    """``dot`` for a KNOWN dimension: unrolled left-to-right term sum that
    stays inside whole-stage codegen.  The HOF form runs its lambda
    INTERPRETED per element — on a candidate join emitting 10⁸ rows that
    is billions of lambda evals and dominates the whole operator (IVF
    probe at 500k rows measured ~8× slower than this).  Summation order
    matches the HOF fold (acc + x, left to right), so results are
    bit-identical and oracle hashes don't move; unknown/large dims fall
    back to the HOF."""
    if dim is None or dim > UNROLL_DIM_CAP or dim <= 0:
        return dot(a, b)
    a, b = _c(a), _c(b)
    terms = [a[j] * b[j] for j in range(dim)]
    out = F.lit(0.0) + terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def dot_lit_fixed(a, w) -> Column:
    """Unrolled dot of an array column with a LITERAL numpy vector, same
    contract as ``dot_fixed`` (codegen, HOF-order summation, fallback
    above the cap)."""
    a = _c(a)
    if len(w) > UNROLL_DIM_CAP or len(w) == 0:
        return dot(a, F.array(*[F.lit(float(x)) for x in w]))
    out = F.lit(0.0) + a[0] * float(w[0])
    for j in range(1, len(w)):
        out = out + a[j] * float(w[j])
    return out


def sq_norm_fixed(a, dim: int | None) -> Column:
    """Sum of squares with the same unroll/fallback contract as
    ``dot_fixed`` (sqrt it for the 2-norm)."""
    if dim is None or dim > UNROLL_DIM_CAP or dim <= 0:
        return F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x * x)
    a = _c(a)
    out = F.lit(0.0) + a[0] * a[0]
    for j in range(1, dim):
        out = out + a[j] * a[j]
    return out


def hadamard(a, b) -> Column:
    """Element-wise product (BLAS.hDot, BLAS.java:120-151)."""
    return F.zip_with(_c(a), _c(b), lambda x, y: x * y)


def scal(alpha, a) -> Column:
    """x = a*x (BLAS.scal)."""
    alpha = F.lit(alpha) if not isinstance(alpha, Column) else alpha
    return F.transform(_c(a), lambda x: x * alpha)


def axpy(alpha, x, y) -> Column:
    """y += a*x (BLAS.axpy)."""
    alpha = F.lit(alpha) if not isinstance(alpha, Column) else alpha
    return F.zip_with(_c(x), _c(y), lambda xi, yi: yi + alpha * xi)


def p_norm(a, p: float = 2.0) -> Column:
    """Minkowski p-norm (BLAS.norm / normalizer semantics).

    p = inf is represented by float('inf').
    """
    a = _c(a)
    if p == float("inf"):
        return F.array_max(F.transform(a, F.abs))
    if p == 1.0:
        return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + F.abs(x))
    if p == 2.0:
        return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.pow(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + F.pow(F.abs(x), F.lit(p))),
        F.lit(1.0 / p))


def sq_dist(a, b) -> Column:
    """Squared euclidean distance."""
    d = F.zip_with(_c(a), _c(b), lambda x, y: x - y)
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x)


def cosine_similarity(a, b) -> Column:
    return dot(a, b) / (p_norm(a, 2.0) * p_norm(b, 2.0))


def to_dense(col, size: int | None = None) -> Column:
    """Sparse struct → dense array.  Needs explicit or embedded size."""
    c = _c(col)
    n = F.lit(size) if size is not None else c["size"]
    idx = F.sequence(F.lit(0), n - 1)
    return F.transform(
        idx,
        lambda i: F.coalesce(
            F.element_at(F.map_from_arrays(c["indices"], c["values"]), i),
            F.lit(0.0)))


def array_col(*cols) -> Column:
    """Assemble numeric scalar columns into array<double>."""
    return F.array(*[_c(c).cast("double") for c in cols])


def is_sparse_type(df, col_name: str) -> bool:
    dtype = dict((f.name, f.dataType.simpleString())
                 for f in df.schema.fields)[col_name]
    return dtype.startswith("struct")


def _sparse_scatter_udf():
    """Arrow-batched sparse→dense scatter (one crossing, numpy fill per
    row) — predictable O(nnz + size) per row vs the per-element map
    lookups of ``to_dense``."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def scatter(size: pd.Series, idx: pd.Series, vals: pd.Series) -> pd.Series:
        out = []
        for n, i, v in zip(size, idx, vals):
            d = np.zeros(int(n))
            if i is not None and len(i):
                d[np.asarray(i, dtype=int)] = np.asarray(v, dtype=float)
            out.append(d)
        return pd.Series(out)

    return scatter


def dense_input(df, col_name: str) -> Column:
    """Vector-input acceptance: dense ``array<double>`` (or any numeric
    array, cast) and the sparse struct {size, indices, values} are
    interchangeable everywhere a features column is consumed — the
    reference accepts both via its Vector hierarchy
    (testInputTypeConversion, e.g. KMeansTest.java:191)."""
    c = _c(col_name)
    if is_sparse_type(df, col_name):
        return _sparse_scatter_udf()(c["size"], c["indices"], c["values"])
    return c.cast(DOUBLE_ARRAY)


def dim_of(df, col_name: str) -> int:
    """Vector dimension from the first row (dense length / sparse size)."""
    if is_sparse_type(df, col_name):
        return int(df.select(F.col(col_name)["size"]).first()[0])
    return len(df.select(col_name).first()[0])
