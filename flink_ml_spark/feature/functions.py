"""vector_to_array / array_to_vector + sparse/dense conversion expressions.

Reference: flink-ml-lib/.../Functions.java:41,71 (scalar conversion
functions) and pyflink/ml/functions.py.  Our canonical vector is already
``array<double>`` (SURVEY §1.3 mapping), so ``vector_to_array`` handles the
sparse struct → dense array direction and pyspark.ml UDT interop.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..common.vector import to_dense


def vector_to_array(col, size: int | None = None) -> Column:
    """Sparse struct<size,indices,values> → dense array<double>."""
    return to_dense(col, size)


def array_to_vector(col) -> Column:
    """Dense array<double> is already the canonical vector type; casts
    numeric arrays to array<double>."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def array_to_sparse(col) -> Column:
    """Dense array<double> → sparse struct (drop zeros, sorted indices).
    Zero-length input short-circuits: sequence(0, -1) descends to
    [0, -1] and element_at(c, 0) raises."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.when(F.size(c) > 0,
                 F.filter(F.sequence(F.lit(0), F.size(c) - 1),
                          lambda i: F.element_at(c, i + 1) != 0.0)) \
        .otherwise(F.array().cast("array<int>"))
    vals = F.transform(idx, lambda i: F.element_at(c, i + 1))
    return F.struct(F.size(c).alias("size"), idx.cast("array<int>").alias("indices"),
                    vals.alias("values"))
