"""Seeded distributed data generators (reference:
flink-ml-benchmark/.../datagenerator/common/ — DenseVectorGenerator,
DoubleGenerator, RandomStringGenerator, RandomStringArrayGenerator,
LabeledPointWithWeightGenerator; all seeded, seed=2 in the configs).

Generation is fully distributed: ``spark.range(n)`` partitions the id
space and every value is a deterministic JVM-side function of (id, seed)
— no driver-side materialization, linear scale-out.  Streams are
decorrelated by deriving a per-column sub-seed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _base(spark: SparkSession, n: int, num_partitions: int | None = None):
    par = num_partitions or spark.sparkContext.defaultParallelism
    return spark.range(0, n, numPartitions=par)


def _unit(seed: int, salt: int):
    """Deterministic uniform [0,1) per row: hash(id, seed, salt) mapped to
    the unit interval — reproducible independent of partitioning (F.rand
    is partition-index-dependent, which breaks under repartition)."""
    h = F.hash(F.col("id"), F.lit(seed), F.lit(salt)).cast("long")
    return (F.pmod(h, F.lit(1 << 30)).cast("double") / F.lit(float(1 << 30)))


def double_table(spark, n: int, num_cols: int = 1, seed: int = 2,
                 arity: int | None = None, col_prefix: str = "v") -> DataFrame:
    """DoubleGenerator: uniform doubles; with ``arity`` k → values in
    {0..k-1} (used by OneHotEncoder/Imputer configs)."""
    df = _base(spark, n)
    for i in range(num_cols):
        u = _unit(seed, i)
        col = (F.floor(u * arity).cast("double") if arity else u * 100.0)
        df = df.withColumn(f"{col_prefix}{i}", col)
    return df


def dense_vector_table(spark, n: int, dim: int, seed: int = 2,
                       col: str = "features") -> DataFrame:
    df = _base(spark, n)
    return df.withColumn(
        col, F.array(*[_unit(seed, i) * 100.0 for i in range(dim)]))


def random_string_table(spark, n: int, num_distinct: int = 100, seed: int = 2,
                        col: str = "s") -> DataFrame:
    df = _base(spark, n)
    v = F.floor(_unit(seed, 0) * num_distinct).cast("long")
    return df.withColumn(col, F.concat(F.lit("str_"), v.cast("string")))


def random_string_array_table(spark, n: int, array_size: int = 10,
                              num_distinct: int = 100, seed: int = 2,
                              col: str = "arr") -> DataFrame:
    df = _base(spark, n)
    elems = [F.concat(F.lit("str_"),
                      F.floor(_unit(seed, i) * num_distinct).cast("long")
                      .cast("string"))
             for i in range(array_size)]
    return df.withColumn(col, F.array(*elems))


def labeled_point_table(spark, n: int, dim: int, label_arity: int = 2,
                        feature_arity: int | None = None, seed: int = 2,
                        features_col: str = "features", label_col: str = "label",
                        weight_col: str = "weight") -> DataFrame:
    """LabeledPointWithWeightGenerator: features (uniform, or categorical
    when feature_arity set), label in {0..arity-1}, weight in [0,1)."""
    df = _base(spark, n)
    feats = [F.floor(_unit(seed, i) * feature_arity).cast("double")
             if feature_arity else _unit(seed, i)
             for i in range(dim)]
    return (df.withColumn(features_col, F.array(*feats))
            .withColumn(label_col,
                        F.floor(_unit(seed, dim) * label_arity).cast("double"))
            .withColumn(weight_col, _unit(seed, dim + 1)))
