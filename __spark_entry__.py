"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are backed by the registry in
``flink_ml_spark.queries`` — one entry per implemented operator from
SURVEY.md §2.  Convention: scalar output columns only, float columns
quantized to 4 decimals as BIGINT on both sides (see
flink_ml_spark/queries/__init__.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TF-IDF feature pipeline over documents at sf0.001."""
    from flink_ml_spark.queries.text_queries import tfidf
    return tfidf(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from flink_ml_spark.queries import queries_dict
    return queries_dict()


def oracle_sql() -> dict[str, str]:
    from flink_ml_spark.queries import oracles_dict
    return oracles_dict()
