"""JSON-driven benchmark harness (reference: flink-ml-benchmark module).

``run_benchmark(spark, config)`` mirrors BenchmarkUtils.runBenchmark
(flink-ml-benchmark/.../BenchmarkUtils.java:75-98): instantiate the stage,
generate seeded input, time fit+transform with the output fully
materialized (count() replaces the reference's DiscardingSink), and emit
the same metric names (BenchmarkResult.java): totalTimeMs,
inputRecordNum, inputThroughput, outputRecordNum, outputThroughput.
"""

from .datagen import (dense_vector_table, double_table, labeled_point_table,
                      random_string_array_table, random_string_table)
from .runner import WORKLOADS, run_benchmark, run_named

__all__ = [
    "dense_vector_table", "double_table", "labeled_point_table",
    "random_string_array_table", "random_string_table",
    "run_benchmark", "run_named", "WORKLOADS",
]
