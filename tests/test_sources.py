"""Source-format coverage: the engine ingests CSV / JSONL / partitioned
parquet through Spark's native scan layer (SURVEY §2.12 — the reference
delegates I/O to host-engine connectors; here the host is Spark, and
these tests pin the properties that matter at 100 TB: explicit schemas,
value fidelity vs the parquet source of truth, column pruning, and
partition pruning — verified by plan inspection, not assumption)."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "lang", "source", "n_chars")


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip_with_explicit_schema(spark, docs, tmp_path):
    p = str(tmp_path / "docs_csv")
    docs.write.option("header", True).csv(p)
    back = (spark.read.schema("doc_id bigint, lang string, source string, "
                              "n_chars bigint")
            .option("header", True).csv(p))
    assert _sorted_rows(back) == _sorted_rows(docs)


def test_jsonl_roundtrip_with_explicit_schema(spark, docs, tmp_path):
    p = str(tmp_path / "docs_jsonl")
    docs.write.json(p)  # spark's json sink IS jsonl (one object per line)
    back = (spark.read.schema("doc_id bigint, lang string, source string, "
                              "n_chars bigint").json(p))
    assert _sorted_rows(back) == _sorted_rows(docs)


def test_csv_scan_prunes_columns(spark, docs, tmp_path):
    p = str(tmp_path / "docs_csv2")
    docs.write.option("header", True).csv(p)
    back = (spark.read.schema("doc_id bigint, lang string, source string, "
                              "n_chars bigint")
            .option("header", True).csv(p))
    plan = back.select("doc_id")._jdf.queryExecution().executedPlan() \
        .toString()
    assert "doc_id" in plan
    # the scan's ReadSchema must not carry the unprojected columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "n_chars" not in read_schema[0]


def test_partitioned_parquet_prunes_partitions(spark, docs, tmp_path):
    p = str(tmp_path / "docs_part")
    docs.write.partitionBy("lang").parquet(p)
    back = spark.read.parquet(p)
    flt = back.filter(F.col("lang") == "en")
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan
    # pruning is real: only the en partition directory is listed
    n_en = docs.filter("lang = 'en'").count()
    assert flt.count() == n_en
    # and the physical layout wrote one directory per lang value
    dirs = [d for d in os.listdir(p) if d.startswith("lang=")]
    assert len(dirs) == docs.select("lang").distinct().count()


def test_parquet_filter_pushdown(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter(F.col("n_chars") > 300).select("doc_id", "n_chars")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "n_chars" in plan


def test_orc_roundtrip_with_pushdown(spark, docs, tmp_path):
    """ORC is the other columnar Spark scans natively: round-trip
    fidelity vs the parquet source of truth, plus pushed filters and a
    pruned read schema in the physical plan."""
    p = str(tmp_path / "docs_orc")
    docs.write.orc(p)
    back = spark.read.orc(p)
    assert _sorted_rows(back) == _sorted_rows(docs)
    plan = (back.filter(F.col("n_chars") > 500).select("doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [" in plan and "n_chars" in plan.split(
        "PushedFilters")[1][:120]
    # pruned scan: only the two referenced columns reach the reader
    sel = plan.split("ReadSchema")[1][:120]
    assert "doc_id" in sel and "lang" not in sel
