"""Bucketed table layout: pay the shuffle once at write time, never again.

The reference has no scan/sink layer of its own — I/O belongs to the host
engine's connectors (SURVEY §2.12) — so this module is the Spark-native
counterpart: persistent parquet tables hash-bucketed (and per-bucket
sorted) on a key.  At 100 TB the dominant cost of the join- and
aggregation-heavy operators in this package is the exchange; a table
written bucketed on its join/group key satisfies
``HashClusteredDistribution`` from the scan, so every later equi-join
between co-bucketed tables and every aggregation on the bucket key runs
with ZERO exchange — the layout IS the optimization, verified by plan
inspection in tests/test_io.py.

Usage pattern for the operators here: bucket the big fact relations on
their stable join keys (document id, signature-store id, user id) at
ingest; downstream ``MinHashLSHDeduplicator`` id-rejoins,
``IncrementalMinHashDeduplicator`` store unions, and per-key aggregations
then co-locate for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .api import AlgoOperator
from .param import IntParam, ParamValidators, StringArrayParam, StringParam


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int, sort_cols: list[str] | None = None,
                   path: str | None = None, mode: str = "overwrite") -> None:
    """Write ``df`` as a persistent parquet table hash-bucketed on
    ``bucket_cols`` into ``num_buckets`` buckets, optionally sorted by
    ``sort_cols`` within each bucket file (sorted buckets additionally
    skip the sort of later sort-merge joins).  ``path`` stores the data
    outside the warehouse dir (an "external" table)."""
    if mode == "overwrite" and not path:
        # an in-memory catalog forgets managed tables between sessions but
        # their warehouse directories persist; CREATE then fails with
        # LOCATION_ALREADY_EXISTS.  Clear the ORPHANED location (catalog
        # has no such table ⇒ nothing registered points at it).  Local-FS
        # only — with a persistent metastore the catalog entry exists and
        # overwrite handles it.  Single-writer assumption: two live
        # sessions sharing one warehouse dir each have their OWN
        # in-memory catalog, so "orphaned" cannot be distinguished from
        # "another session's live table"; don't share a warehouse dir
        # across concurrent in-memory-catalog sessions.
        spark = df.sparkSession
        if not spark.catalog.tableExists(table):
            import shutil
            from urllib.parse import urlparse
            wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
            if wh.scheme in ("", "file"):
                # mirror the catalog's managed-table layout: names are
                # lowercased, and a db-qualified name lives under
                # <warehouse>/<db>.db/<table>
                parts = table.lower().split(".")
                rel = (f"{parts[-2]}.db/{parts[-1]}" if len(parts) > 1
                       else parts[-1])
                shutil.rmtree(f"{wh.path}/{rel}", ignore_errors=True)
    writer = (df.write.format("parquet").mode(mode)
              .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a (bucketed) table back; the bucket spec rides the catalog
    entry, so joins/aggs on the bucket key plan exchange-free."""
    return spark.table(table)


class BucketedTableSink(AlgoOperator):
    """Sink stage wrapping :func:`write_bucketed` so a pipeline can end in
    a bucketed materialization: ``transform(df)`` writes the table and
    returns the catalog-backed read (bucket metadata attached), ready for
    exchange-free downstream composition."""

    tableName = StringParam("tableName", "Catalog table name.", None)
    bucketCols = StringArrayParam("bucketCols", "Hash-bucket key columns.", [])
    numBuckets = IntParam("numBuckets", "Bucket count (pick ~the cluster's "
                          "target partition count at full scale).", 32,
                          ParamValidators.gt(0))
    sortCols = StringArrayParam("sortCols", "Within-bucket sort columns.", [])
    path = StringParam("path", "External data path (None = warehouse).", None)
    mode = StringParam("mode", "Save mode.", "overwrite")

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        write_bucketed(df, self.get_("tableName"),
                       list(self.get_("bucketCols")), self.get_("numBuckets"),
                       sort_cols=list(self.get_("sortCols")) or None,
                       path=self.get_("path"), mode=self.get_("mode"))
        return [read_table(df.sparkSession, self.get_("tableName"))]
