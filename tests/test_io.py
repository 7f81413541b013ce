"""Bucketed-table layout tests: the write-once shuffle pays for
exchange-free joins and aggregations afterwards (plan-verified)."""

import pytest

from pyspark.sql import functions as F

from flink_ml_spark.io import BucketedTableSink, read_table, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).alias("score"))
    sigs = spark.range(0, 10_000, 2).select(
        F.col("id").alias("doc_id"),
        F.sha2(F.col("id").cast("string"), 256).alias("sig"))
    write_bucketed(docs, "t_docs", ["doc_id"], 8, sort_cols=["doc_id"],
                   path=str(tmp_path / "docs"))
    write_bucketed(sigs, "t_sigs", ["doc_id"], 8, sort_cols=["doc_id"],
                   path=str(tmp_path / "sigs"))
    yield "t_docs", "t_sigs"
    spark.sql("DROP TABLE IF EXISTS t_docs")
    spark.sql("DROP TABLE IF EXISTS t_sigs")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    t1, t2 = bucketed_pair
    left, right = read_table(spark, t1), read_table(spark, t2)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = left.join(right, "doc_id")
        assert joined.count() == 5_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed scan satisfies the join's distribution: no shuffle
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_bucket_key_aggregation_has_no_exchange(spark, bucketed_pair):
    t1, _ = bucketed_pair
    agg = read_table(spark, t1).groupBy("doc_id").agg(F.sum("score").alias("s"))
    assert agg.count() == 10_000
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_unbucketed_join_does_exchange(spark, bucketed_pair):
    # control: the same join WITHOUT the bucketed layout shuffles — the
    # assertion above is meaningful, not vacuous
    t1, _ = bucketed_pair
    left = read_table(spark, t1)
    right = spark.range(0, 10_000, 2).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("sig"))
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = left.join(right, "doc_id")
        joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_bucketed_sink_stage_roundtrip(spark, tmp_path):
    df = spark.range(1_000).select(F.col("id").alias("doc_id"),
                                   (F.col("id") * 3).alias("v"))
    sink = BucketedTableSink(tableName="t_sink", bucketCols=["doc_id"],
                             numBuckets=4, sortCols=["doc_id"],
                             path=str(tmp_path / "sink"))
    try:
        out = sink.transform(df)[0]
        assert out.count() == 1_000
        assert {r["doc_id"] for r in out.limit(5).collect()} <= set(range(1_000))
        # read-back carries the bucket spec: key agg is exchange-free
        agg = out.groupBy("doc_id").count()
        agg.count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_sink")


def test_incremental_dedup_bucketed_store_side_no_exchange(spark, tmp_path):
    # the incremental-dedup 100 TB story end-to-end: persist the store's
    # LSH band relation bucketed on (band, bsig), re-read it, and the
    # candidate join's store side must plan with ZERO Exchange — only the
    # new batch shuffles
    from flink_ml_spark.llmdata import IncrementalMinHashDeduplicator
    from flink_ml_spark.llmdata.dedup import MinHashSignature, shingles

    corpus = [(i, f"doc{i} alpha{i} beta{i} gamma{i} delta{i} epsilon{i} "
                  f"zeta{i} eta{i} theta{i} iota{i} kappa{i}")
              for i in range(200)]
    dup = [(1000, corpus[0][1]), (1001, corpus[1][1])]
    docs = spark.createDataFrame(corpus + dup, "doc_id long, text string")
    old = docs.filter(F.col("doc_id") < 1000)
    new = docs.filter(F.col("doc_id") >= 1000)
    store = (MinHashSignature(inputCol="sh", outputCol="sig",
                              numHashes=16, seed=42)
             .transform(old.select("doc_id",
                                   shingles(F.col("text"), 3).alias("sh")))[0]
             .select("doc_id", "sig"))
    d = IncrementalMinHashDeduplicator(
        idCol="doc_id", textCol="text", shingleSize=3, numHashes=16,
        bandSize=4, threshold=0.5, seed=42)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(d.store_band_relation(store), "t_incr_bands",
                       ["band", "bsig"], 8,
                       path=str(tmp_path / "bands"))
        bands = read_table(spark, "t_incr_bands")
        matches, _ = d.transform(new, store, bands)
        got = {(r["id"], r["match_id"]) for r in matches.collect()}
        assert got == {(1000, 0), (1001, 1)}
        # same matches as the derive-bands-from-signatures path
        matches_plain, _ = d.transform(new, store)
        assert {(r["id"], r["match_id"])
                for r in matches_plain.collect()} == got
        # AQE's toString prints Final AND Initial plans — assert on the
        # final section only
        plan = matches._jdf.queryExecution().executedPlan().toString() \
            .split("== Initial Plan ==")[0]
        # exactly ONE hash exchange on the band keys — the batch side;
        # the bucketed store scan satisfies the distribution directly
        assert plan.count("Exchange hashpartitioning(band") == 1
        assert "Bucketed: true" in plan
        # the unbucketed control shuffles BOTH sides (assertion is real)
        plain_plan = matches_plain._jdf.queryExecution() \
            .executedPlan().toString().split("== Initial Plan ==")[0]
        assert plain_plan.count("Exchange hashpartitioning(band") == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS t_incr_bands")


def test_write_bucketed_overwrites_orphaned_location(spark):
    # an in-memory catalog forgets managed tables between sessions but the
    # warehouse directory persists — saveAsTable would fail with
    # LOCATION_ALREADY_EXISTS; write_bucketed clears the orphaned location
    import os
    from urllib.parse import urlparse
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    os.makedirs(f"{wh}/t_orphan", exist_ok=True)
    with open(f"{wh}/t_orphan/leftover", "w") as f:
        f.write("junk from a previous session")
    df = spark.range(100).select(F.col("id").alias("k"))
    try:
        write_bucketed(df, "t_orphan", ["k"], 4)
        assert read_table(spark, "t_orphan").count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orphan")


def test_incremental_dedup_daily_loop_with_persisted_store(spark, tmp_path):
    # the production shape end-to-end: each "day" dedups its batch against
    # the PERSISTED signature store + bucketed band relation, then writes
    # both back — history is never re-shingled, state survives sessions
    # (catalog tables), and cross-day duplicates surface on every later day
    from flink_ml_spark.llmdata import IncrementalMinHashDeduplicator

    d = IncrementalMinHashDeduplicator(
        idCol="doc_id", textCol="text", shingleSize=2, numHashes=16,
        bandSize=2, threshold=0.9, seed=42)
    days = [
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "completely unrelated historical document body")],
        [(10, "the quick brown fox jumps over the lazy dog"),   # dup of 0
         (11, "fresh second day text matching nothing else")],
        [(20, "fresh second day text matching nothing else"),   # dup of 11
         (21, "the quick brown fox jumps over the lazy dog")],  # dup of 0
    ]
    got = []
    try:
        for day, rows in enumerate(days):
            batch = spark.createDataFrame(rows, "doc_id long, text string")
            if day == 0:
                store = spark.createDataFrame([], "doc_id long, sig array<bigint>")
                matches, updated = d.transform(batch, store)
            else:
                store = read_table(spark, "t_day_sig")
                bands = read_table(spark, "t_day_bands")
                matches, updated = d.transform(batch, store, bands)
            got.append({(r["id"], r["match_id"]) for r in matches.collect()})
            # cut lineage before overwriting the tables the plan read from
            updated = updated.localCheckpoint(eager=True)
            write_bucketed(updated, "t_day_sig", ["doc_id"], 4,
                           path=str(tmp_path / f"sig{day}"))
            write_bucketed(d.store_band_relation(updated), "t_day_bands",
                           ["band", "bsig"], 4,
                           path=str(tmp_path / f"bands{day}"))
        assert got[0] == set()
        assert got[1] == {(10, 0)}
        assert got[2] == {(20, 11), (21, 0)}
        # the store holds exactly the surviving (unique) documents
        final = {r["doc_id"] for r in read_table(spark, "t_day_sig").collect()}
        assert final == {0, 1, 11}
    finally:
        spark.sql("DROP TABLE IF EXISTS t_day_sig")
        spark.sql("DROP TABLE IF EXISTS t_day_bands")


def test_band_store_scheme_mismatch_raises(spark):
    # a persisted band relation from a different hash configuration must
    # fail loudly, not silently miss every duplicate
    import pytest
    from flink_ml_spark.llmdata import IncrementalMinHashDeduplicator
    from flink_ml_spark.llmdata.dedup import MinHashSignature, shingles
    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} a{i} b{i}") for i in range(20)],
        "doc_id long, text string")
    store = (MinHashSignature(inputCol="sh", outputCol="sig",
                              numHashes=16, seed=42)
             .transform(docs.select("doc_id",
                                    shingles(F.col("text"), 3).alias("sh")))[0]
             .select("doc_id", "sig"))
    writer = IncrementalMinHashDeduplicator(
        idCol="doc_id", textCol="text", shingleSize=3, numHashes=16,
        bandSize=4, seed=42)
    bands = writer.store_band_relation(store)
    assert bands.select("scheme").first()[0] == "sh3mh16b4s42"
    reader = IncrementalMinHashDeduplicator(
        idCol="doc_id", textCol="text", shingleSize=3, numHashes=16,
        bandSize=4, seed=7)  # different seed
    with pytest.raises(ValueError, match="scheme"):
        reader.transform(docs.limit(2), store, bands)
    # matching config accepts the table (and a legacy scheme-less table
    # still works)
    writer.transform(docs.limit(2), store, bands)
    writer.transform(docs.limit(2), store, bands.drop("scheme"))
