"""DigestBloomFilter: no false negatives, bounded false positives,
save/load, and prefilter-composition equivalence."""

import pyspark.sql.functions as F

from flink_ml_spark.llmdata import DigestBloomFilter, DigestBloomFilterModel


def _digests(spark, lo, hi, name="d"):
    return spark.range(lo, hi).select(
        F.sha2(F.col("id").cast("string"), 256).alias(name))


def test_bloom_no_false_negatives(spark):
    store = _digests(spark, 0, 2000)
    model = DigestBloomFilter(inputCol="d", fpp=0.01).fit(store)
    out = model.transform(store)[0]
    assert out.where(~F.col("maybe")).count() == 0  # every member flags


def test_bloom_fp_rate_bounded(spark):
    store = _digests(spark, 0, 2000)
    model = DigestBloomFilter(inputCol="d", fpp=0.01).fit(store)
    fresh = _digests(spark, 100_000, 104_000)  # disjoint from the store
    fp = model.transform(fresh)[0].where("maybe").count()
    # fpp=0.01 target; allow generous slack for hash variance
    assert fp <= 0.05 * 4000, fp


def test_bloom_sizing_and_save_load(spark, tmp_path):
    store = _digests(spark, 0, 500)
    model = DigestBloomFilter(inputCol="d", fpp=0.001).fit(store)
    md = model.model_data
    assert md["fittedItems"] == 500
    assert md["numBits"] % 64 == 0 and md["numBits"] >= 500 * 10
    assert md["numHashes"] >= 5  # ~ -log2(0.001) ≈ 10
    p = str(tmp_path / "bloom")
    model.save(p)
    back = DigestBloomFilterModel.load(spark, p)
    probe = _digests(spark, 0, 1000)
    a = [r["maybe"] for r in model.transform(probe)[0].collect()]
    b = [r["maybe"] for r in back.transform(probe)[0].collect()]
    assert a == b


def test_bloom_prefilter_composition_exact(spark):
    # prefilter -> exact join on the maybe subset == plain exact join
    store = _digests(spark, 0, 3000)
    batch = _digests(spark, 2000, 6000).withColumn(
        "bid", F.monotonically_increasing_id())
    model = DigestBloomFilter(inputCol="d").fit(store)
    flagged = model.transform(batch)[0]
    via_bloom = (flagged.where("maybe")
                 .join(store.distinct(), "d", "left_semi")
                 .select("d").orderBy("d").collect())
    plain = (batch.join(store.distinct(), "d", "left_semi")
             .select("d").orderBy("d").collect())
    assert via_bloom == plain
    # and the prefilter really prunes: most of the 3000 fresh digests
    # never reach the join
    assert flagged.where("maybe").count() < 3000 * 0.2 + 1000


def test_bloom_incremental_update(spark):
    a = _digests(spark, 0, 1000)
    b = _digests(spark, 1000, 2000)
    model = DigestBloomFilter(inputCol="d", fpp=0.01,
                              expectedItems=2000).fit(a)
    # batch b unknown before the update, fully covered after
    assert model.transform(b)[0].where("maybe").count() < 200
    model.update(b)
    assert model.transform(b)[0].where(~F.col("maybe")).count() == 0
    assert model.transform(a)[0].where(~F.col("maybe")).count() == 0
    # fit stored the sizing capacity (expectedItems=2000); update adds
    # the batch's actual insert count for the refit heuristic
    assert model.model_data["fittedItems"] == 3000
    # update == fit-on-union, bit for bit (same m/k, OR is associative)
    both = _digests(spark, 0, 2000)
    full = DigestBloomFilter(inputCol="d", fpp=0.01,
                             expectedItems=2000).fit(both)
    assert full.model_data["bitmap"] == model.model_data["bitmap"]
    # replayed batch is a no-op on the bitmap (idempotent insertion)
    bm_before = model.model_data["bitmap"]
    model.update(b)
    assert model.model_data["bitmap"] == bm_before
