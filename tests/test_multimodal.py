"""Multimodal column plumbing tests — schema, batch shape, and the
stubbed decode contract (SURVEY north-star extensions)."""

import pytest
from pyspark.sql import functions as F

from flink_ml_spark.llmdata import (ImageResizer, MediaFeatureExtractor,
                                    VideoFrameSampler)
from flink_ml_spark.llmdata.multimodal import MEDIA_SCHEMA, _fake_decode


@pytest.fixture()
def media(spark):
    rows = [
        ("m1", "image", b"\x89PNGfake", 640, 480, None),
        ("m2", "video", b"\x00\x00fakemp4", 1920, 1080, 4000),
        ("m3", "image", None, None, None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_media_feature_extractor(spark, media):
    out = MediaFeatureExtractor(featureDim=16).transform(media)[0]
    rows = {r["media_id"]: r["media_features"] for r in out.collect()}
    assert len(rows["m1"]) == 16
    assert rows["m3"] == [0.0] * 16          # null payload → zero vector
    assert rows["m1"] == list(map(float, _fake_decode(b"\x89PNGfake", 16)))
    # deterministic across runs
    again = {r["media_id"]: r["media_features"]
             for r in MediaFeatureExtractor(featureDim=16).transform(media)[0].collect()}
    assert rows == again


def test_image_resizer_passthrough_and_decode_stub(spark, media):
    out = ImageResizer(targetWidth=224, targetHeight=224).transform(media)[0]
    r = out.filter(F.col("media_id") == "m1").first()
    assert (r["width"], r["height"]) == (224, 224)
    assert r["payload"] == b"\x89PNGfake"    # payload untouched
    with pytest.raises(NotImplementedError, match="no image codec"):
        ImageResizer(mode="decode").transform(media)


def test_video_frame_sampler(spark, media):
    out = VideoFrameSampler(numFrames=4).transform(media)[0]
    rows = out.orderBy("frame_idx").collect()
    assert [r["media_id"] for r in rows] == ["m2"] * 4   # only videos
    assert [r["ts_ms"] for r in rows] == [0, 1000, 2000, 3000]


def test_generic_set_model_data(spark):
    """Model.set_model_data round-trips get_model_data's one-row table."""
    from flink_ml_spark.feature import StandardScaler, StandardScalerModel
    df = spark.createDataFrame([(i, [float(i), 2.0 * i]) for i in range(1, 5)],
                               "id long, f array<double>")
    m = StandardScaler(inputCol="f", outputCol="o").fit(df)
    md = m.get_model_data(spark)[0]
    m2 = StandardScalerModel()
    m2.set_(inputCol="f", outputCol="o")
    m2.set_model_data(md)
    a = [r["o"] for r in m.transform(df)[0].collect()]
    b = [r["o"] for r in m2.transform(df)[0].collect()]
    assert a == b
