"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the decode kernels are STUBBED
(deterministic fakes clearly marked) — the Spark-side plumbing (schema,
partition sizing, UDF signatures, batch shape) is real and tested.  At
scale: binary payloads ride the Arrow batches; keep
``spark.sql.files.maxPartitionBytes`` and the per-batch row count low
enough that batch_rows × payload fits executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, IntegerType,
                               StringType, StructField, StructType)

from ..api import Transformer
from ..param import IntParam, ParamValidators, StringParam

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("media_type", StringType(), False),   # image | audio | video
    StructField("payload", BinaryType(), True),       # opaque encoded bytes
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """STUB decode: deterministic pseudo-features from a sha256 stream.
    Real deployments replace this with PIL/ffmpeg decode; everything
    around it (batching, schema, partitioning) is production-shaped."""
    if payload is None:
        return np.zeros(out_dim)
    h = hashlib.sha256(payload).digest()
    reps = (out_dim * 8 // len(h)) + 1
    buf = (h * reps)[: out_dim * 8]
    arr = np.frombuffer(buf, dtype=np.uint64)
    # mod in integer space BEFORE the float conversion — uint64 > 2^53
    # rounds in float64 and would scramble the remainder
    return (arr % 1000).astype(np.float64) / 1000.0


class MediaFeatureExtractor(Transformer):
    """binary payload → feature vector via mapInPandas (Arrow batches)."""

    payloadCol = StringParam("payloadCol", "Binary payload column.", "payload")
    outputCol = StringParam("outputCol", "Feature vector column.", "media_features")
    featureDim = IntParam("featureDim", "Output feature dimension.", 64,
                          ParamValidators.gt(0))

    def _transform(self, df: DataFrame) -> DataFrame:
        pcol, ocol = self.get_("payloadCol"), self.get_("outputCol")
        dim = self.get_("featureDim")
        out_schema = StructType(df.schema.fields
                                + [StructField(ocol, ArrayType(DoubleType()))])

        def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                feats = [
                    _fake_decode(p, dim) if p is not None else np.zeros(dim)
                    for p in pdf[pcol]]
                yield pdf.assign(**{ocol: [list(map(float, f)) for f in feats]})

        return df.mapInPandas(extract, out_schema)


class ImageResizer(Transformer):
    """Resize stub: validates plumbing for byte-in/byte-out media kernels.
    Raises NotImplementedError when a real resize is requested without a
    codec; passthrough mode re-emits payloads with updated metadata."""

    payloadCol = StringParam("payloadCol", "Binary payload column.", "payload")
    targetWidth = IntParam("targetWidth", "Target width.", 224)
    targetHeight = IntParam("targetHeight", "Target height.", 224)
    mode = StringParam("mode", "passthrough | decode.", "passthrough",
                       ParamValidators.in_array(["passthrough", "decode"]))

    def _transform(self, df: DataFrame) -> DataFrame:
        if self.get_("mode") == "decode":
            raise NotImplementedError(
                "ImageResizer(decode): no image codec in this environment — "
                "plug PIL/opencv into the mapInPandas kernel")
        w, h = self.get_("targetWidth"), self.get_("targetHeight")
        return (df.withColumn("width", F.lit(w).cast("int"))
                .withColumn("height", F.lit(h).cast("int")))


class VideoFrameSampler(Transformer):
    """Frame sampling plan: emits (media_id, frame_idx, ts_ms) rows for
    every sampled frame — the pure-relational part of video decode, real:
    one output row per sampled frame, evenly spaced over duration_ms."""

    numFrames = IntParam("numFrames", "Frames to sample per video.", 8,
                         ParamValidators.gt(0))

    def _transform(self, df: DataFrame) -> DataFrame:
        n = self.get_("numFrames")
        idx = F.sequence(F.lit(0), F.lit(n - 1))
        return (df.filter(F.col("media_type") == "video")
                .withColumn("frame_idx", F.explode(idx))
                .withColumn("ts_ms",
                            (F.col("frame_idx") * F.col("duration_ms") / n)
                            .cast("int"))
                .select("media_id", "frame_idx", "ts_ms"))
