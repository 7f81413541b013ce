"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

Decode kernels: uncompressed BMP and 16-bit PCM WAV decode for REAL in
pure numpy (``codecs.py`` — header parse + flat sample buffer, no
external library).  Compressed codecs (JPEG/PNG/MP3/H.264) are not
available in this container, so payloads those kernels cannot parse fall
back to the clearly-marked deterministic hash stub (feature extraction)
or are passed through with null payloads (resize) — the plumbing
(schema, partition sizing, UDF signatures, batch shape) is identical
for both.  At scale: binary payloads ride the Arrow batches; keep
``spark.sql.files.maxPartitionBytes`` and the per-batch row count low
enough that batch_rows × payload fits executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, BooleanType, DoubleType,
                               IntegerType, StringType, StructField,
                               StructType)

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


def _image_stats_features(img: np.ndarray, out_dim: int) -> np.ndarray:
    """Real image features: per-cell mean RGB over a sqrt-grid (a classic
    color-layout descriptor), padded/truncated to out_dim, in [0, 1]."""
    cells = max(1, out_dim // 3)
    g = max(1, int(np.sqrt(cells)))
    h, w = img.shape[:2]
    ys = np.linspace(0, h, g + 1, dtype=int)
    xs = np.linspace(0, w, g + 1, dtype=int)
    feats = []
    for i in range(g):
        for j in range(g):
            block = img[ys[i]:max(ys[i + 1], ys[i] + 1),
                        xs[j]:max(xs[j + 1], xs[j] + 1)]
            feats.extend(block.reshape(-1, 3).mean(axis=0) / 255.0)
    out = np.zeros(out_dim)
    out[: min(out_dim, len(feats))] = feats[:out_dim]
    return out


def _audio_stats_features(rate: int, samples: np.ndarray,
                          out_dim: int) -> np.ndarray:
    """Real audio features: per-segment RMS energy over out_dim equal
    slices of the (mono-mixed) signal, normalized to [0, 1]."""
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    if not len(mono):
        return np.zeros(out_dim)
    bounds = np.linspace(0, len(mono), out_dim + 1, dtype=int)
    out = np.zeros(out_dim)
    for i in range(out_dim):
        seg = mono[bounds[i]:max(bounds[i + 1], bounds[i] + 1)]
        out[i] = float(np.sqrt((seg ** 2).mean()))
    return out


class MediaFeatureExtractor(Transformer):
    """binary payload → feature vector via mapInPandas (Arrow batches).

    ``kernel="auto"`` decodes BMP + PNG images / PCM WAV audio for real
    (pure numpy + stdlib zlib, codecs.py) and falls back to the
    deterministic hash stub for payloads needing an external codec;
    ``kernel="hash"`` forces the stub (cross-engine deterministic — the
    oracle-replayable mode); ``kernel="strict"`` raises on any payload
    the bundled codecs cannot decode (naming its sniffed format) instead
    of stubbing.

    The STUB BOUNDARY is typed, never silent: every output row also
    carries ``decodedCol`` (default ``<outputCol>_decoded``) — true iff a
    real codec produced the features.  A consumer therefore cannot
    mistake a hash-stub embedding for a decode: filter on the flag, or
    run ``kernel="strict"`` to make undecodable payloads a hard error."""

    payloadCol = StringParam("payloadCol", "Binary payload column.", "payload")
    outputCol = StringParam("outputCol", "Feature vector column.", "media_features")
    decodedCol = StringParam("decodedCol", "Boolean flag column: real "
                             "decode vs hash stub (None = <outputCol>"
                             "_decoded).", None)
    featureDim = IntParam("featureDim", "Output feature dimension.", 64,
                          ParamValidators.gt(0))
    kernel = StringParam("kernel", "auto | hash | strict.", "hash",
                         ParamValidators.in_array(["auto", "hash", "strict"]))

    def _decoded_col(self) -> str:
        return self.get_("decodedCol") or f"{self.get_('outputCol')}_decoded"

    def _make_feat_of(self):
        dim = self.get_("featureDim")
        mode = self.get_("kernel")

        def feat_of(p) -> tuple[np.ndarray, bool]:
            if p is None:
                return np.zeros(dim), False
            if mode in ("auto", "strict"):
                from .codecs import decode_image, decode_wav, sniff_format
                img = decode_image(p)
                if img is not None:
                    return _image_stats_features(img, dim), True
                wav = decode_wav(p)
                if wav is not None:
                    return _audio_stats_features(*wav, dim), True
                if mode == "strict":
                    raise NotImplementedError(
                        f"no bundled codec decodes this payload (sniffed "
                        f"format: {sniff_format(p)}); plug an external "
                        f"decoder into this mapInPandas slot, or use "
                        f"kernel='auto' and filter on the decoded flag")
            return _fake_decode(p, dim), False

        return feat_of

    def _transform(self, df: DataFrame) -> DataFrame:
        pcol, ocol = self.get_("payloadCol"), self.get_("outputCol")
        dcol = self._decoded_col()
        feat_of = self._make_feat_of()
        out_schema = StructType(
            df.schema.fields
            + [StructField(ocol, ArrayType(DoubleType())),
               StructField(dcol, BooleanType())])

        def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                res = [feat_of(p) for p in pdf[pcol]]
                yield pdf.assign(
                    **{ocol: [list(map(float, f)) for f, _ in res],
                       dcol: [d for _, d in res]})

        return df.mapInPandas(extract, out_schema)

    def transform_local(self, pdf):
        pcol, ocol = self.get_("payloadCol"), self.get_("outputCol")
        feat_of = self._make_feat_of()
        out = pdf.copy()
        res = [feat_of(p) for p in pdf[pcol]]
        out[ocol] = [list(map(float, f)) for f, _ in res]
        out[self._decoded_col()] = [d for _, d in res]
        return out


class ImageResizer(Transformer):
    """Byte-in/byte-out image resize.

    ``mode="decode"`` is REAL for uncompressed BMP, 8-bit PNG and
    baseline JPEG payloads: pure-numpy (+stdlib) decode →
    nearest-neighbor resize → re-encode in the SAME container, all
    inside one Arrow ``mapInPandas`` stage.  Payloads the bundled
    codecs cannot parse (progressive JPEG, video) come back with a null
    payload so callers can route them to an external decode.
    ``mode="passthrough"`` re-emits payloads with updated metadata only."""

    payloadCol = StringParam("payloadCol", "Binary payload column.", "payload")
    targetWidth = IntParam("targetWidth", "Target width.", 224)
    targetHeight = IntParam("targetHeight", "Target height.", 224)
    mode = StringParam("mode", "passthrough | decode.", "passthrough",
                       ParamValidators.in_array(["passthrough", "decode"]))

    def _transform(self, df: DataFrame) -> DataFrame:
        w, h = self.get_("targetWidth"), self.get_("targetHeight")
        if self.get_("mode") == "decode":
            pcol = self.get_("payloadCol")
            schema = df.schema

            def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                from .codecs import _resize_reencode
                for pdf in batches:
                    pdf = pdf.assign(
                        **{pcol: [_resize_reencode(p, w, h)
                                  for p in pdf[pcol]]})
                    if "width" in pdf.columns:
                        pdf = pdf.assign(width=np.int32(w), height=np.int32(h))
                    yield pdf

            return df.mapInPandas(resize, schema)
        return (df.withColumn("width", F.lit(w).cast("int"))
                .withColumn("height", F.lit(h).cast("int")))

    def transform_local(self, pdf):
        w, h = self.get_("targetWidth"), self.get_("targetHeight")
        out = pdf.copy()
        if self.get_("mode") == "decode":
            from .codecs import _resize_reencode
            pcol = self.get_("payloadCol")
            out[pcol] = [_resize_reencode(p, w, h) for p in pdf[pcol]]
        if "width" in out.columns or self.get_("mode") != "decode":
            out["width"] = np.int32(w)
            out["height"] = np.int32(h)
        return out


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

    def transform_local(self, pdf):
        n = self.get_("numFrames")
        rows = []
        for _, r in pdf.iterrows():
            if r["media_type"] != "video":
                continue
            for i in range(n):
                rows.append({"media_id": r["media_id"], "frame_idx": i,
                             "ts_ms": int(i * r["duration_ms"] / n)})
        return pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_ms"])


class GifFrameSampler(Transformer):
    """REAL video-path frame sampling over animated GIF payloads (the
    one motion container with a bundled pure-numpy codec —
    codecs.decode_gif_frames): evenly sample ``numFrames`` composited
    frames per animation and emit per-frame summary features
    ``(idCol, frame_idx, ts_ms, r_mean, g_mean, b_mean)``.

    Decode and reduce are FUSED in one Arrow-batched ``mapInPandas``
    pass: raw pixels never leave the task that decoded them — at
    corpus scale you shuffle per-frame feature rows (a few doubles),
    not canvases.  ``ts_ms`` is the frame's start time (cumulative
    prior delays), matching VideoFrameSampler's relational contract so
    the two compose.  Undecodable payloads emit no rows (count them
    upstream via sniff_format if needed)."""

    idCol = StringParam("idCol", "Passthrough id column.", "media_id")
    inputCol = StringParam("inputCol", "Animated-GIF payload column.",
                           "payload")
    numFrames = IntParam("numFrames", "Frames to sample per animation "
                         "(evenly spaced; clipped to available).", 4,
                         ParamValidators.gt(0))

    def _transform(self, df: DataFrame) -> DataFrame:
        idc, pc = self.get_("idCol"), self.get_("inputCol")
        k = int(self.get_("numFrames"))

        def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from .codecs import decode_gif_frames
            cols = [idc, "frame_idx", "ts_ms", "r_mean", "g_mean", "b_mean"]
            for pdf in batches:
                rows = []
                for mid, payload in zip(pdf[idc], pdf[pc]):
                    dec = decode_gif_frames(
                        bytes(payload) if payload is not None else None)
                    if not dec:
                        continue
                    n = len(dec)
                    starts = np.cumsum([0] + [d for d, _ in dec[:-1]])
                    for j in range(min(k, n)):
                        fi = j * n // min(k, n)
                        canvas = dec[fi][1].astype(np.float64)
                        rows.append((mid, fi, int(starts[fi]),
                                     canvas[..., 0].mean(),
                                     canvas[..., 1].mean(),
                                     canvas[..., 2].mean()))
                yield pd.DataFrame(rows, columns=cols)

        # id field type follows the input schema (MEDIA_SCHEMA's
        # media_id is a string — a hardcoded `long` fails Arrow
        # conversion on default usage; ADVICE r08)
        id_t = df.schema[idc].dataType.simpleString()
        return (df.select(idc, pc)
                .mapInPandas(sample,
                             f"{idc} {id_t}, frame_idx int, ts_ms long, "
                             f"r_mean double, g_mean double, "
                             f"b_mean double"))
