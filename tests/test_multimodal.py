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
    # decode mode: PNG has no pure-numpy codec → null payload signals
    # "route to an external decoder" (BMP decodes for real, see below)
    dec = ImageResizer(mode="decode").transform(media)[0]
    assert dec.filter(F.col("media_id") == "m1").first()["payload"] is None


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


def test_bmp_codec_round_trip():
    import numpy as np
    from flink_ml_spark.llmdata.codecs import (decode_bmp, encode_bmp,
                                               resize_nearest)

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (13, 7, 3), dtype=np.uint8)  # odd width → padding
    payload = encode_bmp(img)
    back = decode_bmp(payload)
    assert back is not None and back.shape == (13, 7, 3)
    np.testing.assert_array_equal(back, img)
    small = resize_nearest(img, 4, 4)
    assert small.shape == (4, 4, 3)
    assert decode_bmp(b"not a bmp") is None
    assert decode_bmp(None) is None


def test_png_codec_round_trip():
    import numpy as np
    from flink_ml_spark.llmdata.codecs import (decode_png, encode_png,
                                               sniff_format)

    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (11, 5, 3), dtype=np.uint8)
    payload = encode_png(img)
    assert sniff_format(payload) == "png"
    back = decode_png(payload)
    assert back is not None and back.shape == (11, 5, 3)
    np.testing.assert_array_equal(back, img)
    assert decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40) is None
    assert decode_png(b"garbage") is None and decode_png(None) is None


def _png_with_filters(img: "np.ndarray", filters: list[int]) -> bytes:
    """Hand-build a PNG whose row y uses filter type filters[y], computed
    by an INDEPENDENT naive reference (spec formulas, per-byte loops) —
    so decode_png's vectorized unfiltering is checked against the spec,
    not against our own encoder."""
    import struct
    import zlib
    import numpy as np
    h, w = img.shape[:2]
    ch = img.shape[2]
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        rec = img[y].reshape(-1).astype(np.int32)
        f = filters[y]
        raw.append(f)
        for x in range(w * ch):
            a = int(rec[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            raw.append((int(rec[x]) - pred) & 0xFF)
        prev = rec

    def chunk(cid, data):
        return (struct.pack(">I", len(data)) + cid + data
                + struct.pack(">I", zlib.crc32(cid + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[ch], 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_all_filter_types_and_color_types():
    import numpy as np
    from flink_ml_spark.llmdata.codecs import decode_png

    rng = np.random.RandomState(3)
    # RGB with every filter type exercised (incl. repeats)
    img = rng.randint(0, 256, (6, 9, 3), dtype=np.uint8)
    payload = _png_with_filters(img, [0, 1, 2, 3, 4, 4])
    np.testing.assert_array_equal(decode_png(payload), img)
    # grayscale broadcasts to RGB
    g = rng.randint(0, 256, (5, 4, 1), dtype=np.uint8)
    got = decode_png(_png_with_filters(g, [1, 4, 2, 3, 0]))
    np.testing.assert_array_equal(got, np.repeat(g, 3, axis=2))
    # RGBA drops alpha
    a = rng.randint(0, 256, (4, 3, 4), dtype=np.uint8)
    got = decode_png(_png_with_filters(a, [4, 3, 2, 1]))
    np.testing.assert_array_equal(got, a[:, :, :3])


def test_image_resizer_decode_real_png(spark):
    import numpy as np
    from flink_ml_spark.llmdata.codecs import decode_png, encode_png

    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    rows = [("p", "image", bytearray(encode_png(img)), 16, 16, None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = ImageResizer(mode="decode", targetWidth=4, targetHeight=4) \
        .transform(df)[0]
    got = out.collect()[0]
    back = decode_png(bytes(got["payload"]))  # re-encoded in SAME container
    assert back is not None and back.shape == (4, 4, 3)


def test_media_feature_extractor_auto_kernel_png(spark):
    import numpy as np
    from flink_ml_spark.llmdata.codecs import encode_bmp, encode_png

    green = np.zeros((8, 8, 3), dtype=np.uint8)
    green[:, :, 1] = 255
    rows = [("png", "image", bytearray(encode_png(green)), 8, 8, None),
            ("bmp", "image", bytearray(encode_bmp(green)), 8, 8, None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    ex = MediaFeatureExtractor(featureDim=12).set_(kernel="auto")
    got = {r["media_id"]: (r["media_features"], r["media_features_decoded"])
           for r in ex.transform(df)[0].collect()}
    assert got["png"][1] is True  # REAL decode, not the stub
    # identical pixels through either container → identical features
    assert got["png"][0] == got["bmp"][0]


def test_wav_codec_round_trip():
    import numpy as np
    from flink_ml_spark.llmdata.codecs import decode_wav, encode_wav

    t = np.arange(800)
    samples = (np.sin(t / 10.0) * 10000).astype(np.int16)
    payload = encode_wav(8000, samples)
    got = decode_wav(payload)
    assert got is not None
    rate, back = got
    assert rate == 8000 and back.shape == (800, 1)
    np.testing.assert_array_equal(back[:, 0], samples)
    assert decode_wav(b"RIFFxxxx") is None


def test_image_resizer_decode_real_bmp(spark):
    import numpy as np
    from flink_ml_spark.llmdata.codecs import decode_bmp, encode_bmp

    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    rows = [("a", "image", bytearray(encode_bmp(img)), 16, 16, None),
            ("b", "image", bytearray(b"\x89PNG not decodable"), 8, 8, None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = ImageResizer(mode="decode", targetWidth=4, targetHeight=4) \
        .transform(df)[0]
    got = {r["media_id"]: r for r in out.collect()}
    resized = decode_bmp(bytes(got["a"]["payload"]))
    assert resized.shape == (4, 4, 3)
    assert got["a"]["width"] == 4 and got["a"]["height"] == 4
    assert got["b"]["payload"] is None  # needs an external codec


def test_media_feature_extractor_auto_kernel(spark):
    import numpy as np
    from flink_ml_spark.llmdata.codecs import encode_bmp, encode_wav

    red = np.zeros((8, 8, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    tone = (np.ones(1000) * 16000).astype(np.int16)
    rows = [("img", "image", bytearray(encode_bmp(red)), 8, 8, None),
            ("aud", "audio", bytearray(encode_wav(8000, tone)), None, None, 125),
            ("other", "video", bytearray(b"opaque"), None, None, 40)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    ex = MediaFeatureExtractor(featureDim=12).set_(kernel="auto")
    got = {r["media_id"]: r["media_features"] for r in ex.transform(df)[0].collect()}
    # red image → cell means [1, 0, 0, 1, 0, 0, ...]
    assert got["img"][0] == pytest.approx(1.0)
    assert got["img"][1] == pytest.approx(0.0)
    # constant tone → constant positive RMS in every segment
    assert all(v == pytest.approx(16000 / 32768, rel=1e-6) for v in got["aud"])
    # undecodable payload falls back to the deterministic hash stub
    assert got["other"] == pytest.approx(list(_fake_decode(b"opaque", 12)))


def test_media_extractor_stub_boundary_is_typed(spark):
    # a consumer must never mistake a hash-stub embedding for a decode:
    # the decoded flag marks the boundary, and strict mode makes it raise
    from flink_ml_spark.llmdata.codecs import encode_bmp
    import numpy as np

    bmp = encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64      # compressed: no codec here
    media = spark.createDataFrame(
        [("m_bmp", bmp), ("m_png", png), ("m_null", None)],
        "media_id string, payload binary")
    ex = MediaFeatureExtractor(featureDim=6).set_(kernel="auto")
    got = {r["media_id"]: r["media_features_decoded"]
           for r in ex.transform(media)[0].collect()}
    assert got == {"m_bmp": True, "m_png": False, "m_null": False}
    # hash mode: the stub is global, every row flagged undecoded
    ex_hash = MediaFeatureExtractor(featureDim=6).set_(kernel="hash")
    assert all(not r["media_features_decoded"]
               for r in ex_hash.transform(media)[0].collect())
    # strict mode names the sniffed format in the error
    ex_strict = MediaFeatureExtractor(featureDim=6).set_(kernel="strict")
    with pytest.raises(Exception, match="png"):
        ex_strict.transform(media)[0].collect()
    # transform_local mirrors the distributed flags
    import pandas as pd
    local = ex.transform_local(pd.DataFrame(
        {"media_id": ["a", "b"], "payload": [bmp, png]}))
    assert list(local["media_features_decoded"]) == [True, False]


def test_jpeg_codec_round_trip():
    import numpy as np
    from flink_ml_spark.llmdata.codecs import (decode_jpeg, encode_jpeg,
                                               sniff_format)

    # solid colors: DC-only blocks round-trip bit-exactly at q90 —
    # exhaustive over the exact color cycle media_codec_pipeline uses
    for d in range(256):
        rgb = np.array([d % 256, (2 * d) % 256, (3 * d) % 256],
                       dtype=np.uint8)
        img = np.ascontiguousarray(np.broadcast_to(rgb, (8, 8, 3)))
        payload = encode_jpeg(img, 90)
        assert sniff_format(payload) == "jpeg"
        back = decode_jpeg(payload)
        np.testing.assert_array_equal(back, img), d
    # gradient, non-multiple-of-8 dims: lossy but close
    img2 = np.zeros((21, 13, 3), np.uint8)
    img2[..., 0] = np.linspace(0, 255, 21)[:, None].round()
    img2[..., 1] = np.linspace(255, 0, 13)[None, :].round()
    img2[..., 2] = 128
    d95 = decode_jpeg(encode_jpeg(img2, 95))
    assert d95.shape == (21, 13, 3)
    assert np.abs(d95.astype(int) - img2.astype(int)).max() <= 6
    # higher quality → smaller error
    d50 = decode_jpeg(encode_jpeg(img2, 50))
    assert (np.abs(d95.astype(float) - img2).mean()
            <= np.abs(d50.astype(float) - img2).mean())
    # robustness: truncation and non-JPEG inputs return None, not raise
    assert decode_jpeg(encode_jpeg(img2)[:60]) is None
    assert decode_jpeg(b"\xff\xd8garbage") is None
    assert decode_jpeg(None) is None


def test_jpeg_chroma_subsampling_and_restart():
    import numpy as np
    from flink_ml_spark.llmdata.codecs import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(7)
    img = np.zeros((37, 29, 3), np.uint8)
    img[..., 0] = np.linspace(0, 255, 37)[:, None].round()
    img[..., 1] = np.linspace(255, 0, 29)[None, :].round()
    img[..., 2] = 77
    # 4:2:0 (2x2 sampling factors, odd dims) and restart markers drive
    # the decoder's MCU-interleave / upsample / RSTn paths
    for ss in ("444", "420"):
        for ri in (0, 3):
            dec = decode_jpeg(encode_jpeg(img, 85, subsampling=ss,
                                          restart_interval=ri))
            assert dec is not None and dec.shape == img.shape, (ss, ri)
            tol = 6 if ss == "444" else 24  # chroma halved on a gradient
            assert np.abs(dec.astype(int) - img.astype(int)).max() \
                <= tol, (ss, ri)
    # solid color stays exact under both samplings + restarts
    solid = np.full((24, 24, 3), [13, 26, 39], dtype=np.uint8)
    for ss in ("444", "420"):
        dec = decode_jpeg(encode_jpeg(solid, 90, subsampling=ss,
                                      restart_interval=1))
        np.testing.assert_array_equal(dec, solid)


def test_image_resizer_decode_real_jpeg(spark):
    import numpy as np
    from flink_ml_spark.llmdata import ImageResizer, MediaFeatureExtractor
    from flink_ml_spark.llmdata.codecs import encode_jpeg

    rgb = np.array([120, 240, 104], dtype=np.uint8)
    img = np.ascontiguousarray(np.broadcast_to(rgb, (8, 8, 3)))
    df = spark.createDataFrame([(1, bytearray(encode_jpeg(img, 90)))],
                               "media_id long, payload binary")
    rz = ImageResizer(mode="decode", targetWidth=4, targetHeight=4) \
        .transform(df)[0]
    feat = MediaFeatureExtractor(featureDim=3).set_(kernel="strict") \
        .transform(rz)[0].first()
    assert feat["media_features_decoded"] is True
    got = [round(v * 255) for v in feat["media_features"]]
    assert got == [120, 240, 104]


def test_png_adam7_interlace_round_trip():
    """Adam7: encode(interlace=True) → decode must reproduce the image
    exactly across sizes that exercise empty and partial passes (1x1
    has only pass 1; 5x3, 9x7 hit ragged pass geometry; 16x16 fills
    all seven)."""
    import numpy as np
    from flink_ml_spark.llmdata.codecs import (decode_png, encode_png,
                                               sniff_format)
    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (3, 5), (5, 3), (7, 9), (8, 8), (16, 16),
                 (2, 13)]:
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        payload = encode_png(img, interlace=True)
        assert sniff_format(payload) == "png"
        back = decode_png(payload)
        assert back is not None and back.shape == (h, w, 3), (h, w)
        np.testing.assert_array_equal(back, img)
        # interlaced and sequential encodings decode identically
        np.testing.assert_array_equal(back, decode_png(encode_png(img)))


def test_png_adam7_against_reference_scatter():
    """The pass lattice itself, checked against an independent per-pixel
    reference: pixel (x, y) belongs to the FIRST Adam7 pass whose
    lattice contains it, and every pixel is covered exactly once."""
    from flink_ml_spark.llmdata.codecs import _ADAM7
    h = w = 16
    seen = {}
    for p, (x0, y0, dx, dy) in enumerate(_ADAM7):
        for y in range(y0, h, dy):
            for x in range(x0, w, dx):
                assert (x, y) not in seen, (x, y, p, seen[(x, y)])
                seen[(x, y)] = p
    assert len(seen) == h * w


def test_gif_roundtrip_random_palettes():
    import numpy as np
    from flink_ml_spark.llmdata.codecs import (decode_gif, decode_image,
                                               encode_gif, sniff_format)
    rng = np.random.RandomState(7)
    for _ in range(20):
        h, w = rng.randint(1, 33), rng.randint(1, 33)
        ncol = int(rng.choice([1, 2, 3, 7, 16, 200, 256]))
        pal = rng.randint(0, 256, (ncol, 3)).astype("uint8")
        img = pal[rng.randint(0, ncol, (h, w))]
        for inter in (False, True):
            payload = encode_gif(img, interlace=inter)
            assert sniff_format(payload) == "gif"
            back = decode_gif(payload)
            assert back is not None and (back == img).all()
            assert (decode_image(payload) == img).all()


def test_gif_lzw_width_boundary_stress():
    """Dense distinct-pair stream drives the LZW dict through multiple
    code-width boundaries and to the 4096 cap (growth stops, no
    clear)."""
    import numpy as np
    from flink_ml_spark.llmdata.codecs import decode_gif, encode_gif
    v = np.arange(128 * 128 * 3, dtype=np.uint64)
    img = (((v * 2654435761) % 251) % 8).astype("uint8").reshape(
        128, 128, 3) * 30
    assert (decode_gif(encode_gif(img)) == img).all()


def test_gif_palette_cap_raises():
    import numpy as np
    import pytest as pt
    from flink_ml_spark.llmdata.codecs import encode_gif
    img = np.random.RandomState(1).randint(
        0, 256, (20, 20, 3)).astype("uint8")  # ~400 distinct colors
    with pt.raises(ValueError, match="palette"):
        encode_gif(img)


def test_animated_gif_roundtrip_and_composition():
    import numpy as np
    from flink_ml_spark.llmdata.codecs import (decode_gif_frames,
                                               encode_gif_animation)
    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (12, 3)).astype("uint8")
    frames = [pal[rng.randint(0, 12, (10, 14))] for _ in range(4)]
    payload = encode_gif_animation(frames, delays_cs=[5, 10, 15, 20])
    out = decode_gif_frames(payload)
    assert [d for d, _ in out] == [50, 100, 150, 200]
    for (_, canvas), orig in zip(out, frames):
        assert (canvas == orig).all()
    # >256 colors across frames fail fast
    import pytest as pt
    many = [rng.randint(0, 256, (16, 16, 3)).astype("uint8")
            for _ in range(2)]
    with pt.raises(ValueError, match="palette"):
        encode_gif_animation(many)


def test_gif_frame_sampler_operator(spark):
    import numpy as np
    from flink_ml_spark.llmdata import GifFrameSampler
    from flink_ml_spark.llmdata.codecs import encode_gif_animation

    def solid(rgb):
        return np.ascontiguousarray(np.broadcast_to(
            np.array(rgb, dtype=np.uint8), (6, 6, 3)))

    p1 = encode_gif_animation([solid((10, 20, 30)), solid((40, 50, 60)),
                               solid((70, 80, 90)), solid((5, 6, 7))],
                              delays_cs=[10, 20, 30, 40])
    df = spark.createDataFrame([(1, bytearray(p1)), (2, None),
                                (3, bytearray(b"not a gif"))],
                               "media_id long, payload binary")
    out = GifFrameSampler(idCol="media_id", inputCol="payload",
                          numFrames=2).transform(df)[0]
    rows = {(r["media_id"], r["frame_idx"]): r for r in out.collect()}
    # undecodable payloads emit nothing; frames 0 and 2 sampled
    assert set(rows) == {(1, 0), (1, 2)}
    assert rows[(1, 0)]["ts_ms"] == 0
    assert rows[(1, 2)]["ts_ms"] == 300  # 100 + 200 ms before frame 2
    assert rows[(1, 2)]["r_mean"] == 70.0
    assert rows[(1, 0)]["b_mean"] == 30.0
