"""Pure-numpy media codecs — no external image/audio libraries.

Uncompressed BMP (24/32-bit BITMAPINFOHEADER) and PCM WAV (16-bit RIFF)
are plain header parses over flat sample buffers, so they decode with
numpy alone.  These make the multimodal kernels REAL for the formats the
sandbox can express; compressed codecs (JPEG/PNG/MP3/H.264) still need
PIL/ffmpeg plugged into the same mapInPandas slots.

All functions return None on anything they cannot parse — callers treat
None as "needs an external codec".
"""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp(payload: bytes | None) -> np.ndarray | None:
    """Uncompressed 24/32-bit BMP → HxWx3 uint8 RGB array."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    try:
        off = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
    except struct.error:
        return None
    if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        return None
    bottom_up = h > 0
    hh = abs(h)
    bypp = bpp // 8
    row = ((w * bypp + 3) // 4) * 4  # rows pad to 4-byte boundaries
    if off + row * hh > len(payload):
        return None
    data = np.frombuffer(payload, np.uint8, count=row * hh, offset=off)
    px = data.reshape(hh, row)[:, : w * bypp].reshape(hh, w, bypp)
    rgb = px[:, :, :3][:, :, ::-1]  # stored BGR(A) → RGB
    if bottom_up:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB array → uncompressed 24-bit BMP bytes."""
    h, w = img.shape[:2]
    row = ((w * 3 + 3) // 4) * 4
    body = np.zeros((h, row), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, bottom-up
    raw = body.tobytes()
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(raw), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw),
                            2835, 2835, 0, 0))
    return header + raw


def resize_nearest(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resize (H, W, C) → (th, tw, C)."""
    h, w = img.shape[:2]
    ys = (np.arange(th) * h // th).clip(0, h - 1)
    xs = (np.arange(tw) * w // tw).clip(0, w - 1)
    return img[ys][:, xs]


def decode_wav(payload: bytes | None) -> tuple[int, np.ndarray] | None:
    """PCM 16-bit RIFF/WAVE → (sample_rate, samples[n, channels] int16)."""
    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        return None
    pos, n = 12, len(payload)
    fmt = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt " and sz >= 16:
            tag, ch, rate = struct.unpack_from("<HHI", payload, body)
            bits = struct.unpack_from("<H", payload, body + 14)[0]
            fmt = (tag, ch, rate, bits)
        elif cid == b"data":
            if fmt is None:
                return None
            tag, ch, rate, bits = fmt
            if tag != 1 or bits != 16 or ch < 1:
                return None
            count = min(sz, n - body) // 2
            samples = np.frombuffer(payload, "<i2", count=count, offset=body)
            return rate, samples.reshape(-1, ch)
        pos = body + sz + (sz & 1)
    return None


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """(rate, samples[n, ch] int16) → PCM RIFF/WAVE bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    ch = samples.shape[1]
    raw = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)


def sniff_format(payload: bytes | None) -> str:
    """Best-effort container identification from magic bytes (public file
    signatures), for error messages and routing — NOT a decoder."""
    if payload is None or len(payload) < 4:
        return "empty"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[4:8] == b"ftyp":
        return "mp4"
    if payload[:3] == b"ID3" or payload[:2] in (b"\xff\xfb", b"\xff\xf3"):
        return "mp3"
    return "unknown"
