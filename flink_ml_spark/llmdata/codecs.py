"""Pure-numpy media codecs — no external image/audio libraries.

Uncompressed BMP (24/32-bit BITMAPINFOHEADER) and PCM WAV (16-bit RIFF)
are plain header parses over flat sample buffers, so they decode with
numpy alone.  PNG (8-bit gray/RGB/RGBA, non-interlaced — the bulk of
real-web PNGs) decodes too: DEFLATE is in the Python stdlib (zlib), so
only the scanline unfiltering needs implementing (PNG spec §6, public).
Remaining compressed codecs (JPEG/MP3/H.264) still need PIL/ffmpeg
plugged into the same mapInPandas slots.

All functions return None on anything they cannot parse — callers treat
None as "needs an external codec".
"""

from __future__ import annotations

import struct
import zlib

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (8-bit depth only; palette needs PLTE
# indirection and sub-byte packing — return None, route externally)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def decode_png(payload: bytes | None) -> np.ndarray | None:
    """PNG (8-bit gray / RGB / RGBA, non-interlaced) → HxWx3 uint8 RGB.

    DEFLATE via stdlib zlib; scanline unfiltering per the PNG spec §6
    (filters 0-4: None/Sub/Up/Average/Paeth).  Gray broadcasts to RGB;
    alpha is dropped (feature kernels consume RGB).  Interlaced, paletted
    or 16-bit images return None — external-codec territory."""
    if payload is None or len(payload) < 45 \
            or payload[:8] != _PNG_SIG:
        return None
    pos, n = 8, len(payload)
    w = h = None
    ctype = None
    idat = []
    while pos + 8 <= n:
        (sz,) = struct.unpack_from(">I", payload, pos)
        cid = payload[pos + 4:pos + 8]
        body = pos + 8
        if body + sz > n:
            return None
        if cid == b"IHDR":
            if sz != 13:
                return None
            w, h, depth, ctype, comp, filt, inter = struct.unpack_from(
                ">IIBBBBB", payload, body)
            if (depth != 8 or ctype not in _PNG_CHANNELS or comp != 0
                    or filt != 0 or inter != 0 or w == 0 or h == 0):
                return None
        elif cid == b"IDAT":
            idat.append(payload[body:body + sz])
        elif cid == b"IEND":
            break
        pos = body + sz + 4  # skip CRC
    if w is None or not idat:
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    ch = _PNG_CHANNELS[ctype]
    stride = w * ch
    if len(raw) < h * (stride + 1):
        return None
    lines = np.frombuffer(raw, np.uint8,
                          count=h * (stride + 1)).reshape(h, stride + 1)
    filters = lines[:, 0]
    data = lines[:, 1:].astype(np.int32)  # headroom for the filter sums
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, row = int(filters[y]), data[y]
        if f == 0:
            rec = row.copy()
        elif f == 1:  # Sub: recon[x] = filt[x] + recon[x-ch]
            rec = row.copy()
            for c in range(ch):  # per-channel cumsum = the sequential sum
                rec[c::ch] = np.cumsum(rec[c::ch]) & 0xFF
        elif f == 2:  # Up
            rec = (row + prev) & 0xFF
        elif f == 3:  # Average: left/2 + up/2 — left is sequential
            rec = row.copy()
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth — sequential in x by definition
            rec = row.copy()
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            return None
        out[y] = rec
        prev = rec
    px = out.astype(np.uint8).reshape(h, w, ch)
    if ctype == 0:
        px = np.repeat(px, 3, axis=2)
    elif ctype == 6:
        px = px[:, :, :3]
    return np.ascontiguousarray(px)


def encode_png(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB array → PNG bytes (filter 0, one IDAT)."""
    h, w = img.shape[:2]
    body = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    body[:, 1:] = img.reshape(h, w * 3)

    def chunk(cid: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + cid + data
                + struct.pack(">I", zlib.crc32(cid + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(body.tobytes(), 6))
            + chunk(b"IEND", b""))


def decode_image(payload: bytes | None) -> np.ndarray | None:
    """Any bundled image codec → HxWx3 uint8 RGB (BMP, then PNG)."""
    img = decode_bmp(payload)
    if img is None:
        img = decode_png(payload)
    return img


def resize_nearest(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resize (H, W, C) → (th, tw, C)."""
    h, w = img.shape[:2]
    ys = (np.arange(th) * h // th).clip(0, h - 1)
    xs = (np.arange(tw) * w // tw).clip(0, w - 1)
    return img[ys][:, xs]


def _resize_reencode(payload: bytes | None, tw: int, th: int) -> bytes | None:
    """Decode (BMP or PNG) → nearest resize → re-encode in the SAME
    container; None when no bundled codec parses the payload."""
    img = decode_bmp(payload)
    if img is not None:
        return encode_bmp(resize_nearest(img, tw, th))
    img = decode_png(payload)
    if img is not None:
        return encode_png(resize_nearest(img, tw, th))
    return None


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
