"""Pure-numpy media codecs — no external image/audio libraries.

Uncompressed BMP (24/32-bit BITMAPINFOHEADER) and PCM WAV (16-bit RIFF)
are plain header parses over flat sample buffers, so they decode with
numpy alone.  PNG (8-bit gray/RGB/RGBA, non-interlaced — the bulk of
real-web PNGs) decodes too: DEFLATE is in the Python stdlib (zlib), so
only the scanline unfiltering needs implementing (PNG spec §6, public).
Baseline sequential JPEG (ITU T.81: SOF0, 8-bit, Huffman, 1-2x chroma
sampling, restart intervals) encodes and decodes here as well — quant /
Huffman table handling, the zig-zag, and the 8x8 DCT pair are all
public-spec constants and numpy linear algebra.  The pure-Python
entropy loop makes this the CORRECTNESS / bootstrap path; production
pipelines should still plug PIL/libjpeg-turbo into the same
mapInPandas slots for throughput (progressive JPEG, MP3, H.264 remain
external-only).

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


# Adam7 interlace pass grid (PNG spec §8.2): (x0, y0, dx, dy) per pass —
# the IDAT stream holds 7 independently-filtered reduced images in this
# order; empty passes (reduced width or height 0) contribute no bytes
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_unfilter(raw: bytes, off: int, ph: int, pw: int,
                  ch: int) -> tuple[np.ndarray, int] | None:
    """Unfilter one (sub-)image of ``ph`` scanlines × ``pw`` pixels
    starting at byte ``off`` of the decompressed stream (PNG spec §6,
    filters 0-4: None/Sub/Up/Average/Paeth); returns (ph×pw×ch uint8,
    next offset) or None on truncation / unknown filter."""
    stride = pw * ch
    need = ph * (stride + 1)
    if len(raw) - off < need:
        return None
    lines = np.frombuffer(raw, np.uint8, count=need,
                          offset=off).reshape(ph, stride + 1)
    filters = lines[:, 0]
    data = lines[:, 1:].astype(np.int32)  # headroom for the filter sums
    out = np.zeros((ph, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(ph):
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
    return out.astype(np.uint8).reshape(ph, pw, ch), off + need


def decode_png(payload: bytes | None) -> np.ndarray | None:
    """PNG (8-bit gray / RGB / RGBA; sequential OR Adam7-interlaced) →
    HxWx3 uint8 RGB.

    DEFLATE via stdlib zlib; scanline unfiltering per the PNG spec §6
    (filters 0-4: None/Sub/Up/Average/Paeth).  Adam7 streams carry 7
    independently-filtered reduced images (spec §8.2) that scatter back
    into the full grid by the pass lattice.  Gray broadcasts to RGB;
    alpha is dropped (feature kernels consume RGB).  Paletted or 16-bit
    images return None — external-codec territory."""
    if payload is None or len(payload) < 45 \
            or payload[:8] != _PNG_SIG:
        return None
    pos, n = 8, len(payload)
    w = h = None
    ctype = inter = None
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
                    or filt != 0 or inter not in (0, 1)
                    or w == 0 or h == 0):
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
    if inter == 0:
        res = _png_unfilter(raw, 0, h, w, ch)
        if res is None:
            return None
        px = res[0]
    else:
        px = np.zeros((h, w, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            res = _png_unfilter(raw, off, ph, pw, ch)
            if res is None:
                return None
            sub, off = res
            px[y0::dy, x0::dx] = sub
    if ctype == 0:
        px = np.repeat(px, 3, axis=2)
    elif ctype == 6:
        px = px[:, :, :3]
    return np.ascontiguousarray(px)


def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """HxWx3 uint8 RGB array → PNG bytes (filter 0, one IDAT);
    ``interlace=True`` writes the Adam7 pass sequence (spec §8.2)."""
    h, w = img.shape[:2]
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            body = np.zeros((ph, pw * 3 + 1), dtype=np.uint8)
            body[:, 1:] = sub.reshape(ph, pw * 3)
            parts.append(body.tobytes())
        data = b"".join(parts)
    else:
        body = np.zeros((h, w * 3 + 1), dtype=np.uint8)
        body[:, 1:] = img.reshape(h, w * 3)
        data = body.tobytes()

    def chunk(cid: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + cid + data
                + struct.pack(">I", zlib.crc32(cid + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0,
                       1 if interlace else 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(data, 6))
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU T.81).  All tables below are the public Annex-K
# example tables; the zig-zag order and DCT basis are spec constants.

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99]).reshape(8, 8)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99]).reshape(8, 8)

# Annex-K Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
_HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                 list(range(12)))
_HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                   list(range(12)))
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_basis() -> np.ndarray:
    """8x8 orthonormal DCT-II matrix C: forward F = C·B·Cᵀ, inverse
    B = Cᵀ·F·C."""
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8)
    c[0] *= np.sqrt(0.5)
    return c


_DCT = _dct_basis()


def _huff_codes(bits, vals):
    """Canonical Huffman assignment (T.81 Annex C): symbol → (code,
    length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 = Annex-K tables, 100 = near-lossless."""
    q = max(1, min(100, int(quality)))
    s = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((table * s + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.buf)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0], axis=-1)


def _mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value → (category, appended bits)."""
    s = int(v)
    size = int(abs(s)).bit_length()
    if s < 0:
        s += (1 << size) - 1
    return size, s


def _pad_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate a 2-D plane to (bh·8, bw·8)."""
    h, w = plane.shape
    out = np.empty((bh * 8, bw * 8))
    out[:h, :w] = plane
    out[h:, :w] = plane[-1:, :]
    out[:, w:] = out[:, w - 1:w]
    return out


def _encode_block(wr: _BitWriter, block: np.ndarray, qt: np.ndarray,
                  hdc: dict, hac: dict, prev_dc: int) -> int:
    """DCT → quantize → zig-zag → Huffman one 8x8 block; returns the
    new DC predictor."""
    coef = _DCT @ block @ _DCT.T
    qz = np.round(coef / qt).astype(np.int64)
    zz = qz.reshape(64)[_ZIGZAG]
    size, bitsv = _mag_bits(int(zz[0]) - prev_dc)
    code, ln = hdc[size]
    wr.put(code, ln)
    if size:
        wr.put(bitsv, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = hac[0xF0]  # ZRL
            wr.put(code, ln)
            run -= 16
        size, bitsv = _mag_bits(v)
        code, ln = hac[(run << 4) | size]
        wr.put(code, ln)
        wr.put(bitsv, size)
        run = 0
    if last < 63:
        code, ln = hac[0x00]  # EOB
        wr.put(code, ln)
    return int(zz[0])


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """HxWx3 uint8 RGB → baseline JFIF JPEG (Annex-K Huffman tables).
    ``subsampling``: "444" (full chroma) or "420" (2x2 box-averaged
    chroma, the common web default).  ``restart_interval`` > 0 emits
    DRI + RSTn markers every that many MCUs.  Lossy: expect per-channel
    reconstruction error of a few counts at the default quality."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = img.shape[:2]
    ycc = _rgb_to_ycbcr(img.astype(np.uint8)) - 128.0
    qt = [_scaled_quant(_QUANT_LUMA, quality),
          _scaled_quant(_QUANT_CHROMA, quality)]
    hdc = [_huff_codes(*_HUFF_DC_LUMA), _huff_codes(*_HUFF_DC_CHROMA)]
    hac = [_huff_codes(*_HUFF_AC_LUMA), _huff_codes(*_HUFF_AC_CHROMA)]
    sub = 2 if subsampling == "420" else 1
    planes = [ycc[..., 0]]
    for c in (1, 2):
        p = ycc[..., c]
        if sub == 2:  # 2x2 box average (pad odd edges by replication)
            if h % 2:
                p = np.vstack([p, p[-1:]])
            if w % 2:
                p = np.hstack([p, p[:, -1:]])
            p = (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2]
                 + p[1::2, 1::2]) / 4.0
        planes.append(p)
    # MCU grid sized by the luma sampling factor
    mcux = (w + 8 * sub - 1) // (8 * sub)
    mcuy = (h + 8 * sub - 1) // (8 * sub)
    samp = [(sub, sub), (1, 1), (1, 1)]
    padded = [_pad_blocks(planes[ci], mcuy * samp[ci][1],
                          mcux * samp[ci][0]) for ci in range(3)]
    wr = _BitWriter()
    prev_dc = [0, 0, 0]
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                data = wr.flush()
                wr = _BitWriter()
                wr.buf = bytearray(data)
                wr.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                prev_dc = [0, 0, 0]
            for ci in range(3):
                t = 0 if ci == 0 else 1
                hs, vs = samp[ci]
                for byi in range(vs):
                    for bxi in range(hs):
                        py = (my * vs + byi) * 8
                        px = (mx * hs + bxi) * 8
                        block = padded[ci][py:py + 8, px:px + 8]
                        prev_dc[ci] = _encode_block(
                            wr, block, qt[t], hdc[t], hac[t], prev_dc[ci])
            mcu_count += 1

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid])
                   + bytes(int(x) for x in table.reshape(64)[_ZIGZAG]))

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(vals))

    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, (sub << 4) | sub, 0, 2, 0x11, 1, 3, 0x11, 1]))
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    jfif = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = (seg(0xFFDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    return (b"\xff\xd8" + jfif + dqt(0, qt[0]) + dqt(1, qt[1]) + sof
            + dht(0, 0, _HUFF_DC_LUMA) + dht(1, 0, _HUFF_AC_LUMA)
            + dht(0, 1, _HUFF_DC_CHROMA) + dht(1, 1, _HUFF_AC_CHROMA)
            + dri + sos + wr.flush() + b"\xff\xd9")


class _BitReader:
    """Entropy-segment bit reader with FF00 unstuffing and restart-
    marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # pending marker encountered mid-stream

    def _fill(self) -> bool:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.d):
                return self.nbits > 0
            b = self.d[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(self.d):
                    return self.nbits > 0
                nxt = self.d[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                    self.marker = nxt
                    return self.nbits > 0
                else:
                    self.marker = nxt
                    return self.nbits > 0
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        return True

    def bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        if self.nbits == 0:
            return None
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def align_restart(self) -> bool:
        """Discard pad bits, consume an RSTn marker; False on anything
        else."""
        self.nbits = 0
        self.acc = 0
        if self.marker is None:
            # marker not yet reached: scan forward
            while self.pos + 1 < len(self.d):
                if self.d[self.pos] == 0xFF \
                        and self.d[self.pos + 1] != 0x00:
                    self.marker = self.d[self.pos + 1]
                    break
                self.pos += 1
        if self.marker is None or not 0xD0 <= self.marker <= 0xD7:
            return False
        self.pos += 2  # past FF Dn
        self.marker = None
        return True


def _huff_decode(rd: _BitReader, table: dict) -> int | None:
    code, length = 0, 0
    while length < 16:
        b = rd.bit()
        if b is None:
            return None
        code = (code << 1) | b
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    return None


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: appended bits → signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes | None) -> np.ndarray | None:
    """Baseline sequential JFIF JPEG → HxWx3 uint8 RGB.  Supports 8-bit
    SOF0, 1 or 3 components, sampling factors 1-2, restart intervals.
    Progressive (SOF2), arithmetic, 12-bit and CMYK return None."""
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    n = len(payload)
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None  # [(cid, hs, vs, tq)]
    h = w = 0
    restart = 0
    scan = None
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (sz,) = struct.unpack_from(">H", payload, pos + 2)
        body = pos + 4
        end = pos + 2 + sz
        if end > n:
            return None
        if marker == 0xDB:  # DQT (possibly several tables)
            p = body
            while p < end:
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    return None  # 16-bit tables: out of scope
                tab = np.empty(64, np.int32)
                tab[_ZIGZAG] = np.frombuffer(payload, np.uint8, 64, p + 1)
                qts[tq] = tab.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = body
            while p < end:
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1:p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17:p + 17 + nv])
                spec = _huff_codes(bits, vals)
                huff[(cls, tid)] = {(c, ln): s
                                    for s, (c, ln) in spec.items()}
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, body)
            if prec != 8 or nc not in (1, 3) or h == 0 or w == 0:
                return None
            comps = []
            for i in range(nc):
                cid = payload[body + 6 + 3 * i]
                samp = payload[body + 7 + 3 * i]
                hs, vs = samp >> 4, samp & 0xF
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    return None
                comps.append([cid, hs, vs, payload[body + 8 + 3 * i]])
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", payload, body)
        elif marker == 0xDA:  # SOS
            ns = payload[body]
            if comps is None or ns != len(comps):
                return None  # non-interleaved multi-scan: out of scope
            scan = []
            for i in range(ns):
                cs = payload[body + 1 + 2 * i]
                tt = payload[body + 2 + 2 * i]
                match = [c for c in comps if c[0] == cs]
                if not match:
                    return None
                scan.append((match[0], tt >> 4, tt & 0xF))
            pos = end
            break
        pos = end
    if scan is None or not qts:
        return None

    hmax = max(c[1] for c, _, _ in scan)
    vmax = max(c[2] for c, _, _ in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c, _, _ in scan:
        planes.append(np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8),
                               np.float64))
    rd = _BitReader(payload, pos)
    prev_dc = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                if not rd.align_restart():
                    return None
                prev_dc = [0] * len(scan)
            for ci, (c, td, ta) in enumerate(scan):
                _, hs, vs, tq = c
                dct = huff.get((0, td))
                act = huff.get((1, ta))
                qt = qts.get(tq)
                if dct is None or act is None or qt is None:
                    return None
                for byi in range(vs):
                    for bxi in range(hs):
                        size = _huff_decode(rd, dct)
                        if size is None or size > 15:
                            return None
                        diff = 0
                        if size:
                            v = rd.bits(size)
                            if v is None:
                                return None
                            diff = _extend(v, size)
                        prev_dc[ci] += diff
                        zz = np.zeros(64, np.int64)
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(rd, act)
                            if rs is None:
                                return None
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                return None
                            v = rd.bits(size)
                            if v is None:
                                return None
                            zz[k] = _extend(v, size)
                            k += 1
                        coef = np.zeros(64, np.float64)
                        coef[_ZIGZAG] = zz * qt.reshape(64)[_ZIGZAG]
                        block = _DCT.T @ coef.reshape(8, 8) @ _DCT
                        py = (my * vs + byi) * 8
                        px = (mx * hs + bxi) * 8
                        planes[ci][py:py + 8, px:px + 8] = block
            mcu_count += 1
    out = []
    for ci, (c, _, _) in enumerate(scan):
        _, hs, vs, _ = c
        p = planes[ci]
        if hs < hmax:
            p = np.repeat(p, hmax // hs, axis=1)
        if vs < vmax:
            p = np.repeat(p, vmax // vs, axis=0)
        out.append(p[:h, :w] + 128.0)
    if len(out) == 1:
        y = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(y[:, :, None], 3, axis=2))
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.ascontiguousarray(
        np.clip(np.round(rgb), 0, 255).astype(np.uint8))



# --- GIF (GIF89a, palette + LZW) --------------------------------------------
# Spec: GIF89a (CompuServe 1990, public specification).  Single-frame,
# global color table, optional 4-pass interlace; LZW with variable code
# width, CLEAR/EOI codes, 12-bit table cap (growth stops at 4096 — the
# spec-legal "stop adding" strategy, mirrored by the decoder).

_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step) per pass


def _gif_interlace_order(h: int) -> list[int]:
    rows = []
    for start, step in _GIF_INTERLACE:
        rows.extend(range(start, h, step))
    return rows


def _lzw_encode(indices, min_size: int) -> bytes:
    clear, eoi = 1 << min_size, (1 << min_size) + 1
    out = bytearray()
    acc = n_acc = 0

    def emit(code: int, width: int):
        nonlocal acc, n_acc
        acc |= code << n_acc
        n_acc += width
        while n_acc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8

    width = min_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear, width)
    it = iter(indices)
    cur = next(it)
    for k in it:
        if (cur, k) in table:
            cur = table[(cur, k)]
            continue
        emit(cur, width)
        if next_code < 4096:
            table[(cur, k)] = next_code
            next_code += 1
            # sync rule: the decoder bumps after ITS lagged add when
            # next_code hits 2^width; the encoder's add runs one step
            # ahead, so it bumps at 2^width + 1 (verified round-trip +
            # width-boundary tests)
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        cur = k
    emit(cur, width)
    emit(eoi, width)
    if n_acc:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_size: int, n_pixels: int) -> list[int]:
    clear, eoi = 1 << min_size, (1 << min_size) + 1
    pos = 0  # bit cursor

    def read(width: int):
        nonlocal pos
        byte, bit = pos >> 3, pos & 7
        v = 0
        for i in range(width):
            if byte >= len(data):
                return None
            v |= ((data[byte] >> bit) & 1) << i
            bit += 1
            if bit == 8:
                bit, byte = 0, byte + 1
        pos += width
        return v

    out: list[int] = []
    width = min_size + 1
    table = {i: [i] for i in range(clear)}
    next_code = eoi + 1
    prev: list[int] | None = None
    while len(out) < n_pixels:
        code = read(width)
        if code is None or code == eoi:
            break
        if code == clear:
            width = min_size + 1
            table = {i: [i] for i in range(clear)}
            next_code = eoi + 1
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + [prev[0]]
        else:
            return out  # corrupt stream: return what we have
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out[:n_pixels]


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W, 3) uint8 → single-frame GIF89a with a global color table.
    Fails fast past 256 distinct colors (palette format — quantization
    is a modeling decision, not a codec's)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"encode_gif: {len(palette)} distinct colors "
                         f"exceed the 256-entry GIF palette")
    pal_bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    pal_size = 1 << pal_bits
    idx = inverse.reshape(h, w)
    if interlace:
        idx = idx[_gif_interlace_order(h)]
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (pal_bits - 1))  # GCT flag + size bits
    out.append(0)  # background color index
    out.append(0)  # aspect ratio
    gct = np.zeros((pal_size, 3), dtype=np.uint8)
    gct[:len(palette)] = palette
    out += gct.tobytes()
    out += b"\x2c" + b"\x00" * 4  # image descriptor at (0,0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x40 if interlace else 0)  # no LCT
    min_size = max(2, pal_bits)
    out.append(min_size)
    lzw = _lzw_encode(idx.ravel().tolist(), min_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(payload: bytes | None) -> np.ndarray | None:
    """Single-frame GIF87a/89a → (H, W, 3) uint8 RGB (global or local
    palette, optional interlace; extensions skipped).  None if the
    payload is not a GIF."""
    if payload is None or len(payload) < 13 or \
            payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        flags = payload[10]
        pos = 13
        gct = None
        if flags & 0x80:
            n = 2 << (flags & 7)
            gct = np.frombuffer(payload[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        while pos < len(payload):
            b = payload[pos]
            if b == 0x21:  # extension: label + sub-blocks
                pos += 2
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            elif b == 0x2C:
                break
            elif b == 0x3B:
                return None
            else:
                return None
        iw = int.from_bytes(payload[pos + 5:pos + 7], "little")
        ih = int.from_bytes(payload[pos + 7:pos + 9], "little")
        iflags = payload[pos + 9]
        pos += 10
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(payload[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        if pal is None:
            return None
        min_size = payload[pos]
        pos += 1
        lzw = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            lzw += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        idx = _lzw_decode(bytes(lzw), min_size, iw * ih)
        if len(idx) < iw * ih:
            return None
        grid = np.asarray(idx, dtype=np.int64).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: scatter rows back
            order = _gif_interlace_order(ih)
            out = np.empty_like(grid)
            out[order] = grid
            grid = out
        if grid.max() >= len(pal):
            return None
        return pal[grid]
    except (IndexError, ValueError):
        return None


def encode_gif_animation(frames, delays_cs=None) -> bytes:
    """List of (H, W, 3) uint8 frames (same size, <= 256 distinct colors
    ACROSS all frames) -> animated GIF89a: one global color table, a
    Graphic Control Extension (delay, disposal=1 "do not dispose") per
    frame, full-frame image descriptors.  ``delays_cs`` = per-frame
    delay in centiseconds (default 10)."""
    if not frames:
        raise ValueError("encode_gif_animation: no frames")
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("encode_gif_animation: frames must share shape")
    delays = list(delays_cs) if delays_cs is not None else [10] * len(frames)
    if len(delays) != len(frames):
        raise ValueError(
            f"encode_gif_animation: {len(delays)} delays for "
            f"{len(frames)} frames (must match — a short delay list "
            f"would silently drop trailing frames)")
    allpix = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(allpix, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"encode_gif_animation: {len(palette)} distinct "
                         f"colors exceed the 256-entry GIF palette")
    pal_bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    pal_size = 1 << pal_bits
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (pal_bits - 1))
    out += b"\x00\x00"
    gct = np.zeros((pal_size, 3), dtype=np.uint8)
    gct[:len(palette)] = palette
    out += gct.tobytes()
    # Netscape looping extension (loop forever) - the de-facto standard
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    per = h * w
    min_size = max(2, pal_bits)
    for i, (f, d) in enumerate(zip(frames, delays)):
        out += b"\x21\xf9\x04"          # GCE: disposal=1, no transparency
        out.append(0x04)
        out += int(d).to_bytes(2, "little")
        out += b"\x00\x00"               # no transparent index; terminator
        out += b"\x2c" + b"\x00" * 4
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out.append(0)                     # no LCT, no interlace
        out.append(min_size)
        idx = inverse[i * per:(i + 1) * per]
        lzw = _lzw_encode(idx.tolist(), min_size)
        for j in range(0, len(lzw), 255):
            chunk = lzw[j:j + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def decode_gif_frames(payload: bytes | None):
    """Animated (or single-frame) GIF -> list of (delay_ms, (H, W, 3)
    uint8 RGB canvas) with frames COMPOSITED per the GIF rendering
    model: each image descriptor paints its sub-rectangle onto the
    running canvas (transparent palette index skipped); disposal 2
    clears the painted rectangle to the background color afterwards.
    None if the payload is not a GIF."""
    if payload is None or len(payload) < 13 or \
            payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        flags = payload[10]
        bg_idx = payload[11]
        pos = 13
        gct = None
        if flags & 0x80:
            n = 2 << (flags & 7)
            gct = np.frombuffer(payload[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        bg = gct[bg_idx] if gct is not None and bg_idx < len(gct) \
            else np.zeros(3, dtype=np.uint8)
        canvas = np.broadcast_to(bg, (h, w, 3)).copy()
        frames = []
        delay_ms, disposal, trans_idx = 0, 0, None
        while pos < len(payload):
            b = payload[pos]
            if b == 0x3B:
                break
            if b == 0x21:  # extension
                label = payload[pos + 1]
                pos += 2
                if label == 0xF9:  # Graphic Control Extension
                    sz = payload[pos]
                    packed = payload[pos + 1]
                    delay_ms = int.from_bytes(
                        payload[pos + 2:pos + 4], "little") * 10
                    disposal = (packed >> 2) & 7
                    trans_idx = payload[pos + 4] if packed & 1 else None
                    pos += 1 + sz
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            elif b == 0x2C:  # image descriptor
                left = int.from_bytes(payload[pos + 1:pos + 3], "little")
                top = int.from_bytes(payload[pos + 3:pos + 5], "little")
                iw = int.from_bytes(payload[pos + 5:pos + 7], "little")
                ih = int.from_bytes(payload[pos + 7:pos + 9], "little")
                iflags = payload[pos + 9]
                pos += 10
                pal = gct
                if iflags & 0x80:
                    n = 2 << (iflags & 7)
                    pal = np.frombuffer(payload[pos:pos + 3 * n],
                                        dtype=np.uint8).reshape(-1, 3)
                    pos += 3 * n
                if pal is None:
                    return None
                min_size = payload[pos]
                pos += 1
                lzw = bytearray()
                while payload[pos] != 0:
                    ln = payload[pos]
                    lzw += payload[pos + 1:pos + 1 + ln]
                    pos += 1 + ln
                pos += 1
                idx = _lzw_decode(bytes(lzw), min_size, iw * ih)
                if len(idx) < iw * ih:
                    return None
                grid = np.asarray(idx, dtype=np.int64).reshape(ih, iw)
                if iflags & 0x40:
                    order = _gif_interlace_order(ih)
                    scat = np.empty_like(grid)
                    scat[order] = grid
                    grid = scat
                if grid.max() >= len(pal):
                    return None
                rect = canvas[top:top + ih, left:left + iw]
                painted = pal[grid]
                if trans_idx is not None:
                    mask = grid != trans_idx
                    rect[mask] = painted[mask]
                else:
                    rect[:, :] = painted
                frames.append((delay_ms, canvas.copy()))
                if disposal == 2:  # restore painted rect to background
                    canvas[top:top + ih, left:left + iw] = bg
                delay_ms, disposal, trans_idx = 0, 0, None
            else:
                return None
        return frames or None
    except (IndexError, ValueError):
        return None

def decode_image(payload: bytes | None) -> np.ndarray | None:
    """Any bundled image codec → HxWx3 uint8 RGB (BMP, PNG, GIF,
    then baseline JPEG)."""
    img = decode_bmp(payload)
    if img is None:
        img = decode_png(payload)
    if img is None:
        img = decode_gif(payload)
    if img is None:
        img = decode_jpeg(payload)
    return img


def resize_nearest(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resize (H, W, C) → (th, tw, C)."""
    h, w = img.shape[:2]
    ys = (np.arange(th) * h // th).clip(0, h - 1)
    xs = (np.arange(tw) * w // tw).clip(0, w - 1)
    return img[ys][:, xs]


def _resize_reencode(payload: bytes | None, tw: int, th: int) -> bytes | None:
    """Decode (BMP, PNG, GIF or baseline JPEG) → nearest resize →
    re-encode in the SAME container; None when no bundled codec parses
    the payload."""
    img = decode_bmp(payload)
    if img is not None:
        return encode_bmp(resize_nearest(img, tw, th))
    img = decode_png(payload)
    if img is not None:
        return encode_png(resize_nearest(img, tw, th))
    img = decode_gif(payload)
    if img is not None:
        return encode_gif(resize_nearest(img, tw, th))
    img = decode_jpeg(payload)
    if img is not None:
        return encode_jpeg(resize_nearest(img, tw, th), quality=90)
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
