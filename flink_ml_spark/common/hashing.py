"""Deterministic hash functions shared by hashing-trick features.

``spark_murmur3_32`` reproduces Spark SQL's ``F.hash`` on a string column
(Murmur3 x86_32 over UTF-8 bytes, seed 42, with Spark's tail handling:
each trailing byte gets a full mixK1/mixH1 round as a *signed* byte) —
verified bit-exact against the JVM. Public algorithm: Austin Appleby's
MurmurHash3 (public domain), tail variant per Spark's Murmur3_x86_32.

``poly_hash31`` is the cross-engine polynomial rolling hash used by the
oracle queries: h = fold(h*31 + ascii(ch)) mod (2^31 - 1).
"""

from __future__ import annotations

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF
POLY_MOD = 2147483647  # 2^31 - 1


def _rotl(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _M32
    k1 = _rotl(k1, 15)
    return (k1 * _C2) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def spark_murmur3_32(s: str, seed: int = 42) -> int:
    """Signed 32-bit result identical to ``F.hash(lit(s))``."""
    data = s.encode("utf-8")
    n = len(data)
    h1 = seed
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        h1 = _mix_h1(h1, _mix_k1(int.from_bytes(data[i:i + 4], "little")))
    for i in range(aligned, n):
        b = data[i] - 256 if data[i] > 127 else data[i]
        h1 = _mix_h1(h1, _mix_k1(b & _M32))
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def poly_hash31(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % POLY_MOD
    return h
