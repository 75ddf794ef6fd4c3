"""Pure-Python XXH64 — driver-side twin of Spark's ``xxhash64``.

Public algorithm: Yann Collet's xxHash, 64-bit variant (public-domain
reference at github.com/Cyan4973/xxHash; the algorithm spec is in its
doc/xxhash_spec.md). Spark's ``xxhash64(string)`` is XXH64 over the
string's UTF-8 bytes with seed 42, reinterpreted as a SIGNED 64-bit
long — this module reproduces that exactly, so driver-side code can
compute the engine's own hash values (e.g. the text index's term →
bucket routing) without scheduling anything or paying a py4j
round trip per lookup.

Parity with the engine is pinned exhaustively in
tests/test_text_index.py (every input-length class of the algorithm —
empty, <4, <8, <32, 32+ bytes, multi-byte UTF-8) — a wrong hash here
would silently misroute a query term to the wrong posting bucket, so
the twin is trusted only as far as that pin.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261

SPARK_SEED = 42  # org.apache.spark.sql.catalyst.expressions.XxHash64's seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data`` as an UNSIGNED 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        acc = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            acc = ((acc ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        acc = (seed + _P5) & _M
    acc = (acc + n) & _M
    while i + 8 <= n:
        acc = (_rotl(acc ^ _round(0, int.from_bytes(data[i : i + 8], "little")), 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        acc = (_rotl(acc ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _M), 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        acc = (_rotl(acc ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & _M
    acc ^= acc >> 29
    acc = (acc * _P3) & _M
    acc ^= acc >> 32
    return acc


def spark_xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """The exact value Spark's ``xxhash64(lit(s))`` returns: XXH64 over
    the UTF-8 bytes, reinterpreted as a SIGNED long."""
    v = xxh64(s.encode("utf-8"), seed)
    return v - (1 << 64) if v >= (1 << 63) else v
