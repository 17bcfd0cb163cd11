"""Pure-Python XXH64 matching Spark's `xxhash64(...)` expression —
the INDEPENDENT reference used to oracle-check the RandomDB datagen
(sources/randomdb.py), whose non-key cells derive from xxhash64 and
therefore have no DuckDB-native analog.

Implements the public XXH64 algorithm (Yann Collet's xxHash spec,
github.com/Cyan4973/xxHash) exactly as Spark applies it:

* seed 42, then per-column CHAINING — each column's hash becomes the
  seed for the next (o.a.s.sql.catalyst.expressions.XxHash64);
* LongType  → the 8-byte single-lane fast path;
* IntegerType → the 4-byte fast path (ints are NOT widened to longs);
* StringType  → full byte-stream hash over the UTF-8 bytes
  (8-byte words, then one 4-byte step, then per-byte tail).

tests/test_sources.py proves this implementation reproduces Spark's
output cell-for-cell, which is what lets the committed golden parquet
(tests/fixtures/randomdb_account_golden.parquet, written by
tests/fixtures/make_randomdb_golden.py) serve as the src01 DuckDB
oracle without circularity.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _lane_round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def hash_long(v: int, seed: int) -> int:
    """XXH64 of one 64-bit lane (Spark LongType path)."""
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl(((v & _M) * _P2) & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_int(v: int, seed: int) -> int:
    """XXH64 of one 32-bit lane (Spark IntegerType path)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((v & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """XXH64 of a byte stream (Spark StringType path: UTF-8 bytes)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _lane_round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _lane_round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _lane_round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _lane_round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i : i + 4], "little")
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def spark_xxhash64(*items, seed: int = 42) -> int:
    """Spark's xxhash64(cols...): chain each typed value, previous
    hash as seed. Items are (kind, value) with kind in
    {'long', 'int', 'str'}. Returns the SIGNED 64-bit result Spark
    yields (two's complement)."""
    h = seed
    for kind, v in items:
        if kind == "long":
            h = hash_long(v, h)
        elif kind == "int":
            h = hash_int(v, h)
        elif kind == "str":
            h = hash_bytes(v.encode("utf-8"), h)
        else:
            raise ValueError(f"unsupported kind {kind!r}")
    return h - (1 << 64) if h >= (1 << 63) else h


def u32(*items, seed: int = 42) -> int:
    """randomdb._u32 mirror: xxhash64(...) & 0xFFFFFFFF (bitwiseAND on
    the signed value == masking the unsigned low 32 bits)."""
    return spark_xxhash64(*items, seed=seed) & 0xFFFFFFFF
