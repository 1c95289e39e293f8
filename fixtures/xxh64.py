"""Pure-Python XXH64 — oracle-side twin of Spark's ``F.xxhash64``.

Implements the public xxHash64 algorithm (Yann Collet's spec,
https://github.com/Cyan4973/xxHash — BSD) plus the fixed-width int/long
fast paths and the multi-column chaining Spark's Catalyst ``XxHash64``
expression uses (seed 42; each column's hash becomes the seed for the
next; IntegerType hashes 4 bytes, LongType 8 bytes, strings their UTF-8
bytes). This file is INDEPENDENT of htmld_spark — it exists so the driver
contract's DuckDB oracles can read golden parquet composed without running
any Spark code (VERDICT r01, next-round item 2). Equivalence with the JVM
implementation is pinned by tests/test_golden_oracles.py.
"""

from __future__ import annotations

MASK = 0xFFFFFFFFFFFFFFFF
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42  # Catalyst XxHash64 default seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & MASK
    return (_rotl(acc, 31) * P1) & MASK


def xxh64_bytes(data: bytes, seed: int) -> int:
    """xxHash64 of a byte string (unsigned 64-bit result)."""
    seed &= MASK
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed
        v4 = (seed - P1) & MASK
        end = n - 32
        while i <= end:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * P1 + P4) & MASK
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & MASK
        h = (_rotl(h, 23) * P2 + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong — the LongType fast path (8 little-endian bytes)."""
    seed &= MASK
    value &= MASK
    h = (seed + P5 + 8) & MASK
    h ^= (_rotl((value * P2) & MASK, 31) * P1) & MASK
    h = (_rotl(h, 27) * P1 + P4) & MASK
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt — the IntegerType fast path (4 bytes, zero-ext)."""
    seed &= MASK
    h = (seed + P5 + 4) & MASK
    h ^= ((value & 0xFFFFFFFF) * P1) & MASK
    h = (_rotl(h, 23) * P2 + P3) & MASK
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(*cols) -> int:
    """Replicate ``F.xxhash64(*cols)``: seed 42 chained across columns.

    Column typing mirrors how the repo's queries build the expression:
    ``str``/``bytes`` → UTF-8/byte hash; Python int that fits int32 →
    IntegerType literal (``F.lit(i)``); wider int → LongType. Pass
    ``Long(v)`` to force LongType (e.g. for values that came from a
    bigint column). Returns Spark's SIGNED 64-bit result."""
    h = SPARK_SEED
    for c in cols:
        if c is None:
            continue
        if isinstance(c, Long):
            h = xxh64_long(c.value, h)
        elif isinstance(c, bool):
            raise TypeError("boolean hashing not needed/implemented")
        elif isinstance(c, int):
            if -(2**31) <= c < 2**31:
                h = xxh64_int(c, h)
            else:
                h = xxh64_long(c, h)
        elif isinstance(c, str):
            h = xxh64_bytes(c.encode("utf-8"), h)
        elif isinstance(c, bytes):
            h = xxh64_bytes(c, h)
        else:
            raise TypeError(f"unsupported column type {type(c)}")
    return _to_signed(h)


class Long:
    """Marker forcing LongType hashing for small ints that live in bigint
    columns (Spark types by column, not by value)."""

    __slots__ = ("value",)

    def __init__(self, value: int):
        self.value = value
