"""Pure-Python reference of Spark's ``xxhash64`` expression.

The xxHash64 algorithm is public (Yann Collet's xxHash, BSD; Spark's
JVM port lives in ``org.apache.spark.sql.catalyst.expressions.XXH64``).
This module re-derives it bit-for-bit so that hash-seeded operators
(SimHash fingerprints, LSH hyperplanes) get a value-checking oracle in
plain Python/numpy instead of a rows-only check — DuckDB has no
xxhash64, but Python can reproduce the exact longs.

Semantics matched:

- ``spark_xxhash64(*values)``: seed 42, each column's hash becomes the
  seed for the next (Spark's HashExpression fold);
- int-typed columns hash via ``hash_int``, long via ``hash_long``,
  strings via full XXH64 over UTF-8 bytes;
- results are returned as SIGNED 64-bit (Spark longs).

Verified bit-identical to Spark in tests/test_reference_oracles.py.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_int(i: int, seed: int) -> int:
    """XXH64 of one 4-byte int (Spark IntegerType/ShortType/ByteType/
    DateType path). Unsigned result; use to_signed for the Spark long."""
    h = (seed + _P5 + 4) & _M
    h ^= ((i & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_long(l: int, seed: int) -> int:
    """XXH64 of one 8-byte long (Spark LongType/TimestampType path)."""
    h = (seed + _P5 + 8) & _M
    k1 = (l * _P2) & _M
    k1 = _rotl(k1, 31)
    k1 = (k1 * _P1) & _M
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def _fetch64(b: bytes, i: int) -> int:
    return int.from_bytes(b[i : i + 8], "little")


def _round64(acc: int, k: int) -> int:
    acc = (acc + k * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round64(0, v)
    return (h * _P1 + _P4) & _M


def hash_bytes(b: bytes, seed: int) -> int:
    """Full XXH64 over a byte string (Spark StringType/BinaryType path)."""
    n = len(b)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round64(v1, _fetch64(b, i))
            v2 = _round64(v2, _fetch64(b, i + 8))
            v3 = _round64(v3, _fetch64(b, i + 16))
            v4 = _round64(v4, _fetch64(b, i + 24))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k1 = (_fetch64(b, i) * _P2) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _P1) & _M
        h ^= k1
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(b[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (b[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def to_signed(u: int) -> int:
    """Unsigned 64 -> Spark's signed long."""
    u &= _M
    return u - (1 << 64) if u >= 1 << 63 else u


def spark_xxhash64(*values, seed: int = DEFAULT_SEED) -> int:
    """``F.xxhash64(v1, v2, ...)`` for int/long/str operands: each
    value's hash is the next value's seed; returns the signed long Spark
    produces. Python ints tagged by magnitude would be ambiguous, so
    ints are treated as Spark IntegerType unless wrapped in ``Long``."""
    h = seed
    for v in values:
        h &= _M
        if isinstance(v, Long):
            h = hash_long(v.value & _M, h)
        elif isinstance(v, bool):
            raise TypeError("wrap booleans explicitly")
        elif isinstance(v, int):
            h = hash_int(v & 0xFFFFFFFF, h)
        elif isinstance(v, str):
            h = hash_bytes(v.encode("utf-8"), h)
        elif isinstance(v, bytes):
            h = hash_bytes(v, h)
        else:
            raise TypeError(f"unsupported operand type {type(v).__name__}")
    return to_signed(h)


class Long:
    """Marker wrapper: hash this int via the LongType path."""

    __slots__ = ("value",)

    def __init__(self, value: int):
        self.value = value
