"""Pure-Python reimplementation of Spark's ``xxhash64`` expression.

The hash-dependent operators (SimHash, MinHash/LSH banding, random-
hyperplane LSH) use Spark's built-in ``F.xxhash64`` in the JVM hot path —
it is the fastest 64-bit hash available to whole-stage codegen.  Their
*oracles* are sequential Python programs, so correctness checking needs a
bit-exact reimplementation of the same hash.  The algorithm is public:
xxHash (XXH64) as specialized by Spark's
``org.apache.spark.sql.catalyst.expressions.XXH64`` — seed 42, per-column
chaining (each column's hash seeds the next), integers hashed as 4-byte
words, longs as 8-byte words, strings as their UTF-8 bytes, NULLs skipped.

Verified bit-exact against Spark in tests/test_spark_hash.py over random
ints/longs/strings and multi-column chains.
"""

from __future__ import annotations

_M = (1 << 64) - 1  # 64-bit mask

PRIME64_1 = 0x9E3779B185EBCA87
PRIME64_2 = 0xC2B2AE3D27D4EB4F
PRIME64_3 = 0x165667B19E3779F9
PRIME64_4 = 0x85EBCA77C2B2AE63
PRIME64_5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * PRIME64_2) & _M
    h ^= h >> 29
    h = (h * PRIME64_3) & _M
    h ^= h >> 32
    return h


def hash_int(value: int, seed: int) -> int:
    """XXH64.hashInt: a 32-bit word (Spark's Byte/Short/Int/Boolean/Float
    path hashes the 4-byte representation)."""
    seed &= _M
    h = (seed + PRIME64_5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * PRIME64_1) & _M
    h = (_rotl(h, 23) * PRIME64_2 + PRIME64_3) & _M
    return _fmix(h)


def hash_long(value: int, seed: int) -> int:
    """XXH64.hashLong: an 8-byte word (Long/Double/Timestamp path)."""
    seed &= _M
    value &= _M
    h = (seed + PRIME64_5 + 8) & _M
    h ^= (_rotl((value * PRIME64_2) & _M, 31) * PRIME64_1) & _M
    h = (_rotl(h, 27) * PRIME64_1 + PRIME64_4) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """XXH64 over a byte string (Spark's String/Binary path; words read
    little-endian)."""
    seed &= _M
    length = len(data)
    i = 0
    if length >= 32:
        v1 = (seed + PRIME64_1 + PRIME64_2) & _M
        v2 = (seed + PRIME64_2) & _M
        v3 = seed
        v4 = (seed - PRIME64_1) & _M
        while i <= length - 32:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little")
                         * PRIME64_2) & _M, 31) * PRIME64_1) & _M
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little")
                         * PRIME64_2) & _M, 31) * PRIME64_1) & _M
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little")
                         * PRIME64_2) & _M, 31) * PRIME64_1) & _M
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little")
                         * PRIME64_2) & _M, 31) * PRIME64_1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * PRIME64_2) & _M, 31) * PRIME64_1) & _M
            h = (h * PRIME64_1 + PRIME64_4) & _M
    else:
        h = (seed + PRIME64_5) & _M
    h = (h + length) & _M
    while i <= length - 8:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((k * PRIME64_2) & _M, 31) * PRIME64_1) & _M
        h = (_rotl(h, 27) * PRIME64_1 + PRIME64_4) & _M
        i += 8
    if i <= length - 4:
        k = int.from_bytes(data[i:i + 4], "little")
        h ^= (k * PRIME64_1) & _M
        h = (_rotl(h, 23) * PRIME64_2 + PRIME64_3) & _M
        i += 4
    while i < length:
        h ^= (data[i] * PRIME64_5) & _M
        h = (_rotl(h, 11) * PRIME64_1) & _M
        i += 1
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64(*values) -> int:
    """Spark's ``F.xxhash64(*cols)`` for scalar Python values.

    Type mapping mirrors Spark's expression: Python ``bool`` → 4-byte,
    ``int`` → 4-byte when it would be an IntegerType literal is NOT
    assumed — pass ``("int", v)`` / ``("long", v)`` tuples to force width;
    a bare int is hashed as LONG (Spark's default for int64 columns),
    ``str`` as UTF-8 bytes, ``bytes`` as-is, ``None`` skipped.
    Returns the SIGNED 64-bit value Spark produces.
    """
    h = SPARK_SEED
    for v in values:
        if v is None:
            continue
        if isinstance(v, tuple):
            kind, val = v
            if kind == "int":
                h = hash_int(val, h)
            elif kind == "long":
                h = hash_long(val, h)
            else:
                raise ValueError(f"unknown width {kind}")
        elif isinstance(v, bool):
            h = hash_int(int(v), h)
        elif isinstance(v, int):
            h = hash_long(v, h)
        elif isinstance(v, str):
            h = hash_bytes(v.encode("utf-8"), h)
        elif isinstance(v, (bytes, bytearray)):
            h = hash_bytes(bytes(v), h)
        else:
            raise TypeError(f"unhashable oracle type {type(v)}")
    return _signed(h)


def java_mod(a: int, b: int) -> int:
    """Java's ``%`` (sign follows the dividend) — Spark's ``%`` operator,
    which differs from Python's for negative dividends."""
    r = abs(a) % abs(b)
    return -r if a < 0 else r
