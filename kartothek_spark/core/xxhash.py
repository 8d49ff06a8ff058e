"""Driver-side rendering of Spark's ``xxhash64`` expression.

Bucket pruning (``dataset/read.py:_prune_buckets``) must know which hash
bucket a pinned literal lands in. The bucket id was computed by the WRITER
as ``pmod(xxhash64(cols...), num_buckets)`` — a JVM expression — so the
planner needs the same number. Launching a one-row Spark job per
conjunction to get it adds measurable planning latency to point lookups;
instead this module re-implements the (frozen) XXH64 algorithm plus
Spark's per-type value mapping (``XxHash64Function`` /
``catalyst/expressions/XXH64.java``) in pure Python. Parity is pinned by
``tests/test_plans.py`` comparing against ``F.xxhash64`` across types.

Supported input types: null, boolean, byte/short/int/long, float/double,
date, timestamp (incl. NTZ), string. Anything else raises
``UnsupportedXxhashType`` — callers fall back to the Spark-job path.
"""

from __future__ import annotations

import datetime
from typing import Any

from pyspark.sql import types as T

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_XXHASH64_SEED = 42


class UnsupportedXxhashType(TypeError):
    pass


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def _hash_int(i: int, seed: int) -> int:
    """XXH64.hashInt — the 4-byte specialization Spark uses for
    int-width values."""
    h = (seed + _P5 + 4) & _MASK
    h ^= ((i & 0xFFFFFFFF) * _P1) & _MASK
    h = (_rotl(h, 23) * _P2 + _P3) & _MASK
    return _fmix(h)


def _hash_long(l: int, seed: int) -> int:
    """XXH64.hashLong — the 8-byte specialization."""
    k1 = (_rotl((l & _MASK) * _P2 & _MASK, 31) * _P1) & _MASK
    h = ((seed + _P5 + 8) & _MASK) ^ k1
    h = (_rotl(h, 27) * _P1 + _P4) & _MASK
    return _fmix(h)


def _word(b: bytes, o: int) -> int:
    return int.from_bytes(b[o : o + 8], "little")


def _hash_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over a byte buffer (Spark's hashUnsafeBytes)."""
    length = len(data)
    o, end = 0, length
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while o <= end - 32:
            v1 = (_rotl((v1 + _word(data, o) * _P2) & _MASK, 31) * _P1) & _MASK
            v2 = (_rotl((v2 + _word(data, o + 8) * _P2) & _MASK, 31) * _P1) & _MASK
            v3 = (_rotl((v3 + _word(data, o + 16) * _P2) & _MASK, 31) * _P1) & _MASK
            v4 = (_rotl((v4 + _word(data, o + 24) * _P2) & _MASK, 31) * _P1) & _MASK
            o += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h = ((h ^ (_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK) * _P1 + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + length) & _MASK
    while o <= end - 8:
        k1 = (_rotl((_word(data, o) * _P2) & _MASK, 31) * _P1) & _MASK
        h = (_rotl(h ^ k1, 27) * _P1 + _P4) & _MASK
        o += 8
    if o <= end - 4:
        h ^= (int.from_bytes(data[o : o + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        o += 4
    while o < end:
        h ^= (data[o] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        o += 1
    return _fmix(h)


_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_TS = datetime.datetime(1970, 1, 1)


def _float_bits(f: float) -> int:
    import struct

    # Spark normalizes -0.0f to 0.0f before hashing (SPARK-32110), so the
    # two IEEE zeros hash identically; NaNs are canonicalized by
    # floatToLongBits on the JVM side, mirrored here
    if f == 0.0:
        f = 0.0
    import math

    if math.isnan(f):
        return 0x7FC00000
    return struct.unpack("<i", struct.pack("<f", f))[0]


def _double_bits(d: float) -> int:
    import struct

    if d == 0.0:  # -0.0 == 0.0 → normalize (SPARK-32110)
        d = 0.0
    import math

    if math.isnan(d):
        return 0x7FF8000000000000
    return struct.unpack("<q", struct.pack("<d", d))[0]


def _fold_value(value: Any, dt: T.DataType, seed: int) -> int:
    """One column's contribution, mirroring XxHash64Function.hash: the
    running hash is the next column's seed; nulls leave it unchanged."""
    if value is None:
        return seed
    if isinstance(dt, T.BooleanType):
        return _hash_int(1 if value else 0, seed)
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        return _hash_int(int(value), seed)
    if isinstance(dt, T.LongType):
        return _hash_long(int(value), seed)
    if isinstance(dt, T.FloatType):
        return _hash_int(_float_bits(float(value)), seed)
    if isinstance(dt, T.DoubleType):
        return _hash_long(_double_bits(float(value)), seed)
    if isinstance(dt, T.DateType):
        d = value if isinstance(value, datetime.date) else datetime.date.fromisoformat(value)
        return _hash_int((d - _EPOCH_DATE).days, seed)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        ts = value
        if isinstance(ts, str):
            ts = datetime.datetime.fromisoformat(ts.replace(" ", "T"))
        if ts.tzinfo is not None:
            ts = ts.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        micros = round((ts - _EPOCH_TS).total_seconds() * 1_000_000)
        return _hash_long(micros, seed)
    if isinstance(dt, T.StringType):
        return _hash_bytes(str(value).encode("utf-8"), seed)
    raise UnsupportedXxhashType(f"xxhash64 over {dt} not supported driver-side")


def spark_xxhash64(values: list[Any], dtypes: list[T.DataType], seed: int = SPARK_XXHASH64_SEED) -> int:
    """``F.xxhash64(c1, c2, ...)`` as a signed 64-bit int, computed on the
    driver. Columns fold left with the running hash as seed."""
    h = seed & _MASK
    for value, dt in zip(values, dtypes):
        h = _fold_value(value, dt, h)
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_pmod_xxhash64(values: list[Any], dtypes: list[T.DataType], m: int) -> int:
    """``pmod(xxhash64(...), m)`` — non-negative bucket id."""
    return spark_xxhash64(values, dtypes) % m
