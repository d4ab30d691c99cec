"""Driver-side XXH64 replica of Spark's ``xxhash64`` expression.

The postings table is hash-partitioned by ``pbucket =
pmod(xxhash64(term), n_pbuckets)`` (build.py salted_tf) and the
checkpointed index is *written* partitioned by pbucket
(checkpoint.py).  Knowing a query term's pbucket on the driver lets
the engine attach a LITERAL ``pbucket IN (...)`` predicate to every
posting lookup: on a checkpoint-loaded index that is directory-level
partition pruning (1/n_pbuckets of the index files touched per term
— the property that matters at 10^12 files), and on the in-memory
cached index it skips cached batches via their min/max stats.

XXH64 is the public-domain algorithm by Yann Collet; this replica is
verified against Spark's ``F.xxhash64`` (seed 42, UTF-8 bytes) in
tests/test_hashutil.py.
"""

from __future__ import annotations

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M64, 31) * _P1) & _M64


def _merge(acc: int, val: int) -> int:
    return (((acc ^ _round(0, val)) * _P1) + _P4) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned XXH64 of ``data`` (Spark's default seed is 42)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h, 27) * _P1) + _P4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = ((_rotl(h, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_signed(s: str, seed: int = 42) -> int:
    """Spark's ``xxhash64(col)``: signed-long view of XXH64(utf-8)."""
    v = xxh64(s.encode("utf-8"), seed)
    return v - (1 << 64) if v >= (1 << 63) else v


def term_pbucket(term: str, n_pbuckets: int) -> int:
    """``pmod(xxhash64(term), n_pbuckets)`` — the partition bucket the
    build assigned this term's postings to (build.py salted_tf)."""
    return xxh64_signed(term) % n_pbuckets
