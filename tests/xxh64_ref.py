"""Pure-Python reference implementation of XXH64 — the PUBLIC hash
algorithm (Yann Collet's xxHash, BSD-2; spec at
github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) that Spark's
``xxhash64`` SQL function implements JVM-side
(org.apache.spark.sql.catalyst.expressions.XXH64, seed 42, with the
int/long primitive fast paths).

This is TEST infrastructure: an independent third implementation so the
engine's xxhash64-based operators (MinHash signatures, window-hash
chains, decontamination grams) can carry frozen-literal truth pins that
neither Spark nor DuckDB computed.  Constants verified against the
disassembled Spark bytecode AND the published spec; equality with
Spark's function is pinned across primitive widths, string lengths
(both sides of the 32-byte stripe boundary) and seed chaining in
``tests/test_functions.py::test_spark_xxhash64_matches_reference``.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SEED = 42  # Spark's xxhash64 default seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, k: int) -> int:
    return (_rotl((acc + k * _P2) & _M, 31) * _P1) & _M


def hash_long(v: int, seed: int = SEED) -> int:
    """Spark's XXH64.hashLong: the 8-byte primitive fast path."""
    h = (seed + _P5 + 8) & _M
    h ^= _round(0, v & _M)
    return _fmix(((_rotl(h, 27) * _P1) + _P4) & _M)


def hash_int(v: int, seed: int = SEED) -> int:
    """Spark's XXH64.hashInt: the 4-byte primitive fast path (what an
    IntegerType literal — e.g. the per-seed index in a MinHash
    aggregate — hashes through)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((v & 0xFFFFFFFF) * _P1) & _M
    return _fmix(((_rotl(h, 23) * _P2) + _P3) & _M)


def hash_bytes(data: bytes, seed: int = SEED) -> int:
    """Full XXH64 over a byte buffer (what a string column hashes
    through, UTF-8)."""
    n, i = len(data), 0
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
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = (((h ^ _round(0, v)) * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h = (
            (_rotl(h ^ _round(0, int.from_bytes(data[i : i + 8], "little")), 27) * _P1)
            + _P4
        ) & _M
        i += 8
    if i + 4 <= n:
        h = (
            (_rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _M), 23)
             * _P2)
            + _P3
        ) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    return _fmix(h)


def signed(x: int) -> int:
    """Two's-complement view, matching Spark's BIGINT output."""
    return x - (1 << 64) if x >= (1 << 63) else x


def minhash_signature(text: str, num_hashes: int = 4, k: int = 3) -> list | None:
    """Reference replay of ``dedup.minhash_signatures_df``'s xxhash64
    path: whitespace tokens of the lowercased text → per-token
    hash_bytes → chained window hashes (each zip step is
    ``xxhash64(prev, next) = hash_long(next, hash_long(prev, 42))``) →
    per-seed min of ``xxhash64(lit(seed_i), window)`` with the seed
    index hashing through the INT fast path.  Signed-min matches
    Spark's BIGINT MIN.  Returns None for texts with fewer than ``k``
    words (no signature row)."""
    toks = text.lower().split()
    if len(toks) < k:
        return None
    th = [hash_bytes(t.encode()) for t in toks]
    wins = []
    for i in range(len(toks) - k + 1):
        h = th[i]
        for j in range(1, k):
            h = hash_long(th[i + j], hash_long(h, SEED))
        wins.append(h)
    return [
        min(signed(hash_long(w, hash_int(i, SEED))) for w in wins)
        for i in range(num_hashes)
    ]
