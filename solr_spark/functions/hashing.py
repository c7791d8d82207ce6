"""Deterministic cross-engine hash kernels (Spark column + DuckDB SQL).

The dedup family (exact / MinHash-LSH / SimHash, SURVEY.md §2.2 "Dedup /
signature", reference ``update/processor/SignatureUpdateProcessorFactory
.java`` + ``MD5Signature.java``) needs hash values that are *bit-identical*
between the Spark engine and the DuckDB oracle. ``xxhash64`` seeds differ
across engines, so the shared primitive is:

    md5_long(s) = int64 of the first 15 hex chars of md5(s)   (60 bits)

and the MinHash permutation family is a classic universal hash

    h_i(x) = (A[i] * (x mod 2^31) + C[i]) mod (2^61 - 1)

with frozen constants drawn once from a seeded PRNG. All arithmetic stays
within int64 (A[i] < 2^31, x mod 2^31 < 2^31 → product < 2^62), so BIGINT
math agrees everywhere.

At 100 TB these run as JVM expressions inside whole-stage codegen — no
Python in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

#: modulus: Mersenne prime 2^61 - 1
MINHASH_MOD = (1 << 61) - 1
#: reduce the 60-bit base hash below 2^31 so A*x stays inside int64
_X_MOD = 1 << 31

_rng = np.random.default_rng([42, 1009])
#: frozen permutation constants (64 hash functions)
MINHASH_A: list[int] = [int(a) | 1 for a in _rng.integers(1, _X_MOD, size=64)]
MINHASH_C: list[int] = [int(c) for c in _rng.integers(0, MINHASH_MOD, size=64)]


# ---------------------------------------------------------------------------
# base hash
# ---------------------------------------------------------------------------


def md5_long(col: Column | str) -> Column:
    """int64 from the first 15 hex chars of md5 — Spark form."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """Same value in DuckDB SQL."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# minhash permutations
# ---------------------------------------------------------------------------


def minhash_perm(hash_col: Column, i: int) -> Column:
    """i-th permuted hash of an md5_long value — Spark form."""
    x = F.pmod(hash_col, F.lit(_X_MOD))
    return F.pmod(F.lit(MINHASH_A[i]) * x + F.lit(MINHASH_C[i]), F.lit(MINHASH_MOD))


def minhash_perm_sql(hash_expr: str, i: int) -> str:
    """i-th permuted hash — DuckDB form (identical BIGINT arithmetic)."""
    return f"(({MINHASH_A[i]} * (({hash_expr}) % {_X_MOD}) + {MINHASH_C[i]}) % {MINHASH_MOD})"


# ---------------------------------------------------------------------------
# XXH64 — driver-side mirror of Spark's ``xxhash64`` expression
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64_py(data: bytes | str, seed: int = 42) -> int:
    """Standard XXH64 of ``data`` as a SIGNED int64 — bit-identical to
    Spark's ``F.xxhash64(string_col)`` (default seed 42), verified by
    tests/test_index_build.py. Lets the engine map term → term_bucket
    (``pmod(xxhash64(term), B)``) on the driver without launching a
    Spark job per fresh query term."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = (_rotl((v1 + int.from_bytes(data[i : i + 8], "little") * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = (((h ^ ((_rotl((v * _P2) & _M64, 31) * _P1) & _M64)) * _P1) + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        k = int.from_bytes(data[i : i + 8], "little")
        h = (_rotl(h ^ ((_rotl((k * _P2) & _M64, 31) * _P1) & _M64), 27) * _P1 + _P4) & _M64
        i += 8
    if i <= n - 4:
        h = (_rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _M64), 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h
