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
