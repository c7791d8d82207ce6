"""compositeId document routing (SolrCloud router parity).

Reference: ``solrj/src/java/org/apache/solr/common/cloud/
CompositeIdRouter.java:148`` routes a document by
``Hash.murmurhash3_x86_32(id)`` (seed 0, over the UTF-8 byte form —
``solrj/.../common/util/Hash.java``), mapping the signed 32-bit hash
into equal shard ranges. The composite form ``route!id`` blends the two
hashes: the route key supplies the TOP 16 bits and the doc id the
BOTTOM 16 (``bits=16`` default), so all docs sharing a route key land
in a contiguous slice of the ring — co-location you can later exploit
(Solr's ``_route_`` query param; here: partition pruning on the shard
column).

The hash is the public-domain MurmurHash3 x86_32 (Austin Appleby),
implemented VECTORIZED over numpy byte matrices — one pass per 4-byte
block column across the whole Arrow batch, no per-row Python in the
hot loop. Golden vectors pin the implementation to the published
murmur3 test values, which is what makes the routing *portable parity*
(any Solr cluster hashing the same ids gets the same shards).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_C1 = np.uint64(0xCC9E2D51)
_C2 = np.uint64(0x1B873593)
_M32 = np.uint64(0xFFFFFFFF)


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    return ((x << np.uint64(r)) | (x >> np.uint64(32 - r))) & _M32


def murmur3_x86_32_batch(strings: "pd.Series", seed: int = 0) -> np.ndarray:
    """MurmurHash3 x86_32 of each string's UTF-8 bytes, vectorized.

    Builds an (n, padded_len) byte matrix once, then processes 4-byte
    block COLUMNS with row masks — O(max_len/4) vectorized passes over
    the batch instead of a Python loop per row.
    Returns int32 (signed, matching Java's int hash).
    """
    enc = [s.encode("utf-8") if s is not None else b"" for s in strings]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=len(enc))
    n = len(enc)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    maxlen = int(lens.max()) if n else 0
    padded = ((maxlen + 3) // 4) * 4 or 4
    buf = np.zeros((n, padded), dtype=np.uint8)
    for i, b in enumerate(enc):
        if b:
            buf[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    blocks = buf.view("<u4").astype(np.uint64)  # (n, padded//4)

    h = np.full(n, seed, dtype=np.uint64)
    nblocks = lens // 4
    for i in range(padded // 4):
        mask = nblocks > i
        if not mask.any():
            break
        k = (blocks[:, i] * _C1) & _M32
        k = (_rotl32(k, 15) * _C2) & _M32
        hm = h[mask] ^ k[mask]
        h[mask] = (_rotl32(hm, 13) * np.uint64(5) + np.uint64(0xE6546B64)) & _M32

    # tail (1-3 trailing bytes) — padding is zero so reading the padded
    # columns is safe; assemble little-endian then mask by remainder
    rem = lens % 4
    if (rem > 0).any():
        start = (nblocks * 4).astype(np.int64)
        idx = np.arange(n)
        b0 = buf[idx, np.minimum(start, padded - 1)].astype(np.uint64)
        b1 = buf[idx, np.minimum(start + 1, padded - 1)].astype(np.uint64)
        b2 = buf[idx, np.minimum(start + 2, padded - 1)].astype(np.uint64)
        k1 = np.where(rem >= 3, b2 << np.uint64(16), 0).astype(np.uint64)
        k1 = k1 | np.where(rem >= 2, b1 << np.uint64(8), 0).astype(np.uint64)
        k1 = k1 | np.where(rem >= 1, b0, 0).astype(np.uint64)
        k1 = (k1 * _C1) & _M32
        k1 = (_rotl32(k1, 15) * _C2) & _M32
        h = np.where(rem > 0, h ^ k1, h)

    # finalization mix
    h ^= lens.astype(np.uint64)
    h = (h ^ (h >> np.uint64(16))) & _M32
    h = (h * np.uint64(0x85EBCA6B)) & _M32
    h = (h ^ (h >> np.uint64(13))) & _M32
    h = (h * np.uint64(0xC2B2AE35)) & _M32
    h = (h ^ (h >> np.uint64(16))) & _M32
    return h.astype(np.uint32).astype(np.int32)


_udf_cache: dict = {}


def _murmur3_udf(col: Column) -> Column:
    """Arrow-batched murmur3 column (UDF object built lazily — creating
    a pandas_udf requires an active session, and this module must stay
    importable without one for the pure-numpy golden-vector tests)."""
    if "m3" not in _udf_cache:
        from pyspark.sql.types import IntegerType

        @pandas_udf(IntegerType())
        def m3(s: pd.Series) -> pd.Series:
            return pd.Series(murmur3_x86_32_batch(s))

        _udf_cache["m3"] = m3
    return _udf_cache["m3"](col)


def composite_id_hash(id_col: Column) -> Column:
    """The CompositeIdRouter hash of an id column. Plain ids hash whole;
    ``route!id`` ids blend murmur(route) top-16 bits with murmur(id)
    bottom-16 (CompositeIdRouter.sliceHash, default bits=16)."""
    has_route = F.instr(id_col, "!") > 0
    route = F.substring_index(id_col, "!", 1)
    local = F.substring_index(id_col, "!", -1)
    blended = (
        _murmur3_udf(route).bitwiseAND(F.lit(-65536))  # 0xFFFF0000 as int32
        .bitwiseOR(_murmur3_udf(local).bitwiseAND(F.lit(0xFFFF)))
    )
    return F.when(has_route, blended).otherwise(_murmur3_udf(id_col))


def route_shard(id_col: Column, n_shards: int) -> Column:
    """Shard number for an id: the ring [Integer.MIN_VALUE,
    Integer.MAX_VALUE] split into ``n_shards`` equal ranges (Solr's
    default cluster layout), i.e. floor((hash - MIN) / range_size)."""
    span = (1 << 32) // n_shards
    unsigned = composite_id_hash(id_col).cast("long") + F.lit(2**31)
    return F.least(
        (unsigned / F.lit(span)).cast("int"), F.lit(n_shards - 1)
    ).alias("shard")
