"""Similarity search over embedding columns (``array<float>``).

The analog of the reference's dense-vector retrieval
(``KnnQParserPlugin.java`` / ``VectorSimilarityQParserPlugin.java`` /
``schema/DenseVectorField.java:68-80`` — HNSW in Lucene), re-expressed for
Spark's batch execution model:

- **brute-force cosine top-k** — the exact baseline: one narrow scan,
  JVM fold for the dot product, ``TakeOrderedAndProject`` for the global
  top-k (per-partition PQ, driver merge — no full sort, no wide shuffle).
- **hyperplane-LSH bucketed top-k** — the 100 TB path: partition vectors
  by sign-signature buckets (built once, reused across queries); a query
  probes its own bucket plus hamming≤radius neighbors, scanning only
  ~(probes/2^planes) of the corpus. Recall < 1, quantified in tests
  against the brute-force path.

An IVF variant would swap the hash buckets for k-means centroids; the
probe/scan structure is identical (bucket id = argmin centroid distance),
so the LSH form is the one we keep — it needs no training pass.

Scores are double-precision sequential folds (bit-stable vs the DuckDB
oracle); ranking tie-breaks on id ascending, mirroring the engine's
(score desc, doc_id asc) contract.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solr_spark.dedup import EMB_PLANES, cosine_expr, embedding_lsh_signature


def _qvec_lit(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(
    emb: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact cosine top-k: (id, cosine), ranked (cosine desc, id asc)."""
    v = F.col(vec_col).cast("array<double>")
    return (
        emb.select(
            F.col(id_col).alias("id"),
            cosine_expr(v, _qvec_lit(query_vec)).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def build_lsh_buckets(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """One-time bucket assignment: (id, v, bucket). At scale this is
    written out partitioned by bucket so a probe prunes to ~1/2^planes of
    the files."""
    v = F.col(vec_col).cast("array<double>")
    return emb.select(
        F.col(id_col).alias("id"), v.alias("v"), embedding_lsh_signature(v).alias("bucket")
    )


def query_buckets(query_vec: list[float], probe_hamming: int = 1) -> list[int]:
    """Driver-side: the query's signature bucket plus all buckets within
    ``probe_hamming`` sign-bit flips (multiprobe)."""
    sig = 0
    for i, p in enumerate(EMB_PLANES):
        dot = sum(x * y for x, y in zip(query_vec, p))
        if dot > 0:
            sig |= 1 << i
    n = len(EMB_PLANES)
    out = {sig}
    for r in range(1, probe_hamming + 1):
        for bits in combinations(range(n), r):
            m = sig
            for b in bits:
                m ^= 1 << b
            out.add(m)
    return sorted(out)


def cosine_topk_lsh(
    buckets: DataFrame, query_vec: list[float], k: int = 10, probe_hamming: int = 1
) -> DataFrame:
    """Approximate top-k: scan only the probed buckets, rank exactly
    within them. ``buckets`` from :func:`build_lsh_buckets`."""
    probes = query_buckets(query_vec, probe_hamming)
    return (
        buckets.where(F.col("bucket").isin(probes))
        .select("id", cosine_expr(F.col("v"), _qvec_lit(query_vec)).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )
