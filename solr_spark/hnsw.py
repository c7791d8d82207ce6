"""Partition-local HNSW graphs for approximate nearest neighbor.

The reference's dense-vector retrieval is Lucene HNSW
(``schema/DenseVectorField.java:68-80`` — hnswMaxConnections /
hnswBeamWidth; ``search/vector/KnnQParserPlugin.java``). HNSW
construction is inherently sequential (every insert searches the graph
built so far), so a literal port cannot distribute. This module uses the
layout sharded vector stores actually deploy at scale:

- **build**: vectors are hash-partitioned into P shards; each shard
  builds its OWN in-memory HNSW graph inside one ``applyInPandas`` task
  (numpy distance kernels, Malkov–Yashunin insert: level draw
  ``floor(-ln(U)·mL)``, greedy descent above the node's level, beam of
  width ``ef_construction`` below, bidirectional links pruned to M /
  2M at layer 0). The graph is persisted as plain rows
  ``(pid, id, level, nbrs array<array<bigint>>)`` next to the vectors —
  a DataFrame, so it writes/reads as parquet like every other index
  artifact.
- **query**: every shard searches its local graph (one
  ``applyInPandas`` task per shard, beam width ``ef_search``) and emits
  its candidates with EXACT cosines; the global answer is a k-merge
  (``TakeOrderedAndProject``). A true top-k element only needs to be
  found inside its own shard's graph, so recall matches single-graph
  HNSW at equal ef while shards search in parallel.

Simplification vs the paper, documented: neighbor selection takes the
top-M by distance (no select-neighbors diversity heuristic). Recall is
pytest-gated against the brute-force path, the same contract as the IVF
and LSH variants (similarity.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GRAPH_SCHEMA = (
    "pid int, id long, v array<double>, level int, nbrs array<array<long>>"
)


def _normalize(X: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(X, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return X / n


class _Hnsw:
    """In-memory single-shard HNSW over cosine distance (1 - x̂·q̂)."""

    def __init__(self, M: int = 8, ef_construction: int = 64, seed: int = 42):
        self.M = M
        self.ef_c = ef_construction
        self.mL = 1.0 / np.log(M)
        self.rng = np.random.default_rng(seed)
        self.X: np.ndarray | None = None   # normalized vectors
        self.levels: list[int] = []
        self.nbrs: list[list[list[int]]] = []  # [node][layer] -> ids
        self.entry = -1

    def _dist(self, q: np.ndarray, idxs) -> np.ndarray:
        return 1.0 - self.X[list(idxs)] @ q

    def _search_layer(self, q: np.ndarray, entry: int, layer: int, ef: int) -> list[int]:
        """Beam search one layer; returns up to ef node indices by distance."""
        import heapq

        d0 = float(self._dist(q, [entry])[0])
        visited = {entry}
        cand = [(d0, entry)]            # min-heap of candidates to expand
        best = [(-d0, entry)]           # max-heap (negated) of current best
        while cand:
            dc, c = heapq.heappop(cand)
            if dc > -best[0][0] and len(best) >= ef:
                break
            neigh = [n for n in self.nbrs[c][layer] if n not in visited]
            if not neigh:
                continue
            visited.update(neigh)
            for dn, n in zip(self._dist(q, neigh), neigh):
                if len(best) < ef or dn < -best[0][0]:
                    heapq.heappush(cand, (float(dn), n))
                    heapq.heappush(best, (-float(dn), n))
                    if len(best) > ef:
                        heapq.heappop(best)
        return [n for _, n in sorted((-d, n) for d, n in best)]

    def build(self, X: np.ndarray) -> None:
        self.X = _normalize(np.asarray(X, dtype=np.float64))
        n = len(self.X)
        self.levels = (-np.log(self.rng.random(n)) * self.mL).astype(int).tolist()
        self.nbrs = [[[] for _ in range(lv + 1)] for lv in self.levels]
        self.entry = 0
        for i in range(1, n):
            q = self.X[i]
            lv, top = self.levels[i], self.levels[self.entry]
            ep = self.entry
            for layer in range(top, lv, -1):        # greedy descent
                ep = self._search_layer(q, ep, layer, ef=1)[0]
            for layer in range(min(top, lv), -1, -1):
                found = self._search_layer(q, ep, layer, ef=self.ef_c)
                m_max = self.M * 2 if layer == 0 else self.M
                sel = found[: self.M]
                self.nbrs[i][layer] = list(sel)
                for s in sel:                       # bidirectional + prune
                    lst = self.nbrs[s][layer]
                    lst.append(i)
                    if len(lst) > m_max:
                        d = self._dist(self.X[s], lst)
                        keep = np.argsort(d)[:m_max]
                        self.nbrs[s][layer] = [lst[j] for j in keep]
                ep = found[0]
            if lv > self.levels[self.entry]:
                self.entry = i

    def search(self, q: np.ndarray, k: int, ef_search: int) -> list[int]:
        qn = np.asarray(q, dtype=np.float64)
        qn = qn / (np.linalg.norm(qn) or 1.0)
        ep = self.entry
        for layer in range(self.levels[self.entry], 0, -1):
            ep = self._search_layer(qn, ep, layer, ef=1)[0]
        return self._search_layer(qn, ep, 0, ef=max(ef_search, k))[:k]


def build_hnsw(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    n_partitions: int = 4,
    M: int = 8,
    ef_construction: int = 64,
    seed: int = 42,
) -> DataFrame:
    """One graph per hash shard: ``pid = pmod(id, P)`` routes each vector
    to a shard; each shard's graph builds in one task. Returns the
    persistable graph DataFrame ``(pid, id, v, level, nbrs)`` — neighbor
    lists hold GLOBAL ids so the graph survives a parquet roundtrip.

    Shard size is the scale knob: P grows with the corpus so each graph
    stays memory-sized (FAISS/sharded-store practice); queries fan out to
    all shards in parallel, so latency tracks shard size, not corpus
    size."""

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        pid = int(pdf["pid"].iloc[0])
        X = np.asarray(pdf["v"].tolist(), dtype=np.float64)
        g = _Hnsw(M=M, ef_construction=ef_construction, seed=seed + pid)
        g.build(X)
        ids = pdf["id"].to_numpy()
        return pd.DataFrame(
            {
                "pid": pid,
                "id": ids,
                "v": pdf["v"],
                "level": g.levels,
                "nbrs": [
                    [[int(ids[n]) for n in layer] for layer in g.nbrs[i]]
                    for i in range(len(ids))
                ],
            }
        )

    base = emb.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.pmod(F.col(id_col), F.lit(n_partitions)).cast("int").alias("pid"),
    )
    return base.groupBy("pid").applyInPandas(_one, _GRAPH_SCHEMA)


def cosine_topk_hnsw(
    graph: DataFrame, query_vec: list[float], k: int = 10, ef_search: int = 64
) -> DataFrame:
    """Fan-out query: each shard beam-searches its local graph and emits
    candidates with EXACT cosine scores; the global top-k is a k-merge.
    Returns (id, cosine) ranked (cosine desc, id asc)."""
    q = [float(x) for x in query_vec]

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        X = np.asarray(pdf["v"].tolist(), dtype=np.float64)
        ids = pdf["id"].to_numpy()
        pos = {int(i): j for j, i in enumerate(ids)}
        g = _Hnsw()
        g.X = _normalize(X)
        g.levels = pdf["level"].astype(int).tolist()
        g.nbrs = [
            [[pos[int(n)] for n in layer] for layer in row]
            for row in pdf["nbrs"]
        ]
        g.entry = int(np.argmax(g.levels))
        qv = np.asarray(q, dtype=np.float64)
        hits = g.search(qv, k=k, ef_search=ef_search)
        qn = qv / (np.linalg.norm(qv) or 1.0)
        # exact (unnormalized-query) cosine for the surfaced candidates
        cos = X[hits] @ qv / (
            np.linalg.norm(X[hits], axis=1) * (np.linalg.norm(qv) or 1.0)
        )
        return pd.DataFrame({"id": ids[hits], "cosine": cos})

    cands = graph.groupBy("pid").applyInPandas(_one, "id long, cosine double")
    return cands.orderBy(F.desc("cosine"), F.asc("id")).limit(k)
