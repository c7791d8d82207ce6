"""Brute-force single-process BM25 oracle (the control run).

The testing pattern mirrors the reference's control-vs-distributed diffing
(``test-framework/.../BaseDistributedSearchTestCase.java``): the same
corpus is scored by this transparent numpy implementation of the frozen
semantics (FIXTURES.md §3) and by the distributed engine; top-k must be
rank-identical.

Frozen semantics (identical to the engine):
- analysis: the CODE_CHAIN tokenizer;
- doc_len = surviving token count (discountOverlaps=true analog);
- idf = ln(1 + (N - df + 0.5)/(df + 0.5)), avgdl = mean doc_len (f64);
- contribution = w_t · idf · tf/(tf + k1·(1 − b + b·dl/avgdl)) in f64,
  w_t = query-term multiplicity;
- final score quantized to float32 for ranking, tie-break
  (score desc, doc_id asc) — ShardFieldSortedHitQueue.java:104-107 analog.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from solr_spark.analysis import CODE_CHAIN, AnalyzerChain


class BruteForceIndex:
    """In-memory postings over a pandas corpus — the rank oracle."""

    def __init__(self, docs: pd.DataFrame, text_col: str = "content",
                 id_col: str = "doc_id", chain: AnalyzerChain = CODE_CHAIN,
                 k1: float = 1.2, b: float = 0.75):
        self.k1, self.b = k1, b
        self.doc_ids = docs[id_col].to_numpy(dtype=np.int64)
        token_lists = [chain.tokenize_py(t) for t in docs[text_col]]
        self.doc_len = np.array([len(t) for t in token_lists], dtype=np.int64)
        self.n_docs = len(docs)
        self.avgdl = float(self.doc_len.mean()) if self.n_docs else 1.0
        self.chain = chain
        # postings: term -> (row indexes array, tf array)
        post: dict[str, dict[int, int]] = {}
        for row, toks in enumerate(token_lists):
            for t, tf in Counter(toks).items():
                post.setdefault(t, {})[row] = tf
        self.postings = {
            t: (np.fromiter(d.keys(), dtype=np.int64), np.fromiter(d.values(), dtype=np.int64))
            for t, d in post.items()
        }

    def idf(self, term: str) -> float:
        df = len(self.postings[term][0]) if term in self.postings else 0
        return math.log1p((self.n_docs - df + 0.5) / (df + 0.5))

    def topk(self, query_text: str, k: int = 10, mode: str = "OR") -> pd.DataFrame:
        terms = self.chain.tokenize_py(query_text)
        mult = Counter(terms)
        uniq = [t for t in sorted(mult) if t in self.postings]
        scores = np.zeros(self.n_docs, dtype=np.float64)
        match_count = np.zeros(self.n_docs, dtype=np.int64)
        for t in uniq:
            rows, tfs = self.postings[t]
            dl = self.doc_len[rows].astype(np.float64)
            tf = tfs.astype(np.float64)
            contrib = (
                mult[t]
                * self.idf(t)
                * tf
                / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))
            )
            scores[rows] += contrib
            match_count[rows] += 1
        if mode == "AND":
            required = len(set(mult))
            mask = match_count == required if required else np.zeros(self.n_docs, bool)
        else:
            mask = match_count > 0
        idx = np.flatnonzero(mask)
        if len(idx) == 0:
            return pd.DataFrame({"doc_id": np.array([], dtype=np.int64),
                                 "score": np.array([], dtype=np.float32)})
        s32 = scores[idx].astype(np.float32)
        order = np.lexsort((self.doc_ids[idx], -s32))[:k]
        sel = idx[order]
        return pd.DataFrame({"doc_id": self.doc_ids[sel], "score": scores[sel].astype(np.float32)})
