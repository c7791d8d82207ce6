"""Deterministic reference query set (FIXTURES.md §2).

100 queries drawn from the corpus's own term statistics with a fixed
seed: 30 single-term (10 hot), 40 two-term AND, 20 two/three-term OR,
10 rare-term (df ≤ 3) including 2 guaranteed zero-hit queries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
HOT_TERMS = ["import", "def", "return", "public", "class", "func", "self", "value", "get", "name"]


def make_query_set(term_df: pd.DataFrame, k: int = 10) -> pd.DataFrame:
    """Build the 100-query reference set from (term, df) statistics.

    ``term_df`` must have columns ``term`` (str) and ``df`` (int).
    Returns (query_id, query, mode, k).
    """
    rng = np.random.default_rng([SEED, 7])
    stats = term_df.sort_values("term").reset_index(drop=True)
    known = stats[stats["df"] > 0]
    mid = known[(known["df"] >= 5) & (known["df"] <= max(50, int(known["df"].quantile(0.9))))]
    mid_terms = mid["term"].tolist() or known["term"].tolist()
    rare = known[known["df"] <= 3]["term"].tolist()
    hot = [t for t in HOT_TERMS if t in set(known["term"])]

    def pick(pool: list[str], n: int) -> list[str]:
        if not pool:
            return []
        idx = rng.integers(0, len(pool), size=n)
        return [pool[i] for i in idx]

    rows = []
    qid = 1
    # 30 single-term: 10 hot + 20 mid
    for t in (hot * 2)[:10]:
        rows.append((qid, t, "OR", k)); qid += 1
    for t in pick(mid_terms, 30 - min(10, len(hot) * 2)):
        rows.append((qid, t, "OR", k)); qid += 1
    # 40 two-term AND
    for _ in range(40):
        a, b = pick(mid_terms, 1)[0], pick(mid_terms + hot, 1)[0]
        rows.append((qid, f"{a} {b}", "AND", k)); qid += 1
    # 20 two/three-term OR
    for i in range(20):
        n = 2 + (i % 2)
        rows.append((qid, " ".join(pick(mid_terms + hot, n)), "OR", k)); qid += 1
    # 10 rare-term, incl. 2 zero-hit
    for t in pick(rare, 8) if rare else pick(mid_terms, 8):
        rows.append((qid, t, "OR", k)); qid += 1
    rows.append((qid, "zzzqqqxx", "OR", k)); qid += 1
    rows.append((qid, "qqqzzz nosuchtermxyz", "AND", k)); qid += 1
    return pd.DataFrame(rows, columns=["query_id", "query", "mode", "k"])
