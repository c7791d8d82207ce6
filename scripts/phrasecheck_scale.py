"""Phrase rank-identity at scale: corpus-derived phrase set against a
positional brute-force oracle on a corpus ~200x the unit-test fixture.

tests/test_phrase.py proves phrase rank identity at 1,200 docs; this
script re-proves it at N docs (default 240,000) where the positional
index spans many partitions and block boundaries. The phrase set is
derived deterministically from the corpus's own bigram/trigram
statistics (mid-df adjacent token pairs, FIXTURES-style), plus a
guaranteed zero-hit phrase.

Oracle: one tokenization pass stores each doc as an int32 code array
(shared vocab); per phrase, candidate docs come from an inverted
code->docs index and exact-adjacency pf is counted positionally; score
is the frozen phrase-BM25 form (idf_total * pf / (pf + k1*(1-b+b*dl/
avgdl)), float32) with (-score, doc_id) ordering -- the same semantics
as solr_spark/query/phrase.py:386 (phrase_topk).

Writes PHRASECHECK_r05.json at the repo root.

Usage: python scripts/phrasecheck_scale.py [n_docs]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time
from collections import Counter

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000

    from solr_spark.analysis import CODE_CHAIN
    from solr_spark.corpus import synth_corpus, synth_corpus_pandas
    from solr_spark.index.build import IndexConfig, build_index
    from solr_spark.query.engine import SearchEngine
    from solr_spark.query.phrase import phrase_topk
    from solr_spark.session import get_spark

    walls: dict[str, float] = {}
    spark = get_spark("phrasecheck_scale")
    out = f"/tmp/solr_spark_phrasecheck_{n_docs}"
    shutil.rmtree(out, ignore_errors=True)

    t0 = time.time()
    cfg = IndexConfig(hot_df_threshold=max(1000, n_docs // 4), n_salts=8)
    index = build_index(spark, synth_corpus(spark, n_docs), out, cfg, resume=False)
    walls["index_build"] = round(time.time() - t0, 1)
    engine = SearchEngine(index)

    # one tokenization pass: per-doc int32 code arrays over a shared vocab
    t0 = time.time()
    pdf = synth_corpus_pandas(n_docs)
    pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    pdf["doc_id"] = range(len(pdf))
    walls["oracle_datagen"] = round(time.time() - t0, 1)

    t0 = time.time()
    vocab: dict[str, int] = {}
    docs_codes: list[np.ndarray] = []
    inv: dict[int, list[int]] = {}
    bigram_df: Counter = Counter()
    trigram_df: Counter = Counter()
    for row, text in enumerate(pdf["content"]):
        toks = CODE_CHAIN.tokenize_py(text)
        codes = np.fromiter(
            (vocab.setdefault(t, len(vocab)) for t in toks),
            dtype=np.int32, count=len(toks),
        )
        docs_codes.append(codes)
        for c in set(codes.tolist()):
            inv.setdefault(c, []).append(row)
        if len(codes) >= 2:
            grams2 = set(zip(codes.tolist(), codes[1:].tolist()))
            bigram_df.update(grams2)
        if len(codes) >= 3:
            grams3 = set(zip(codes.tolist(), codes[1:].tolist(), codes[2:].tolist()))
            trigram_df.update(grams3)
    rev = {c: t for t, c in vocab.items()}
    doc_len = np.array([len(c) for c in docs_codes], dtype=np.int64)
    avgdl = float(doc_len.mean())
    n = len(docs_codes)
    walls["oracle_tokenize"] = round(time.time() - t0, 1)

    # deterministic phrase set: 8 mid-df bigrams + 2 mid-df trigrams.
    # Ordering by md5 of the phrase text spreads picks across the band
    # (plain lexicographic order degenerates to one shared leading
    # token); distinct leading terms are enforced for diversity. No RNG
    # -> reproducible across runs and machines.
    import hashlib

    def band(counter: Counter, lo: int, hi: int, take: int) -> list[tuple[int, ...]]:
        in_band = [g for g, df in counter.items() if lo <= df <= hi]
        ranked = sorted(
            in_band,
            key=lambda g: hashlib.md5(" ".join(rev[c] for c in g).encode()).hexdigest(),
        )
        out, seen_lead = [], set()
        for g in ranked:
            if g[0] in seen_lead:
                continue
            seen_lead.add(g[0])
            out.append(g)
            if len(out) == take:
                break
        return out

    lo, hi = max(5, n // 2000), max(50, n // 40)
    phrases = [" ".join(rev[c] for c in g) for g in band(bigram_df, lo, hi, 8)]
    phrases += [" ".join(rev[c] for c in g) for g in band(trigram_df, lo, hi, 2)]
    assert len(phrases) == 10, phrases

    def oracle_topk(phrase: str, k: int = 10) -> list[tuple[int, float]]:
        terms = CODE_CHAIN.tokenize_py(phrase)
        if any(t not in vocab for t in terms):
            return []
        codes = [vocab[t] for t in terms]
        dfs = {c: len(inv[c]) for c in set(codes)}
        idf_total = sum(
            math.log1p((n - dfs[c] + 0.5) / (dfs[c] + 0.5)) for c in codes
        )
        cand = set(inv[codes[0]])
        for c in codes[1:]:
            cand &= set(inv[c])
        out = []
        for d in cand:
            arr = docs_codes[d]
            starts = np.where(arr[: len(arr) - len(codes) + 1] == codes[0])[0]
            for i, c in enumerate(codes[1:], start=1):
                starts = starts[arr[starts + i] == c]
                if not len(starts):
                    break
            pf = len(starts)
            if pf:
                s = idf_total * pf / (
                    pf + engine.k1 * (1 - engine.b + engine.b * doc_len[d] / avgdl)
                )
                out.append((d, float(np.float32(s))))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    mism: list[dict] = []
    t0 = time.time()
    for ph in phrases:
        got = [(r["doc_id"], r["score"]) for r in phrase_topk(engine, ph, k=10).collect()]
        exp = oracle_topk(ph, k=10)
        if [d for d, _ in got] != [d for d, _ in exp] or any(
            abs(a - b) > 1e-5 * max(1.0, abs(b))
            for (_, a), (_, b) in zip(got, exp)
        ):
            mism.append({"phrase": ph, "got": got, "exp": exp})
    zero = phrase_topk(engine, "zzznope import", k=10).count()
    walls["phrase_queries"] = round(time.time() - t0, 1)

    rec = {
        "n_docs": n_docs,
        "phrases": phrases,
        "mismatches": mism,
        "zero_hit_count": int(zero),
        "walls": walls,
        "vocab_size": len(vocab),
    }
    with open(os.path.join(REPO, "PHRASECHECK_r05.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: rec[k] for k in ("n_docs", "phrases", "walls")}))
    print("mismatches:", len(mism), "zero_hit_count:", zero)
    shutil.rmtree(out, ignore_errors=True)
    sys.exit(1 if (mism or zero != 0) else 0)


if __name__ == "__main__":
    main()
