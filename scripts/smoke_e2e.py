"""End-to-end smoke: build index over synthetic corpus, run BM25 queries,
diff against the numpy oracle. Not a pytest — a fast dev loop."""

import shutil
import sys
import time

from solr_spark.corpus import synth_corpus, synth_corpus_pandas
from solr_spark.index.build import IndexConfig, build_index
from solr_spark.oracle import BruteForceIndex
from solr_spark.query.engine import SearchEngine
from solr_spark.session import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
OUT = "/tmp/solr_spark_smoke_idx"
shutil.rmtree(OUT, ignore_errors=True)

spark = get_spark("smoke_e2e", master="local[8]")
t0 = time.time()
corpus = synth_corpus(spark, N_DOCS)
cfg = IndexConfig(hot_df_threshold=500, n_salts=4)
idx = build_index(spark, corpus, OUT, cfg)
print(f"build: {time.time()-t0:.1f}s  n_docs={idx.n_docs} avgdl={idx.avgdl:.2f}")
for stage, m in idx.manifests().items():
    print(f"  {stage}: rows={m['rows']} files={m['n_files']} wall={m['wall_sec']}s")

# oracle on same corpus (driver-side)
pdf = synth_corpus_pandas(N_DOCS)
pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
pdf["doc_id"] = range(len(pdf))
oracle = BruteForceIndex(pdf)
print(f"oracle avgdl={oracle.avgdl:.4f} vs engine {idx.avgdl:.4f}")

eng = SearchEngine(idx)
QUERIES = [
    ("import", "OR"),
    ("def", "OR"),
    ("parseJson", "OR"),
    ("getUserName config", "AND"),
    ("http server client", "OR"),
    ("zzznotaterm", "OR"),
    ("return value", "AND"),
]
n_bad = 0
for q, mode in QUERIES:
    t0 = time.time()
    got = [(r["doc_id"], round(float(r["score"]), 4)) for r in eng.topk(q, 10, mode).collect()]
    dt = time.time() - t0
    exp_df = oracle.topk(q, 10, mode)
    exp = [(int(r.doc_id), round(float(r.score), 4)) for r in exp_df.itertuples()]
    ok = [g[0] for g in got] == [e[0] for e in exp]
    scores_ok = all(abs(g[1] - e[1]) < 1e-3 for g, e in zip(got, exp))
    status = "OK " if ok and scores_ok else "FAIL"
    if status == "FAIL":
        n_bad += 1
        print(f"{status} {q!r} ({mode}) {dt:.2f}s\n  got {got}\n  exp {exp}")
    else:
        print(f"{status} {q!r} ({mode}) {dt:.2f}s hits={len(got)}")
print("ALL OK" if n_bad == 0 else f"{n_bad} FAILURES")
