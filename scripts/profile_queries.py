"""Per-query profiler: wall seconds + Spark job count for the bench
queries (the diagnostic VERDICT r2 asked for — the shared-query
regression was suspected to be driver-job-overhead-bound).

Usage: python scripts/profile_queries.py [n_docs]
Prints one line per query: name, wall sec, #jobs launched.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solr_spark.corpus import synth_corpus
from solr_spark.index.build import IndexConfig, build_index
from solr_spark.query.engine import SearchEngine
from solr_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    spark = get_spark("profile", master="local[32]", shuffle_partitions=64)
    sc = spark.sparkContext
    out = f"/tmp/solr_spark_profile_{n}"
    cfg = IndexConfig(hot_df_threshold=max(1000, n // 4), n_salts=8)
    if not os.path.exists(out):
        corpus = synth_corpus(spark, n).persist()
        corpus.count()
        build_index(spark, corpus, out, cfg, resume=False)
        corpus.unpersist()
    from solr_spark.index.build import InvertedIndex

    idx = InvertedIndex(spark, out)

    def run(name, fn, fresh_engine=True):
        eng = SearchEngine(idx)
        fn(eng)  # warmup on a fresh engine? no — time the FRESH path
        eng2 = SearchEngine(idx)
        grp = f"prof_{name}"
        sc.setJobGroup(grp, name)
        t0 = time.time()
        fn(eng2)
        dt = time.time() - t0
        sc.setJobGroup("idle", "idle")
        jobs = sc.statusTracker().getJobIdsForGroup(grp)
        print(f"{name:18s} {dt:7.3f}s  jobs={len(jobs)}")

    from solr_spark.plans import execute_query
    from solr_spark.query.phrase import phrase_topk

    run("q_bm25_hot", lambda e: e.topk("import", k=10).collect())
    run("q_bm25_and", lambda e: e.topk("server client", k=10, mode="AND").collect())
    run("q_bm25_or", lambda e: e.topk("parse json http", k=10).collect())
    run("q_bm25_camel", lambda e: e.topk("getUserName", k=10).collect())
    run("q_phrase", lambda e: phrase_topk(e, "import os", k=10).collect())
    run("q_lucene_nested", lambda e: execute_query(e, "(server OR client) AND parse -xml", k=10).collect())


if __name__ == "__main__":
    main()
