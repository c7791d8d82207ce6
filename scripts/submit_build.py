"""spark-submit driver: build (or resume) the inverted index over a
source-code table and report build metrics as one JSON line.

The north-rule deployment form — runs unchanged on a multi-executor
cluster::

    python scripts/package_pyfiles.py
    spark-submit --py-files dist/solr_spark.zip \
        [--master ... --num-executors ...] \
        scripts/submit_build.py <input_table> <index_dir> [--sf-smoke]

``input_table``: parquet/Iceberg path or table of rows
``(repo, path, commit, lang, content)`` (the input hint). On an Iceberg
catalog pass ``catalog.db.table`` and the reader picks
``spark.read.table``; otherwise the path is read as parquet. The build
is stage-manifested and resumable: re-submitting after a mid-merge
failure continues from the last completed stage (kill/resume is
pytest-gated in tests/test_streaming.py).

``--sf-smoke`` additionally runs one BM25 top-10 query and prints its
latency — the two north-rule metrics in one submit.
"""

from __future__ import annotations

import json
import sys
import time


def main(argv: list[str]) -> None:
    args = [a for a in argv if not a.startswith("--")]
    if len(args) != 2:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    inp, index_dir = args
    smoke = "--sf-smoke" in argv

    from pyspark.sql import SparkSession

    # On a cluster, spark-submit supplies master/executors; builder.
    # getOrCreate() inherits that conf. Locally this falls back to
    # local[*] — same code path either way.
    spark = (
        SparkSession.builder.appName("solr_spark_build")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    from solr_spark.index.build import build_index

    src = (
        spark.read.table(inp)
        if ("/" not in inp and "." in inp)
        else spark.read.parquet(inp)
    )
    n_docs = src.count()
    # input-hint tables carry (repo, path, commit, lang, content); the
    # driver testdata documents table carries (doc_id, text, ...) — pick
    # the analyzed column + id scheme from the schema
    cols = set(src.columns)
    kw: dict = {}
    if "content" not in cols and "text" in cols:
        kw["text_col"] = "text"
    if "doc_id" in cols:
        kw["id_col"] = "doc_id"
    t0 = time.time()
    idx = build_index(spark, src, index_dir, resume=True, **kw)
    build_s = time.time() - t0

    out = {
        "n_docs": n_docs,
        "build_sec": round(build_s, 3),
        "docs_per_sec": round(n_docs / build_s, 1) if build_s > 0 else None,
        "index_dir": index_dir,
        "parallelism": spark.sparkContext.defaultParallelism,
    }
    if smoke:
        from solr_spark.query.engine import SearchEngine

        eng = SearchEngine(idx)
        t1 = time.time()
        hits = eng.topk("spark merge data", k=10).collect()
        out["q_bm25_or_sec"] = round(time.time() - t1, 3)
        out["q_bm25_or_rows"] = len(hits)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
