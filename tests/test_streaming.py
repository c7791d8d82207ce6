"""Incremental / NRT indexing: batch-equivalence, checkpointed file
streaming, and commit replay."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from solr_spark.corpus import CORPUS_SCHEMA, synth_corpus
from solr_spark.index.build import IndexConfig, build_index
from solr_spark.query.engine import SearchEngine
from solr_spark.streaming import IncrementalIndexer, stream_directory

BASE = "/tmp/solr_spark_stream_test"


def _topk(idx, q, mode="OR"):
    return [(r["doc_id"], r["score"]) for r in SearchEngine(idx).topk(q, k=10, mode=mode).collect()]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return synth_corpus(spark, 600).persist()


def test_incremental_equals_batch(spark, corpus_df, test_config):
    """Appending in 3 batches + commit must be query-identical to one
    batch build over the full corpus (the control-vs-incremental diff,
    BaseDistributedSearchTestCase-style)."""
    batch_dir, inc_dir = f"{BASE}/batch", f"{BASE}/inc"
    shutil.rmtree(BASE, ignore_errors=True)

    # non-negative unique ids (hash-derived, partitioning-invariant)
    full = corpus_df.withColumn(
        "doc_id", F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(10**12))
    )
    batch_idx = build_index(
        spark, full, batch_dir, test_config, text_col="content", id_col="doc_id"
    )

    inc = IncrementalIndexer(spark, inc_dir, test_config)
    splits = [
        full.where(F.pmod(F.col("doc_id"), 3) == i) for i in range(3)
    ]
    total = 0
    for s in splits:
        total += inc.append_batch(s, text_col="content", id_col="doc_id")
    assert total == full.count()
    inc_idx = inc.commit()

    for q, mode in (("server client", "OR"), ("parse json", "AND"), ("import", "OR")):
        assert _topk(inc_idx, q, mode) == _topk(batch_idx, q, mode)
    # global stats identical
    assert inc_idx.n_docs == batch_idx.n_docs
    assert inc_idx.avgdl == pytest.approx(batch_idx.avgdl)


def test_soft_commit_visibility_before_merge(spark, test_config):
    """append_batch alone exposes new docs at segment level (NRT soft
    commit): term_dict rebuild sees them, blocks untouched until commit."""
    d = f"{BASE}/soft"
    shutil.rmtree(d, ignore_errors=True)
    inc = IncrementalIndexer(spark, d, test_config)
    inc.append_batch(synth_corpus(spark, 50), text_col="content")
    seg = spark.read.parquet(os.path.join(d, "segments"))
    assert seg.select("doc_id").distinct().count() == 50
    assert not os.path.isdir(os.path.join(d, "blocks"))


def test_commit_is_rerunnable(spark, test_config):
    """tlog-replay analog: re-running commit() after a 'crash' (here:
    simply again) yields the same index."""
    d = f"{BASE}/replay"
    shutil.rmtree(d, ignore_errors=True)
    inc = IncrementalIndexer(spark, d, test_config)
    inc.append_batch(synth_corpus(spark, 80), text_col="content")
    idx1 = inc.commit()
    r1 = _topk(idx1, "server")
    idx2 = inc.commit()  # replay
    assert _topk(idx2, "server") == r1


def test_stream_directory_checkpoint_no_redelivery(spark, test_config):
    """topic() analog: files dropped into the watch dir are indexed once;
    restarting the stream with the same checkpoint re-delivers nothing."""
    d = f"{BASE}/topic"
    shutil.rmtree(d, ignore_errors=True)
    watch, ckpt, idxdir = f"{d}/drop", f"{d}/ckpt", f"{d}/idx"
    os.makedirs(watch)

    synth_corpus(spark, 40).coalesce(1).write.mode("append").parquet(watch)
    inc = IncrementalIndexer(spark, idxdir, test_config)
    stream_directory(spark, watch, inc, ckpt, CORPUS_SCHEMA, text_col="content")
    n1 = spark.read.parquet(os.path.join(idxdir, "analyzed")).count()
    assert n1 == 40

    # second drain without new files → nothing indexed
    stream_directory(spark, watch, inc, ckpt, CORPUS_SCHEMA, text_col="content")
    assert spark.read.parquet(os.path.join(idxdir, "analyzed")).count() == 40

    # drop a second file → only the delta is indexed
    synth_corpus(spark, 25).coalesce(1).write.mode("append").parquet(watch)
    stream_directory(spark, watch, inc, ckpt, CORPUS_SCHEMA, text_col="content")
    # 40 originals + 65 rows in the dir now; the second write re-added 25
    # of the same docs as new rows — dedup is not the file-source's job;
    # assert exactly-once FILE delivery: 40 + 25
    assert spark.read.parquet(os.path.join(idxdir, "analyzed")).count() == 65
