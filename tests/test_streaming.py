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


def test_append_redelivery_is_idempotent(spark, corpus_df, test_config):
    """At-least-once re-delivery of the same batch_id must not duplicate
    docs or postings (ADVICE round 1: batch=<id> overwrite directories)."""
    d = f"{BASE}/idem"
    shutil.rmtree(d, ignore_errors=True)
    full = corpus_df.withColumn(
        "doc_id", F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(10**12))
    )
    b0 = full.where(F.pmod(F.col("doc_id"), 2) == 0)
    b1 = full.where(F.pmod(F.col("doc_id"), 2) == 1)
    inc = IncrementalIndexer(spark, d, test_config)
    inc.append_batch(b0, text_col="content", id_col="doc_id", batch_id=0)
    inc.append_batch(b0, text_col="content", id_col="doc_id", batch_id=0)  # re-delivery
    inc.append_batch(b1, text_col="content", id_col="doc_id", batch_id=1)
    idx = inc.commit()
    assert idx.n_docs == full.count()
    assert idx.docs.groupBy("doc_id").count().where("count > 1").count() == 0


def test_delete_then_commit_equals_batch_over_survivors(spark, corpus_df, test_config):
    """append + delete + commit == batch build over the surviving docs
    (UpdateLog.java:452 / DeleteStream semantics: deletes applied at the
    merge)."""
    d_inc, d_batch = f"{BASE}/del_inc", f"{BASE}/del_batch"
    shutil.rmtree(d_inc, ignore_errors=True)
    shutil.rmtree(d_batch, ignore_errors=True)
    full = corpus_df.withColumn(
        "doc_id", F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(10**12))
    )
    inc = IncrementalIndexer(spark, d_inc, test_config)
    inc.append_batch(full.where(F.pmod(F.col("doc_id"), 2) == 0),
                     text_col="content", id_col="doc_id", batch_id=0)
    inc.append_batch(full.where(F.pmod(F.col("doc_id"), 2) == 1),
                     text_col="content", id_col="doc_id", batch_id=1)
    inc.commit()  # first commit: all buckets
    n_del = inc.delete_by_query(F.pmod(F.col("doc_id"), 7) == 3)
    assert n_del > 0
    idx = inc.commit()  # second commit: deletes applied, changed buckets only

    survivors = full.where(F.pmod(F.col("doc_id"), 7) != 3)
    batch_idx = build_index(
        spark, survivors, d_batch, test_config, text_col="content", id_col="doc_id"
    )
    assert idx.n_docs == batch_idx.n_docs
    assert idx.avgdl == pytest.approx(batch_idx.avgdl)
    for q, mode in (("server client", "OR"), ("parse json", "AND"), ("import", "OR")):
        assert _topk(idx, q, mode) == _topk(batch_idx, q, mode)
    # deleted docs are gone from the registry too
    assert idx.docs.where(F.pmod(F.col("doc_id"), 7) == 3).count() == 0


def test_changed_bucket_commit_matches_full_rebuild(spark, corpus_df, test_config):
    """A selective (changed-bucket) commit must produce blocks
    bit-identical to a full rebuild over the same segments."""
    d_sel = f"{BASE}/sel"
    shutil.rmtree(d_sel, ignore_errors=True)
    full = corpus_df.withColumn(
        "doc_id", F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(10**12))
    )
    inc = IncrementalIndexer(spark, d_sel, test_config)
    inc.append_batch(full.where(F.pmod(F.col("doc_id"), 3) < 2),
                     text_col="content", id_col="doc_id", batch_id=0)
    inc.commit()
    inc.append_batch(full.where(F.pmod(F.col("doc_id"), 3) == 2),
                     text_col="content", id_col="doc_id", batch_id=1)
    idx = inc.commit()  # selective: only buckets touched by batch 1

    from solr_spark.index.build import _stage_blocks
    sel = idx.blocks.select(
        "term", "salt", "block_no", "n_docs", "max_tf", "min_dl",
        F.sha2(F.col("doc_ids_enc"), 256).alias("h_ids"),
        F.sha2(F.col("tfs_enc"), 256).alias("h_tfs"),
    ).collect()
    _stage_blocks(spark, d_sel, test_config, only_buckets=None)  # full rebuild
    fullb = idx.refresh().blocks.select(  # fresh handle: blocks were rewritten
        "term", "salt", "block_no", "n_docs", "max_tf", "min_dl",
        F.sha2(F.col("doc_ids_enc"), 256).alias("h_ids"),
        F.sha2(F.col("tfs_enc"), 256).alias("h_tfs"),
    ).collect()
    key = lambda r: (r["term"], r["salt"], r["block_no"])
    assert sorted(map(tuple, sel), key=lambda t: t[:3]) == \
           sorted(map(tuple, fullb), key=lambda t: t[:3])


def test_windowed_stream_matches_batch(spark):
    """Append-mode watermarked windows must equal the batch window
    aggregation for every finalized window. Emission lags one
    micro-batch (a window is emitted in the first batch AFTER the
    watermark passes its end), so a final empty-ish drain flushes."""
    import datetime as dt

    from solr_spark.streaming import run_windowed_stream, windowed_agg

    base = f"{BASE}/win"
    shutil.rmtree(base, ignore_errors=True)
    watch, out, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    os.makedirs(watch)
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    schema = "ts timestamp, value double"
    aggs = {"n": F.count("*"), "total": F.round(F.sum("value"), 3)}
    rows1 = [(t0 + dt.timedelta(minutes=m), float(m)) for m in range(0, 60, 5)]
    rows2 = [(t0 + dt.timedelta(minutes=m), float(m)) for m in range(60, 130, 5)]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(watch)
    run_windowed_stream(spark, watch, schema, "ts", "10 minutes", aggs,
                        out, ckpt, watermark="5 minutes")
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(watch)
    run_windowed_stream(spark, watch, schema, "ts", "10 minutes", aggs,
                        out, ckpt, watermark="5 minutes")
    # flush batch: a much-later row advances the watermark past b1+b2
    spark.createDataFrame([(t0 + dt.timedelta(hours=3), 0.0)], schema) \
        .coalesce(1).write.mode("append").parquet(watch)
    run_windowed_stream(spark, watch, schema, "ts", "10 minutes", aggs,
                        out, ckpt, watermark="5 minutes")

    got = {
        (r["window_start"], r["n"], r["total"])
        for r in spark.read.parquet(out).collect()
    }
    batch = windowed_agg(
        spark.createDataFrame(rows1 + rows2, schema), "ts", "10 minutes", aggs
    )
    expect = {(r["window_start"], r["n"], r["total"]) for r in batch.collect()}
    assert expect  # every b1+b2 window is now finalized
    assert expect <= got


def test_windowed_stream_drops_late_rows(spark):
    """A row older than the checkpointed watermark must be dropped
    (bounded-lateness state contract), not merged into its window."""
    import datetime as dt

    from solr_spark.streaming import run_windowed_stream

    base = f"{BASE}/late"
    shutil.rmtree(base, ignore_errors=True)
    watch, out, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    os.makedirs(watch)
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    schema = "ts timestamp, value double"
    aggs = {"n": F.count("*")}
    # run 1: t=0 plus t=120 → checkpointed watermark = 115 min
    rows1 = [(t0, 1.0), (t0 + dt.timedelta(minutes=120), 1.0)]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(watch)
    run_windowed_stream(spark, watch, schema, "ts", "10 minutes", aggs,
                        out, ckpt, watermark="5 minutes")
    # run 2: a VERY late duplicate of t=0 (beyond the 5-minute bound) —
    # must be dropped before aggregation, so the t=0 window emits n=1
    rows2 = [(t0, 1.0), (t0 + dt.timedelta(minutes=130), 1.0)]
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(watch)
    run_windowed_stream(spark, watch, schema, "ts", "10 minutes", aggs,
                        out, ckpt, watermark="5 minutes")
    t0_rows = [r for r in spark.read.parquet(out).collect() if r["window_start"] == t0]
    assert len(t0_rows) == 1 and t0_rows[0]["n"] == 1


def test_doc_expiration_ttl(spark):
    from solr_spark.streaming.incremental import purge_expired, with_expiration

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-10 00:00:00"), (3, "2024-01-19 12:00:00")],
        "id long, ts_s string",
    ).select("id", F.to_timestamp("ts_s").alias("ts"))
    stamped = with_expiration(df, "ts", 72 * 3600)
    assert "expire_at" in stamped.columns
    live = purge_expired(stamped, "2024-01-20 00:00:00")
    # id=3 expires 2024-01-22 12:00 (> now, kept); ids 1,2 expired
    assert [r["id"] for r in live.collect()] == [3]
    # boundary: expire_at == now is expired (strictly-after survives)
    edge = purge_expired(stamped, "2024-01-22 12:00:00")
    assert edge.count() == 0
