"""Incremental / NRT index maintenance — the streaming surface.

The reference's incremental semantics (SURVEY.md §2.9) restated for
Spark's batch+streaming model:

- ``topic()`` (``TopicStream.java:66``, at-least-once checkpointed
  consumption of new docs) → :func:`stream_directory`: a Structured
  Streaming file source over a drop-directory, checkpointed by Spark's
  own file-source log, feeding ``foreachBatch`` into the indexer.
- NRT soft commit (``DirectUpdateHandler2.java:157-175``: visibility
  without a full merge) → :meth:`IncrementalIndexer.append_batch`
  appends analyzed docs + raw postings to the ``segments`` table only —
  new docs are immediately visible to segment-level readers (term_dict
  scans, significant-terms) without touching the merged blocks.
- hard commit (flush + merge) → :meth:`IncrementalIndexer.commit`
  re-runs the term_dict + blocks stages over ALL segments. Because every
  stage is deterministic in its input rows, an incremental build that
  appends batches B1..Bn and commits is **query-identical** to a batch
  build over the concatenated corpus (tested; the oracle gate proves it
  against DuckDB over the full table).
- tlog replay / recovery (``UpdateLog.java:178``) → the stage manifests:
  a killed commit leaves the previous term_dict/blocks manifests intact,
  and re-running ``commit()`` redoes only the merge stages.

Scale notes: append is map-only + one (term,doc) shuffle for the batch's
postings; commit is the same two shuffles as the batch build's merge
stages, over all segments — the TieredMergePolicy analog would compact
only changed term partitions, which Parquet directory partitioning by
``term_bucket`` enables (rewrite only buckets whose terms changed);
v1 recomputes all buckets per commit.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solr_spark.index.build import (
    IndexConfig,
    InvertedIndex,
    _manifest_path,
    _stage_dir,
    _stage_term_dict,
    _stage_blocks,
    _write_manifest,
    assign_doc_ids,
    build_postings,
)


class IncrementalIndexer:
    """Append-only micro-batch indexing with explicit commits."""

    def __init__(self, spark: SparkSession, out_dir: str, config: IndexConfig | None = None):
        self.spark = spark
        self.dir = out_dir
        self.config = config or IndexConfig()
        os.makedirs(out_dir, exist_ok=True)
        self._n_docs = self._read_doc_count()

    def _read_doc_count(self) -> int:
        adir = _stage_dir(self.dir, "analyzed")
        if not os.path.isdir(adir) or not any(
            n.endswith(".parquet") for n in os.listdir(adir)
        ):
            return 0
        return self.spark.read.parquet(adir).count()

    # ------------------------------------------------------------------
    def append_batch(
        self,
        docs: DataFrame,
        text_col: str = "content",
        id_col: str | None = None,
        sort_cols: list[str] | None = None,
    ) -> int:
        """Soft-commit analog: analyze + append postings for one batch.

        New doc_ids continue from the current count when ``id_col`` is
        not supplied (monotonic batch ids — the ``_version_`` analog).
        Returns the number of docs appended.
        """
        chain = self.config.chain()
        if id_col is not None:
            with_ids = docs.withColumn("doc_id", F.col(id_col).cast("long"))
            if id_col != "doc_id":
                with_ids = with_ids.drop(id_col)
        else:
            with_ids = assign_doc_ids(docs, sort_cols or ["repo", "path", "commit"])
            with_ids = with_ids.withColumn("doc_id", F.col("doc_id") + F.lit(self._n_docs))
        meta_cols = [c for c in with_ids.columns if c not in (text_col, "doc_id")]
        analyzed = (
            with_ids.withColumn("content_sha256", F.sha2(F.col(text_col), 256))
            .withColumn("tokens", chain.tokens(text_col))
            .withColumn("doc_len", F.size("tokens").cast("int"))
            .select("doc_id", *meta_cols, "content_sha256", "doc_len", "tokens")
        )
        analyzed = analyzed.persist()  # one materialization feeds both writes
        n = analyzed.count()
        # tokens stay in memory only (nothing reads them from disk)
        analyzed.drop("tokens").write.mode("append").parquet(_stage_dir(self.dir, "analyzed"))

        build_postings(analyzed, self.config).write.mode("append").parquet(
            _stage_dir(self.dir, "segments")
        )
        analyzed.unpersist()
        self._n_docs += int(n)
        return int(n)

    # ------------------------------------------------------------------
    def commit(self) -> InvertedIndex:
        """Hard commit: merge all segments into fresh term_dict + blocks
        (stage manifests recorded, so a killed commit is re-runnable)."""
        for stage, fn in (
            ("term_dict", lambda: _stage_term_dict(self.spark, self.dir, self.config)),
            ("blocks", lambda: _stage_blocks(self.spark, self.dir, self.config)),
        ):
            t0 = time.time()
            fn()
            _write_manifest(self.dir, stage, self.config, t0)
        # analyzed/segments manifests so InvertedIndex resume logic sees a
        # complete build
        for stage in ("analyzed", "segments"):
            if not os.path.exists(_manifest_path(self.dir, stage)):
                _write_manifest(self.dir, stage, self.config, time.time())
        return InvertedIndex(self.spark, self.dir)


def stream_directory(
    spark: SparkSession,
    watch_dir: str,
    indexer: IncrementalIndexer,
    checkpoint_dir: str,
    schema: str,
    text_col: str = "content",
    id_col: str | None = None,
    available_now: bool = True,
):
    """topic()/daemon() analog: consume parquet files dropped into
    ``watch_dir`` as micro-batches into the indexer.

    Structured Streaming's file-source log IS the checkpoint (exactly the
    ``_version_`` high-water-mark TopicStream persists): restarting the
    stream with the same checkpoint re-delivers nothing already indexed.
    ``available_now=True`` drains the backlog and stops (daemon mode
    would use a processing-time trigger instead).
    """
    stream = (
        spark.readStream.schema(schema).parquet(watch_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.limit(1).count() == 0:
            return
        indexer.append_batch(batch_df, text_col=text_col, id_col=id_col)

    writer = stream.writeStream.foreachBatch(handle).option("checkpointLocation", checkpoint_dir)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="5 seconds").start()
