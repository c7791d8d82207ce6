"""Inverted-index build: staged, resumable, skew-aware.

The Spark restatement of the reference's indexing path (SURVEY.md §3.2):
Solr's ``/update`` pipeline (``update/DirectUpdateHandler2.java:416,462`` →
Lucene IndexWriter flush/merge under TieredMergePolicy,
``index/DefaultMergePolicyFactory.java:42``) becomes four checkpointed
Spark stages, each writing a Parquet "table" + a JSON lineage manifest
(the analog of Solr's transaction-log/recovery bookkeeping,
``update/UpdateLog.java:105,178``):

1. ``analyzed``  — deterministic doc_id assignment (global rank over the
   (repo, path, commit) primary key — the analog of Lucene segment-local
   docIDs + compositeId shard routing, ``CompositeIdRouter.java:81``),
   tokenization (analysis chain), content sha256, doc length.
2. ``segments``  — per-partition postings: (term, doc_id, tf, doc_len).
   The analog of flushed in-memory segments before merge.
3. ``term_dict`` — global term dictionary: df, cf, idf, hot flag.
   The analog of Solr's distributed exact stats cache
   (``search/stats/ExactStatsCache.java:62,192``) — global by
   construction, so every partition scores with identical IDF.
4. ``blocks``    — the merged, compressed index: fixed-size posting
   blocks per (term, salt) with delta+varint docID gaps, varint tf/dl,
   and stats-independent pruning metadata (per-block max_tf / min_dl —
   Block-Max WAND bounds derived at query time, so blocks survive
   global-stat drift between incremental commits). Hot terms
   (df > threshold) are salted into sub-streams so no single reducer
   owns a whole hot posting list — the skew answer demanded by code
   corpora where ``import``/``def``/``return`` appear in most docs.

Resume = "skip any stage whose manifest exists and matches the config
hash"; kill the build between stages and re-running yields a
bit-identical index (tested).

Scale notes (100 TB / 10^12 docs):
- ONE wide shuffle in the whole build: analyze is map-only after one
  range repartition; segments is MAP-ONLY (postings of a doc depend only
  on that doc — extracted with a vectorized numpy kernel per Arrow
  batch, no posexplode→groupBy shuffle); term_dict is a partial-agg
  rollup of segments; blocks is the one shuffle, keyed term_bucket, with
  an in-partition sort and a single streaming Arrow encode pass (no
  window function, no collect_list).
- the blocks exchange ships per-(term, salt) posting RUNS, not postings:
  each map task packs ~512k-posting regions of its doc-ordered stream
  into one row per (term, salt) whose doc/tf/dl/position streams are
  already delta+varint-packed (the mapper region is a Lucene mini-
  segment; a run is its posting list for one term). Doc ids are range-
  assigned, so runs of a group cover disjoint doc ranges — the reducer
  sorts O(runs) rows by (term, salt, min_doc) and CONCATENATES instead
  of sorting O(postings) rows, then decodes all runs of a region in one
  vectorized codec pass and re-blocks. Measured at 240k docs/local[4]:
  shuffle bytes 1070 MB → 247 MB (4.3x), wall 15-25% faster locally;
  on a real cluster the 4.3x is network traffic off the build's only
  wide exchange. Byte-identical blocks to the row-level exchange
  (tested, positions+payloads included).
- the term_dict↔segments join is keyed on term: Catalyst/AQE broadcasts
  it when small, else it folds into the same exchange.
- blocks land partitioned by ``term_bucket = pmod(xxhash64(term), B)``
  and sorted by term within files → query-side term lookups do
  directory-level partition pruning + Parquet row-group pruning. At
  cluster scale B is set to a few × total cores (bucket skew is bounded
  because hot terms are salted before bucketing).
"""

from __future__ import annotations

import functools
import hashlib
import json
import math
import os
import shutil
import time
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from solr_spark.analysis import (
    CODE_CHAIN,
    CODE_PORTER_CHAIN,
    CODE_STEM_CHAIN,
    TEXT_CHAIN,
    AnalyzerChain,
)
from solr_spark.index.codec import delta_varint_encode, positions_encode, varint_encode

CHAINS: dict[str, AnalyzerChain] = {
    "code": CODE_CHAIN,
    "text_general": TEXT_CHAIN,
    "code_stem": CODE_STEM_CHAIN,
    "code_porter": CODE_PORTER_CHAIN,
}


@dataclass(frozen=True)
class IndexConfig:
    """Frozen build knobs (hashed into stage manifests for resume safety)."""

    block_size: int = 128           # docs per posting block (Lucene-ish)
    hot_df_threshold: int = 50_000  # df above which a term is salted
    n_salts: int = 16               # sub-streams per hot term
    n_term_buckets: int = 32        # directory partitions of blocks/
    k1: float = 1.2                 # BM25SimilarityFactory.java:48
    b: float = 0.75                 # BM25SimilarityFactory.java:49
    analyzer: str = "code"
    with_positions: bool = True     # store positions (phrase queries)
    with_payloads: bool = False     # per-occurrence payload stream
                                    # (payload_score; frozen payload
                                    # function: (len(token)+position)
                                    # mod 8 — the DelimitedPayload
                                    # TokenFilter analog for a corpus
                                    # with no delimited payload source)
    format_version: int = 2         # v2: stats-independent block metadata
                                    # (max_tf/min_dl) + stored_text field

    def chain(self) -> AnalyzerChain:
        return CHAINS[self.analyzer]

    def config_hash(self) -> str:
        return hashlib.sha256(json.dumps(asdict(self), sort_keys=True).encode()).hexdigest()[:16]


# ---------------------------------------------------------------------------
# lineage manifests
# ---------------------------------------------------------------------------


def _stage_dir(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, stage)


def _manifest_path(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, f"_MANIFEST_{stage}.json")


def _write_manifest(out_dir: str, stage: str, config: IndexConfig, t0: float, extra: dict | None = None) -> dict:
    """Per-stage lineage: per-file row counts/bytes from Parquet footers.

    This is the per-partition lineage + metrics record the north rule
    requires: each output file (= one write task / partition) is listed
    with its row count and size, plus stage wall time and the config hash
    that produced it.
    """
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    sdir = _stage_dir(out_dir, stage)
    paths = []
    for root, _dirs, names in os.walk(sdir):
        for n in sorted(names):
            if n.endswith(".parquet"):
                paths.append(os.path.join(root, n))

    def _one(p: str) -> dict:
        return {
            "file": os.path.relpath(p, sdir),
            "rows": pq.ParquetFile(p).metadata.num_rows,
            "bytes": os.path.getsize(p),
        }

    # footer reads are I/O-bound and independent — a serial loop here is
    # pure driver-side dead time that a cluster build would pay per stage
    with ThreadPoolExecutor(max_workers=min(16, max(1, len(paths)))) as ex:
        files = list(ex.map(_one, paths))
    manifest = {
        "stage": stage,
        "config_hash": config.config_hash(),
        "rows": int(sum(f["rows"] for f in files)),
        "n_files": len(files),
        "files": files,
        "wall_sec": round(time.time() - t0, 3),
        "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        **(extra or {}),
    }
    with open(_manifest_path(out_dir, stage), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def _stage_done(out_dir: str, stage: str, config: IndexConfig) -> bool:
    p = _manifest_path(out_dir, stage)
    if not os.path.exists(p):
        return False
    with open(p) as f:
        m = json.load(f)
    return m.get("config_hash") == config.config_hash()


def _clear_stage(out_dir: str, stage: str) -> None:
    shutil.rmtree(_stage_dir(out_dir, stage), ignore_errors=True)
    try:
        os.remove(_manifest_path(out_dir, stage))
    except FileNotFoundError:
        pass


# ---------------------------------------------------------------------------
# stage 1: analyze (doc ids, tokens, stats)
# ---------------------------------------------------------------------------


def assign_doc_ids(df: DataFrame, sort_cols: list[str], partitions: int | None = None) -> DataFrame:
    """Deterministic global doc_id = rank over ``sort_cols`` (a unique key).

    Scalable two-phase ranking (no single-partition global window).
    doc_id is invariant to the partition count because it equals the
    global rank of a unique sort key.

    Entirely JVM-side (no Python round-trip of the corpus): local row
    numbers come from ``monotonically_increasing_id()`` evaluated AFTER the
    in-partition sort (Catalyst does not push nondeterministic projections
    through sorts), normalized per partition by its min id; global offsets
    are a tiny driver-side cumulative sum broadcast-joined back.
    """
    spark = df.sparkSession
    if partitions is None:
        # 1 task per slot. The analyze/postings stages downstream inherit
        # this partitioning; doc_id assignment is partition-count
        # invariant (rank over a unique key), so the choice is purely
        # physical. The earlier 3x-slots multiplier (straggler smoothing)
        # was re-measured: at bench scale (20k docs) the extra tasks cost
        # ~1s of pure scheduling across the unit's jobs (interleaved A/B:
        # 4.4s vs 5.5s), while at the scales where smoothing could matter
        # (240k+ docs, minutes-long tasks) range partitions of equal row
        # counts are already length-balanced (random doc lengths, n/P in
        # the tens of thousands) and task overhead is amortized — the
        # 1->4 scaling efficiency is insensitive to the multiplier
        # (re-verified after the change, SCALING.json). On a real
        # cluster, partition sizing should follow bytes
        # (maxPartitionBytes), not a slots multiplier.
        partitions = max(spark.sparkContext.defaultParallelism, 1)

    part = (
        df.repartitionByRange(partitions, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
        .persist()
    )
    stats = (
        part.groupBy("_pid")
        .agg(F.count("*").alias("cnt"), F.min("_mid").alias("min_mid"))
        .collect()
    )
    acc, rows = 0, []
    for r in sorted(stats, key=lambda r: r["_pid"]):
        rows.append((int(r["_pid"]), int(acc), int(r["min_mid"])))
        acc += r["cnt"]
    off_df = spark.createDataFrame(rows, "_pid int, _offset long, _min_mid long")

    out = (
        part.join(F.broadcast(off_df), "_pid")
        .withColumn("doc_id", (F.col("_offset") + F.col("_mid") - F.col("_min_mid")).cast("long"))
        .drop("_pid", "_mid", "_offset", "_min_mid")
    )
    return out


def analyze_docs(
    corpus_df: DataFrame,
    config: IndexConfig,
    text_col: str,
    id_col: str | None,
    sort_cols: list[str],
) -> DataFrame:
    """(doc_id, meta…, content_sha256, doc_len, tokens) — the analyzed
    form of the corpus (lazy plan)."""
    chain = config.chain()
    if id_col is not None:
        with_ids = corpus_df.withColumn("doc_id", F.col(id_col).cast("long"))
        if id_col != "doc_id":
            with_ids = with_ids.drop(id_col)
    else:
        with_ids = assign_doc_ids(corpus_df, sort_cols)
    meta_cols = [c for c in with_ids.columns if c not in (text_col, "doc_id")]
    return (
        with_ids.withColumn("content_sha256", F.sha2(F.col(text_col), 256))
        .withColumn("tokens", chain.tokens(text_col))
        .withColumn("doc_len", F.size("tokens").cast("int"))
        # stored_text = the stored-field store (Solr stored="true"):
        # feeds MLT seed re-tokenization, highlighting, term vectors —
        # O(1)-row point reads instead of posting-table scans
        .withColumn("stored_text", F.col(text_col))
        .select("doc_id", *meta_cols, "content_sha256", "doc_len", "stored_text", "tokens")
    )


def _stage_analyze_and_segments(
    spark: SparkSession,
    corpus_df: DataFrame,
    out_dir: str,
    config: IndexConfig,
    text_col: str,
    id_col: str | None,
    sort_cols: list[str],
) -> None:
    """Fused analyze+segments: the tokens column — the build's largest
    intermediate — never hits disk OR the block-manager cache. Each of
    the two consumers (doc registry write, per-doc postings write)
    recomputes tokenization from the id-bearing frame: tokenize is a
    cheap map-side JVM pass (~6% of the unit, measured), while caching
    the tokenized corpus costs an O(total tokens) columnar cache fill
    that is BOTH slower at bench scale (interleaved A/B: cached 7.6s vs
    recompute 6.6s at 20k docs) and a non-starter at 100 TB, where the
    tokenized corpus cannot live in executor memory. Determinism is
    anchored one level down: rank-assigned doc ids are frozen by the
    persisted frame inside ``assign_doc_ids`` (or come from ``id_col``),
    so both recomputes see identical ids (outputs verified
    checksum-identical against the cached formulation)."""
    analyzed = analyze_docs(corpus_df, config, text_col, id_col, sort_cols)
    analyzed.drop("tokens").write.mode("overwrite").parquet(_stage_dir(out_dir, "analyzed"))
    build_postings(analyzed, config).write.mode("overwrite").parquet(
        _stage_dir(out_dir, "segments")
    )
    spark.catalog.clearCache()  # release the doc-id assignment persist


# ---------------------------------------------------------------------------
# stage 2: segments (raw postings)
# ---------------------------------------------------------------------------


def _segment_schema(with_positions: bool, with_payloads: bool) -> str:
    s = "term string, doc_id long, tf int, doc_len int"
    if with_positions:
        s += ", positions array<int>"
    if with_payloads:
        s += ", payloads array<int>"
    return s


def _doc_postings_arrow(with_positions: bool, with_payloads: bool = False):
    """MAP-ONLY per-doc posting extraction (the Lucene in-memory-segment
    analog): postings of a doc depend only on that doc, so no shuffle is
    needed — the naive ``posexplode → groupBy(term, doc_id)`` formulation
    shuffles every token occurrence and goes superlinear at scale
    (measured).

    Arrow-native end to end (mapInArrow): token lists stay in the Arrow
    ListArray (no object-list materialization), term coding is
    ``pc.dictionary_encode`` (C++ hash table — measured 25x faster than
    the original np.unique object sort and ~6x faster than pd.factorize
    including conversions), the (doc, term) grouping is one stable
    int lexsort (the batch is already position-ordered, so stability
    keeps positions ascending — no position sort key), and the
    positions/payloads list columns are built zero-copy with
    ``pa.ListArray.from_arrays`` instead of a million tiny np.split
    views. No per-token Python anywhere."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def gen(batches):
        for rb in batches:
            if rb.num_rows == 0:
                continue
            schema = rb.schema
            la = rb.column(schema.get_field_index("tokens"))
            lens = np.asarray(pc.list_value_length(la)).astype(np.int64)
            total = int(lens.sum())
            if total == 0:
                continue
            flat = la.flatten()
            dv = pc.dictionary_encode(flat)
            codes = np.asarray(dv.indices)
            n_docs = rb.num_rows
            doc_idx = np.repeat(np.arange(n_docs), lens)
            starts_per_doc = np.cumsum(lens) - lens
            pos_in_doc = (np.arange(total) - np.repeat(starts_per_doc, lens)).astype(
                np.int32
            )
            order = np.lexsort((codes, doc_idx))
            d, c, p = doc_idx[order], codes[order], pos_in_doc[order]
            change = np.empty(total, dtype=bool)
            change[0] = True
            change[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
            g_starts = np.flatnonzero(change)
            tf = np.diff(np.append(g_starts, total)).astype(np.int32)
            docid_np = np.asarray(rb.column(schema.get_field_index("doc_id")))
            dl_np = np.asarray(rb.column(schema.get_field_index("doc_len")))
            arrays = [
                dv.dictionary.take(pa.array(c[g_starts])),
                pa.array(docid_np[d[g_starts]].astype(np.int64)),
                pa.array(tf),
                pa.array(dl_np[d[g_starts]].astype(np.int32)),
            ]
            names = ["term", "doc_id", "tf", "doc_len"]
            offs = pa.array(np.append(g_starts, total).astype(np.int32))
            if with_positions:
                arrays.append(pa.ListArray.from_arrays(offs, pa.array(p)))
                names.append("positions")
            if with_payloads:
                # frozen payload function: (len(token) + position) mod 8
                pl = (
                    np.asarray(pc.utf8_length(flat)).astype(np.int32) + pos_in_doc
                ) % 8
                arrays.append(pa.ListArray.from_arrays(offs, pa.array(pl[order])))
                names.append("payloads")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return gen


def build_postings(analyzed: DataFrame, config: IndexConfig) -> DataFrame:
    """(term, doc_id, tf, doc_len[, positions]) from analyzed docs —
    map-only (no shuffle). Position = index in the surviving-token stream
    (frozen choice: no position gaps at removed stopwords — documented
    deviation from Lucene's StopFilter increment, identical on the
    oracle side)."""
    schema = _segment_schema(config.with_positions, config.with_payloads)
    return analyzed.select("doc_id", "doc_len", "tokens").mapInArrow(
        _doc_postings_arrow(config.with_positions, config.with_payloads), schema=schema
    )




# ---------------------------------------------------------------------------
# stage 3: term dictionary + global stats
# ---------------------------------------------------------------------------


def _stage_term_dict(spark: SparkSession, out_dir: str, config: IndexConfig) -> None:
    analyzed = spark.read.parquet(_stage_dir(out_dir, "analyzed"))
    # one job for both corpus stats (was two full passes: count + sum)
    stats_row = analyzed.agg(
        F.count("*").alias("n"), F.sum("doc_len").alias("s")
    ).collect()[0]
    n_docs = stats_row["n"]
    sum_dl = stats_row["s"] or 0
    avgdl = float(sum_dl) / n_docs if n_docs else 0.0

    segments = spark.read.parquet(_stage_dir(out_dir, "segments"))
    # idf = ln(1 + (N - df + 0.5)/(df + 0.5))   (Lucene BM25, frozen in FIXTURES.md)
    term_dict = (
        segments.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"), F.sum("tf").cast("long").alias("cf"))
        .withColumn(
            "idf",
            F.log1p((F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))),
        )
        .withColumn("is_hot", F.col("df") > F.lit(config.hot_df_threshold))
    )
    (term_dict.repartitionByRange(max(1, spark.sparkContext.defaultParallelism // 4), "term")
     .sortWithinPartitions("term")
     .write.mode("overwrite").parquet(_stage_dir(out_dir, "term_dict")))

    # Reversed projection of the dictionary, range-sorted by the REVERSED
    # term (ReversedWildcardFilterFactory analog, ref
    # solr/core/src/java/org/apache/solr/analysis/ReversedWildcardFilterFactory.java):
    # a leading-wildcard expansion (*suffix) becomes a prefix scan on
    # term_rev, which parquet row-group min/max stats prune — instead of
    # an rlike over the whole vocabulary. The dictionary is O(vocabulary),
    # tiny next to postings, so the second sort order is cheap to keep.
    (spark.read.parquet(_stage_dir(out_dir, "term_dict"))
     .withColumn("term_rev", F.reverse(F.col("term")))
     .repartitionByRange(max(1, spark.sparkContext.defaultParallelism // 4), "term_rev")
     .sortWithinPartitions("term_rev")
     .write.mode("overwrite").parquet(_stage_dir(out_dir, "term_dict_rev")))

    meta = {
        "n_docs": int(n_docs),
        "sum_doc_len": int(sum_dl),
        "avgdl": avgdl,
        "config": asdict(config),
        "config_hash": config.config_hash(),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


# ---------------------------------------------------------------------------
# stage 4: compressed posting blocks (the merged index)
# ---------------------------------------------------------------------------

_BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("salt", T.IntegerType(), False),
        T.StructField("block_no", T.IntegerType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("min_doc_id", T.LongType(), False),
        T.StructField("max_doc_id", T.LongType(), False),
        # stats-INDEPENDENT pruning metadata: the BM25 impact upper bound
        # idf·tf/(tf+k1(1-b+b·dl/avgdl)) is monotonic in tf (up) and dl
        # (down), so (max_tf, min_dl) bounds every posting's impact under
        # WHATEVER the current global stats are. Storing these instead of
        # a precomputed block_max keeps blocks immutable when N/avgdl/idf
        # drift (incremental appends/deletes) — only buckets with changed
        # postings ever need rewriting (TieredMergePolicy analog).
        T.StructField("max_tf", T.IntegerType(), False),
        T.StructField("min_dl", T.IntegerType(), False),
        T.StructField("doc_ids_enc", T.BinaryType(), False),
        T.StructField("tfs_enc", T.BinaryType(), False),
        T.StructField("dls_enc", T.BinaryType(), False),
        T.StructField("pos_enc", T.BinaryType(), True),
        # per-occurrence payload stream (varint, runs framed by the tf
        # array like pos_enc) — NULL unless built with_payloads
        # (ref: PayloadScoreQParserPlugin.java / DelimitedPayloadTokenFilter)
        T.StructField("payloads_enc", T.BinaryType(), True),
    ]
)


_BLOCK_COLS = [f.name for f in _BLOCK_SCHEMA.fields]


def _encode_blocks_vec(tbl, block_size: int, with_positions: bool, with_payloads: bool):
    """Vectorized block encode over ONE Arrow table of (term, salt,
    doc_id)-sorted postings: every varint stream for the whole batch is
    produced by a single :func:`varint_encode_segmented` pass and sliced
    per block — byte-identical to the per-block encoders (delta framing:
    docID gaps reset absolute at block starts; position runs reset at
    doc starts, exactly ``positions_encode``). Replaces the per-block
    Python loop (tens of thousands of tiny numpy calls per batch)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from solr_spark.index.codec import varint_encode_segmented

    n = tbl.num_rows
    tcol = tbl.column("term").combine_chunks()
    if pa.types.is_dictionary(tcol.type):
        tcodes = np.asarray(tcol.indices)
    else:
        tcodes = np.asarray(pc.dictionary_encode(tcol).indices)
    s = np.asarray(tbl.column("salt"))
    doc = np.asarray(tbl.column("doc_id")).astype(np.int64)
    tf = np.asarray(tbl.column("tf")).astype(np.int64)
    dl = np.asarray(tbl.column("doc_len")).astype(np.int64)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (tcodes[1:] != tcodes[:-1]) | (s[1:] != s[:-1])
    g_id = np.cumsum(change) - 1
    g_starts = np.flatnonzero(change)
    idx_in_group = np.arange(n) - g_starts[g_id]
    blk_change = change | (idx_in_group % block_size == 0)
    blk_starts = np.flatnonzero(blk_change)
    blk_ends = np.append(blk_starts[1:], n)
    nb = len(blk_starts)

    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = doc[0]
    deltas[1:] = doc[1:] - doc[:-1]
    deltas[blk_starts] = doc[blk_starts]
    ids_buf, ids_off = varint_encode_segmented(deltas, blk_starts)
    tfs_buf, tfs_off = varint_encode_segmented(tf, blk_starts)
    dls_buf, dls_off = varint_encode_segmented(dl, blk_starts)

    def _slices(buf, off):
        return [buf[off[i]:off[i + 1]] for i in range(nb)]

    pos_col = None
    pay_col = None
    if with_positions or with_payloads:
        occ_row_starts = np.cumsum(tf) - tf  # first occurrence index per row
        blk_occ_starts = occ_row_starts[blk_starts]
    if with_positions:
        pos_la = tbl.column("positions").combine_chunks()
        flatp = np.asarray(pos_la.flatten()).astype(np.int64)
        pdeltas = np.empty(len(flatp), dtype=np.int64)
        if len(flatp):
            pdeltas[0] = flatp[0]
            pdeltas[1:] = flatp[1:] - flatp[:-1]
            pdeltas[occ_row_starts] = flatp[occ_row_starts]  # doc runs absolute
        pos_buf, pos_off = varint_encode_segmented(pdeltas, blk_occ_starts)
        pos_col = pa.array(_slices(pos_buf, pos_off), type=pa.binary())
    if with_payloads:
        pay_la = tbl.column("payloads").combine_chunks()
        flatpl = np.asarray(pay_la.flatten()).astype(np.int64)
        pay_buf, pay_off = varint_encode_segmented(flatpl, blk_occ_starts)
        pay_col = pa.array(_slices(pay_buf, pay_off), type=pa.binary())

    term_out = tcol.take(pa.array(blk_starts))
    if pa.types.is_dictionary(term_out.type):
        term_out = term_out.cast(pa.string())
    arrays = [
        term_out,
        pa.array(s[blk_starts].astype(np.int32)),
        pa.array((idx_in_group[blk_starts] // block_size).astype(np.int32)),
        pa.array((blk_ends - blk_starts).astype(np.int32)),
        pa.array(doc[blk_starts]),
        pa.array(doc[blk_ends - 1]),
        pa.array(np.maximum.reduceat(tf, blk_starts).astype(np.int32)),
        pa.array(np.minimum.reduceat(dl, blk_starts).astype(np.int32)),
        pa.array(_slices(ids_buf, ids_off), type=pa.binary()),
        pa.array(_slices(tfs_buf, tfs_off), type=pa.binary()),
        pa.array(_slices(dls_buf, dls_off), type=pa.binary()),
        pos_col if pos_col is not None else pa.nulls(nb, pa.binary()),
        pay_col if pay_col is not None else pa.nulls(nb, pa.binary()),
    ]
    return pa.RecordBatch.from_arrays(arrays, names=_BLOCK_COLS)


def _encode_stream_arrow(block_size: int, with_positions: bool, with_payloads: bool = False):
    """Streaming Arrow block encoder over sorted partition input: one
    pass, groups spanning batch boundaries carried forward as an Arrow
    table slice (carry bounded by the largest (term, salt) group, which
    hot-term salting bounds by design)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def enc(batches):
        carry = None  # pa.Table
        for rb in batches:
            tbl = pa.Table.from_batches([rb])
            if carry is not None and carry.num_rows:
                tbl = pa.concat_tables([carry, tbl]).combine_chunks()
            carry = None
            n = tbl.num_rows
            if n == 0:
                continue
            tcodes = np.asarray(pc.dictionary_encode(tbl.column("term").combine_chunks()).indices)
            s = np.asarray(tbl.column("salt"))
            change = (tcodes[1:] != tcodes[:-1]) | (s[1:] != s[:-1])
            starts = np.flatnonzero(change)
            if len(starts) == 0:
                carry = tbl  # single (possibly incomplete) group
                continue
            last_start = int(starts[-1]) + 1
            carry = tbl.slice(last_start)
            yield _encode_blocks_vec(
                tbl.slice(0, last_start), block_size, with_positions, with_payloads
            )
        if carry is not None and carry.num_rows:
            yield _encode_blocks_vec(carry, block_size, with_positions, with_payloads)

    return enc



def _encode_group_rows(pdf: pd.DataFrame, block_size: int, with_positions: bool, with_payloads: bool = False) -> pd.DataFrame:
    """REFERENCE implementation (per-block loop) kept for the
    byte-equivalence test against :func:`_encode_blocks_vec` — the
    production path is the vectorized Arrow encoder above.

    Encode a run of (term, salt, doc_id)-sorted postings into blocks.

    ``pos_enc`` holds the per-doc delta-coded position runs (lengths =
    the tf array, so decode needs no extra framing); NULL when the index
    is built without positions.
    """
    t = pdf["term"].to_numpy()
    s = pdf["salt"].to_numpy()
    doc = pdf["doc_id"].to_numpy()
    tf = pdf["tf"].to_numpy().astype(np.int64)
    dl = pdf["doc_len"].to_numpy().astype(np.int64)
    pos = pdf["positions"].to_numpy() if with_positions else None
    pay = pdf["payloads"].to_numpy() if with_payloads else None
    change = np.empty(len(t), dtype=bool)
    change[0] = True
    change[1:] = (t[1:] != t[:-1]) | (s[1:] != s[:-1])
    g_starts = np.flatnonzero(change)
    g_ends = np.append(g_starts[1:], len(t))
    rows = []
    for gs, ge in zip(g_starts, g_ends):
        n_blocks = (ge - gs + block_size - 1) // block_size
        for b in range(n_blocks):
            lo = gs + b * block_size
            hi = min(lo + block_size, ge)
            ids = doc[lo:hi]
            if with_positions:
                flat = (
                    np.concatenate([np.asarray(p, dtype=np.int64) for p in pos[lo:hi]])
                    if hi > lo
                    else np.empty(0, dtype=np.int64)
                )
                pos_enc = positions_encode(flat, tf[lo:hi])
            else:
                pos_enc = None
            if with_payloads:
                pay_flat = (
                    np.concatenate([np.asarray(x, dtype=np.int64) for x in pay[lo:hi]])
                    if hi > lo
                    else np.empty(0, dtype=np.int64)
                )
                pay_enc = varint_encode(pay_flat)
            else:
                pay_enc = None
            rows.append(
                (
                    t[gs], int(s[gs]), b, hi - lo, int(ids[0]), int(ids[-1]),
                    int(tf[lo:hi].max()), int(dl[lo:hi].min()),
                    delta_varint_encode(ids),
                    varint_encode(tf[lo:hi]),
                    varint_encode(dl[lo:hi]),
                    pos_enc,
                    pay_enc,
                )
            )
    return pd.DataFrame(rows, columns=_BLOCK_COLS)


def _encode_stream_udf(block_size: int, with_positions: bool, with_payloads: bool = False):
    """Streaming block encoder over (term, salt, doc_id)-sorted partition
    input: ONE Arrow pass, no window function, no collect_list — groups
    that span Arrow-batch boundaries are carried forward (carry size is
    bounded by the largest (term, salt) group, which hot-term salting
    bounds by design)."""

    def enc(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            t = pdf["term"].to_numpy()
            s = pdf["salt"].to_numpy()
            change = (t[1:] != t[:-1]) | (s[1:] != s[:-1])
            starts = np.flatnonzero(change)
            if len(starts) == 0:
                carry = pdf  # single (possibly incomplete) group
                continue
            last_start = int(starts[-1]) + 1
            carry = pdf.iloc[last_start:]
            yield _encode_group_rows(pdf.iloc[:last_start], block_size, with_positions, with_payloads)
        if carry is not None and len(carry):
            yield _encode_group_rows(carry, block_size, with_positions, with_payloads)

    return enc


# ---------------------------------------------------------------------------
# run-packed blocks exchange
# ---------------------------------------------------------------------------
#
# The blocks shuffle used to ship ONE ROW PER POSTING (term string, salt,
# doc_id, tf, doc_len, positions…) and re-sort all of them on the reducer.
# At 10^12 files that is a shuffle of ~10^13 rows whose sort keys are
# strings — the one stage in the build whose cost grew faster than the
# data. The exchange now ships posting RUNS: map-side, each task packs a
# region of its (doc-ordered) posting stream into one row per
# (term, salt) with columnar arrays (the Lucene analogy is exact — a
# mapper's region IS a mini-segment, and a run is that segment's posting
# list for one term). Because doc_ids are range-partitioned at assignment
# and each (doc, term) posting exists exactly once, runs of the same
# (term, salt) from different regions cover DISJOINT doc-id ranges —
# the reducer sorts O(runs) rows by (term, salt, min_doc) and
# CONCATENATES, instead of sorting O(postings) rows. Shuffle rows shrink
# by ~the run length, term strings ship once per run, and the reducer's
# sort input is ~2 orders of magnitude smaller. (Ref: Lucene's segment
# merge concatenates doc-ordered postings per term rather than re-sorting
# them — IndexWriter merges via TieredMergePolicy,
# index/DefaultMergePolicyFactory.java:42.)

_PACK_ROWS = 1 << 19  # postings per map-side pack region (~30 MB arrays)


def _run_schema(with_positions: bool, with_payloads: bool) -> str:
    s = (
        "term string, salt int, term_bucket int, min_doc long, max_doc long, "
        "n int, doc_enc binary, tf_enc binary, dl_enc binary"
    )
    if with_positions:
        s += ", pos_enc binary"
    if with_payloads:
        s += ", pay_enc binary"
    return s


def _binary_cells_concat(col) -> np.ndarray:
    """Concatenated bytes of an Arrow binary column, in row order —
    zero-copy: for a single-chunk binary array the data buffer IS the
    row-order concatenation; slices are handled via the offsets buffer."""
    import pyarrow as pa

    arr = col.combine_chunks() if hasattr(col, "num_chunks") else col
    if isinstance(arr, pa.ChunkedArray):
        if arr.num_chunks == 0:
            return np.empty(0, dtype=np.uint8)
        arr = arr.chunk(0)
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    return np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]]


def _bin_from_offsets(buf: bytes, off: np.ndarray):
    """Zero-copy Arrow binary array framing ``buf`` at byte offsets
    ``off`` (len(off) = rows + 1) — replaces a Python loop of per-run
    byte slices."""
    import pyarrow as pa

    off32 = np.ascontiguousarray(off, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(), len(off32) - 1,
        [None, pa.py_buffer(off32.tobytes()), pa.py_buffer(buf)],
    )


def _pack_runs_arrow(with_positions: bool, with_payloads: bool):
    """Map-side packer: accumulate posting rows to ``_PACK_ROWS``-sized
    regions, then emit one row per (term, salt) run with the run's
    posting streams ALREADY delta+varint-packed (docID gaps reset
    absolute at run start; position runs reset at doc starts — the exact
    framing the blocks codec uses, so the reducer decodes with the same
    :mod:`codec` kernels). The exchange therefore ships ~1-2 bytes per
    posting value instead of 8-byte ints in per-posting rows.
    The stable lexsort keeps each run's postings in input order, which is
    doc-ascending within a region (segments rows are emitted doc-major)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from solr_spark.index.codec import varint_encode_segmented

    def _pack(tbl):
        n = tbl.num_rows
        tcol = tbl.column("term").combine_chunks()
        dv = pc.dictionary_encode(tcol)
        codes = np.asarray(dv.indices).astype(np.int64)
        salt = np.asarray(tbl.column("salt")).astype(np.int64)
        doc_key = np.asarray(tbl.column("doc_id")).astype(np.int64)
        # doc as tertiary sort key: a map partition holding several
        # parquet files sees them in file order, not doc order — sorting
        # on doc here guarantees every run is doc-ascending regardless,
        # so the reducer's repair path never fires for in-region order
        order = np.lexsort((doc_key, salt, codes))
        c_o, s_o = codes[order], salt[order]
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (c_o[1:] != c_o[:-1]) | (s_o[1:] != s_o[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        doc = doc_key[order]
        tf = np.asarray(tbl.column("tf")).astype(np.int64)[order]
        dl = np.asarray(tbl.column("doc_len")).astype(np.int64)[order]
        tb = np.asarray(tbl.column("term_bucket")).astype(np.int32)[order]

        deltas = np.empty(n, dtype=np.int64)
        deltas[0] = doc[0]
        deltas[1:] = doc[1:] - doc[:-1]
        deltas[starts] = doc[starts]  # run starts absolute
        doc_buf, doc_off = varint_encode_segmented(deltas, starts)
        tf_buf, tf_off = varint_encode_segmented(tf, starts)
        dl_buf, dl_off = varint_encode_segmented(dl, starts)

        arrays = [
            dv.dictionary.take(pa.array(c_o[starts])),
            pa.array(s_o[starts].astype(np.int32)),
            pa.array(tb[starts]),
            # true min/max (not first/last) — immune to any upstream
            # ordering surprise; the reducer orders runs by min_doc and
            # verifies disjointness before concatenating
            pa.array(np.minimum.reduceat(doc, starts)),
            pa.array(np.maximum.reduceat(doc, starts)),
            pa.array((ends - starts).astype(np.int32)),
            _bin_from_offsets(doc_buf, doc_off),
            _bin_from_offsets(tf_buf, tf_off),
            _bin_from_offsets(dl_buf, dl_off),
        ]
        names = ["term", "salt", "term_bucket", "min_doc", "max_doc",
                 "n", "doc_enc", "tf_enc", "dl_enc"]
        if with_positions or with_payloads:
            occ_row_starts = (np.cumsum(tf) - tf).astype(np.int64)
            run_occ_starts = occ_row_starts[starts]
            oidx = pa.array(order)
        if with_positions:
            pos_o = tbl.column("positions").combine_chunks().take(oidx)
            flatp = np.asarray(pos_o.flatten()).astype(np.int64)
            pdeltas = np.empty(len(flatp), dtype=np.int64)
            if len(flatp):
                pdeltas[0] = flatp[0]
                pdeltas[1:] = flatp[1:] - flatp[:-1]
                pdeltas[occ_row_starts] = flatp[occ_row_starts]  # doc runs absolute
            pos_buf, pos_off = varint_encode_segmented(pdeltas, run_occ_starts)
            arrays.append(_bin_from_offsets(pos_buf, pos_off))
            names.append("pos_enc")
        if with_payloads:
            pay_o = tbl.column("payloads").combine_chunks().take(oidx)
            flatpl = np.asarray(pay_o.flatten()).astype(np.int64)
            pay_buf, pay_off = varint_encode_segmented(flatpl, run_occ_starts)
            arrays.append(_bin_from_offsets(pay_buf, pay_off))
            names.append("pay_enc")
        return pa.RecordBatch.from_arrays(arrays, names=names)

    def gen(batches):
        acc, rows = [], 0
        for rb in batches:
            if rb.num_rows == 0:
                continue
            acc.append(rb)
            rows += rb.num_rows
            if rows >= _PACK_ROWS:
                yield _pack(pa.Table.from_batches(acc).combine_chunks())
                acc, rows = [], 0
        if rows:
            yield _pack(pa.Table.from_batches(acc).combine_chunks())

    return gen


def _runs_to_postings_tbl(tbl, with_positions: bool, with_payloads: bool):
    """Reducer-side flatten of (term, salt, min_doc)-sorted runs back to
    the per-posting table the block encoder consumes. All runs of a
    reducer region decode in ONE pass per stream: the binary cells of a
    combined Arrow column are contiguous in row order, and the codec's
    segmented-delta decode (:func:`codec.positions_decode`) restores
    absolute values with per-run resets. Runs of one group cover disjoint
    doc ranges, so concatenation IS the merge; the invariant is verified
    and repaired with a full sort if ever violated (never expected —
    kept so correctness is unconditional, not an artifact of the
    partitioning)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from solr_spark.index.codec import positions_decode, varint_decode

    tcol = tbl.column("term").combine_chunks()
    dv = pc.dictionary_encode(tcol)
    codes = np.asarray(dv.indices).astype(np.int64)
    salt = np.asarray(tbl.column("salt")).astype(np.int64)
    lens = np.asarray(tbl.column("n")).astype(np.int64)
    doc_cat = _binary_cells_concat(tbl.column("doc_enc"))
    tf_cat = _binary_cells_concat(tbl.column("tf_enc"))
    dl_cat = _binary_cells_concat(tbl.column("dl_enc"))
    # segmented delta decode: frames = run lengths, firsts absolute
    doc = positions_decode(doc_cat, lens).astype(np.int64)
    tf = varint_decode(tf_cat).astype(np.int64)
    dl = varint_decode(dl_cat).astype(np.int64)
    n = len(doc)
    pcodes = np.repeat(codes, lens)
    psalt = np.repeat(salt, lens)
    cols: dict = {
        "term": pa.DictionaryArray.from_arrays(pa.array(pcodes.astype(np.int32)), dv.dictionary),
        "salt": pa.array(psalt.astype(np.int32)),
        "doc_id": pa.array(doc),
        "tf": pa.array(tf.astype(np.int32)),
        "doc_len": pa.array(dl.astype(np.int32)),
    }
    if with_positions or with_payloads:
        occ_offs = pa.array(np.concatenate([[0], np.cumsum(tf)]).astype(np.int32))
    if with_positions:
        pos_cat = _binary_cells_concat(tbl.column("pos_enc"))
        pos_flat = positions_decode(pos_cat, tf).astype(np.int32)
        cols["positions"] = pa.ListArray.from_arrays(occ_offs, pa.array(pos_flat))
    if with_payloads:
        pay_cat = _binary_cells_concat(tbl.column("pay_enc"))
        pay_flat = varint_decode(pay_cat).astype(np.int32)
        cols["payloads"] = pa.ListArray.from_arrays(occ_offs, pa.array(pay_flat))
    if n > 1:
        same = (pcodes[1:] == pcodes[:-1]) & (psalt[1:] == psalt[:-1])
        if not np.all(doc[1:][same] > doc[:-1][same]):
            gid = np.concatenate([[0], np.cumsum(~same)])
            order = pa.array(np.lexsort((doc, gid)))
            cols = {k: v.take(order) for k, v in cols.items()}
    return pa.table(cols)


def _encode_stream_runs(block_size: int, with_positions: bool, with_payloads: bool = False):
    """Streaming block encoder over (term, salt, min_doc)-sorted RUN
    input: same carry discipline as :func:`_encode_stream_arrow`, but the
    carry holds runs (one row per mapper region per group — bounded by
    salting), and each complete region is flattened then encoded by the
    shared vectorized encoder, so block bytes are identical to the
    row-level path (tested)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def enc(batches):
        carry = None
        for rb in batches:
            tbl = pa.Table.from_batches([rb])
            if carry is not None and carry.num_rows:
                tbl = pa.concat_tables([carry, tbl]).combine_chunks()
            carry = None
            n = tbl.num_rows
            if n == 0:
                continue
            tcodes = np.asarray(pc.dictionary_encode(tbl.column("term").combine_chunks()).indices)
            s = np.asarray(tbl.column("salt"))
            change = (tcodes[1:] != tcodes[:-1]) | (s[1:] != s[:-1])
            starts = np.flatnonzero(change)
            if len(starts) == 0:
                carry = tbl  # single (possibly incomplete) group
                continue
            last_start = int(starts[-1]) + 1
            carry = tbl.slice(last_start)
            yield _encode_blocks_vec(
                _runs_to_postings_tbl(tbl.slice(0, last_start), with_positions, with_payloads),
                block_size, with_positions, with_payloads,
            )
        if carry is not None and carry.num_rows:
            yield _encode_blocks_vec(
                _runs_to_postings_tbl(carry, with_positions, with_payloads),
                block_size, with_positions, with_payloads,
            )

    return enc


def _blocks_shuffle_input(
    segments: DataFrame,
    term_dict: DataFrame,
    config: IndexConfig,
    only_buckets: list[int] | None = None,
) -> DataFrame:
    """The salted, bucketed, sorted shuffle input the block encoder
    consumes — factored out so tests can assert the skew property
    (a hot term's postings span >1 shuffle partition) on the real path."""
    # Salt assignment needs only HOTNESS, not the full dictionary.
    # Joining segments (O(total postings)) against the whole term_dict
    # (O(vocabulary) — billions of distinct identifiers in code at 10^12
    # files) would be a sort-merge join: a second full shuffle of the
    # posting stream. The hot set is tiny BY CONSTRUCTION — at most
    # total_postings / hot_df_threshold terms, in practice the Zipf head
    # ('import', 'def', 'return') — so broadcast it and left-join: the
    # posting stream is touched map-side only, and the one real shuffle
    # stays the (term_bucket, salt) block exchange below.
    hot = F.broadcast(
        term_dict.where(F.col("is_hot")).select("term", F.lit(True).alias("_hot"))
    )
    p = segments.join(hot, "term", "left")
    p = p.withColumn(
        "salt",
        F.when(F.col("_hot").isNotNull(), F.pmod(F.xxhash64("doc_id"), F.lit(config.n_salts)).cast("int")).otherwise(F.lit(0)),
    ).drop("_hot")
    p = p.withColumn(
        "term_bucket", F.pmod(F.xxhash64("term"), F.lit(config.n_term_buckets)).cast("int")
    )
    if only_buckets is not None:
        p = p.where(F.col("term_bucket").isin([int(x) for x in only_buckets]))
    cols = ["term", "salt", "doc_id", "tf", "doc_len", "term_bucket"]
    if config.with_positions:
        cols.append("positions")
    if config.with_payloads:
        cols.append("payloads")
    n_parts = config.n_term_buckets if only_buckets is None else max(1, len(only_buckets))
    # Pack postings into per-(term, salt) RUNS before the exchange: the
    # shuffle ships O(runs) array rows instead of O(postings) scalar rows
    # and the reducer sorts runs by (term, salt, min_doc) — concatenation
    # of disjoint doc ranges replaces the posting-level sort entirely.
    runs = p.select(*cols).mapInArrow(
        _pack_runs_arrow(config.with_positions, config.with_payloads),
        schema=_run_schema(config.with_positions, config.with_payloads),
    )
    return (
        runs.repartition(n_parts, "term_bucket", "salt")
        .sortWithinPartitions("term", "salt", "min_doc")
    )


def _blocks_shuffle_input_rows(
    segments: DataFrame,
    term_dict: DataFrame,
    config: IndexConfig,
    only_buckets: list[int] | None = None,
) -> DataFrame:
    """ROW-LEVEL exchange (one shuffled row per posting) — the pre-pack
    formulation, kept as the equivalence oracle for the run-packed path:
    both must encode byte-identical blocks (tested)."""
    hot = F.broadcast(
        term_dict.where(F.col("is_hot")).select("term", F.lit(True).alias("_hot"))
    )
    p = segments.join(hot, "term", "left")
    p = p.withColumn(
        "salt",
        F.when(F.col("_hot").isNotNull(), F.pmod(F.xxhash64("doc_id"), F.lit(config.n_salts)).cast("int")).otherwise(F.lit(0)),
    ).drop("_hot")
    p = p.withColumn(
        "term_bucket", F.pmod(F.xxhash64("term"), F.lit(config.n_term_buckets)).cast("int")
    )
    if only_buckets is not None:
        p = p.where(F.col("term_bucket").isin([int(x) for x in only_buckets]))
    cols = ["term", "salt", "doc_id", "tf", "doc_len", "term_bucket"]
    if config.with_positions:
        cols.append("positions")
    if config.with_payloads:
        cols.append("payloads")
    n_parts = config.n_term_buckets if only_buckets is None else max(1, len(only_buckets))
    return (
        p.select(*cols)
        .repartition(n_parts, "term_bucket", "salt")
        .sortWithinPartitions("term", "salt", "doc_id")
    )


def _stage_blocks(
    spark: SparkSession,
    out_dir: str,
    config: IndexConfig,
    only_buckets: list[int] | None = None,
) -> None:
    """Encode posting blocks. ``only_buckets`` restricts the rebuild to
    the given term_buckets (changed-bucket compaction at commit): the
    scan filters to those buckets' terms, and the write replaces only
    their partition directories (dynamic partition overwrite). Sound
    because block CONTENT is stats-independent (see _BLOCK_SCHEMA): an
    unchanged bucket's blocks are bit-identical to a full rebuild's
    (each (term, salt) group is contiguous and whole inside one shuffle
    partition, and the encode of a group is a pure function of its rows,
    so block bytes do not depend on partition composition).
    """
    segments = spark.read.parquet(_stage_dir(out_dir, "segments"))
    term_dict = spark.read.parquet(_stage_dir(out_dir, "term_dict")).select("term", "is_hot")

    # ONE shuffle: hash-repartition by (term_bucket, salt), sort runs
    # within partitions, stream-encode in a single Arrow pass. Replaces
    # the previous window(row_number) + groupBy(collect_list+sort_array)
    # formulation — same bytes out, two fewer sorts and no struct
    # materialization. SALT MUST BE IN THE SHUFFLE KEY: hashing on
    # term_bucket alone would land a hot term's entire posting run
    # ('import' at 10^12 files) on ONE reducer — the salt exists
    # precisely so that run splits into n_salts independent sub-streams
    # on different reducers. Each (term, salt) group still lives wholly
    # inside one partition (the key is deterministic per row-group), so
    # sortWithinPartitions + the streaming encoder see contiguous runs
    # and block_no numbering is unchanged; the partitionBy("term_bucket")
    # write just gets ≤ n_salts files per bucket directory instead of 1.
    blocks = (
        _blocks_shuffle_input(segments, term_dict, config, only_buckets)
        .mapInArrow(
            _encode_stream_runs(config.block_size, config.with_positions, config.with_payloads),
            schema=_BLOCK_SCHEMA,
        )
        .withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(config.n_term_buckets)).cast("int")
        )
    )
    bdir = _stage_dir(out_dir, "blocks")
    if only_buckets is None:
        blocks.write.mode("overwrite").partitionBy("term_bucket").parquet(bdir)
    else:
        # clear the changed buckets' directories first (a bucket whose
        # postings were ALL deleted must end up empty), then append —
        # untouched bucket directories are left exactly as committed.
        for b in only_buckets:
            shutil.rmtree(os.path.join(bdir, f"term_bucket={int(b)}"), ignore_errors=True)
        if only_buckets:
            blocks.write.mode("append").partitionBy("term_bucket").parquet(bdir)


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

_STAGES = ["analyzed", "segments", "term_dict", "blocks"]


class InvertedIndex:
    """Handle to a built index directory (docs / term_dict / blocks).

    A handle is a SNAPSHOT: the stage DataFrames are memoized on first
    access (``spark.read.parquet`` re-lists files and re-reads footers —
    a driver job per access that showed up as ~2 extra jobs per query in
    the r2 bench regression). After an incremental commit rewrites the
    directory, use the fresh handle the committer returns.
    """

    def __init__(self, spark: SparkSession, out_dir: str):
        self.spark = spark
        self.dir = out_dir
        with open(os.path.join(out_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.config = IndexConfig(**self.meta["config"])

    @functools.cached_property
    def docs(self) -> DataFrame:
        """Doc registry (no tokens — Parquet column pruning keeps it
        cheap). The incremental indexer's ``batch=<id>`` partition column
        is an ingestion detail, dropped here."""
        return (
            self.spark.read.parquet(_stage_dir(self.dir, "analyzed"))
            .drop("tokens")
            .drop("batch")
        )

    @functools.cached_property
    def term_dict(self) -> DataFrame:
        return self.spark.read.parquet(_stage_dir(self.dir, "term_dict"))

    @functools.cached_property
    def term_dict_rev(self) -> DataFrame:
        """Dictionary sorted by reversed term (leading-wildcard seeks).
        Indexes built before the stage existed are lazily backfilled
        (one dictionary-sized write); if the directory is read-only the
        column derives on the fly instead (correct, just not
        range-pruned)."""
        rev_dir = _stage_dir(self.dir, "term_dict_rev")
        if not os.path.isdir(rev_dir):
            try:
                (self.term_dict
                 .withColumn("term_rev", F.reverse(F.col("term")))
                 .repartitionByRange(
                     max(1, self.spark.sparkContext.defaultParallelism // 4),
                     "term_rev")
                 .sortWithinPartitions("term_rev")
                 .write.mode("overwrite").parquet(rev_dir))
            except Exception:
                return self.term_dict.withColumn(
                    "term_rev", F.reverse(F.col("term")))
        return self.spark.read.parquet(rev_dir)

    @functools.cached_property
    def blocks(self) -> DataFrame:
        return self.spark.read.parquet(_stage_dir(self.dir, "blocks"))

    @property
    def segments(self) -> DataFrame:
        return self.spark.read.parquet(_stage_dir(self.dir, "segments"))

    def refresh(self) -> "InvertedIndex":
        """Fresh snapshot handle (re-reads meta + file listings) — use
        after the directory was rewritten outside an incremental commit
        (commits already return a fresh handle)."""
        return InvertedIndex(self.spark, self.dir)

    def manifests(self) -> dict[str, dict]:
        out = {}
        for s in _STAGES:
            p = _manifest_path(self.dir, s)
            if os.path.exists(p):
                with open(p) as f:
                    out[s] = json.load(f)
        return out

    @property
    def n_docs(self) -> int:
        return self.meta["n_docs"]

    @property
    def avgdl(self) -> float:
        return self.meta["avgdl"]


def build_index(
    spark: SparkSession,
    corpus_df: DataFrame,
    out_dir: str,
    config: IndexConfig | None = None,
    resume: bool = True,
    text_col: str = "content",
    id_col: str | None = None,
    sort_cols: list[str] | None = None,
) -> InvertedIndex:
    """Run (or resume) the staged index build. Returns the index handle.

    ``text_col`` is the analyzed field; ``id_col`` (if given) supplies a
    pre-assigned unique long doc id, otherwise ids are assigned as the
    global rank over ``sort_cols`` (default: the input-hint primary key
    (repo, path, commit)).

    With ``resume=True`` any stage whose manifest exists with a matching
    config hash is skipped — kill the job between stages and re-run to
    continue from the last completed stage (tested to be bit-identical).
    """
    config = config or IndexConfig()
    sort_cols = sort_cols or ["repo", "path", "commit"]
    os.makedirs(out_dir, exist_ok=True)

    # fused unit: "analyzed" + "segments" are produced by ONE corpus pass
    # (separate manifests are still written — resume treats the pair as a
    # unit: if either is missing/stale, both are rebuilt)
    if not (
        resume
        and _stage_done(out_dir, "analyzed", config)
        and _stage_done(out_dir, "segments", config)
    ):
        _clear_stage(out_dir, "analyzed")
        _clear_stage(out_dir, "segments")
        t0 = time.time()
        _stage_analyze_and_segments(
            spark, corpus_df, out_dir, config, text_col, id_col, sort_cols
        )
        _write_manifest(out_dir, "analyzed", config, t0)
        _write_manifest(out_dir, "segments", config, t0)

    stage_fns = {
        "term_dict": lambda: _stage_term_dict(spark, out_dir, config),
        "blocks": lambda: _stage_blocks(spark, out_dir, config),
    }
    for stage in ("term_dict", "blocks"):
        if resume and _stage_done(out_dir, stage, config):
            continue
        _clear_stage(out_dir, stage)
        t0 = time.time()
        stage_fns[stage]()
        _write_manifest(out_dir, stage, config, t0)
    return InvertedIndex(spark, out_dir)


# ---------------------------------------------------------------------------
# snapshot / backup / restore (CoreAdmin BACKUPCORE / RESTORECORE analog)
# ---------------------------------------------------------------------------

_SNAP_STAGES = ("analyzed", "segments", "term_dict", "term_dict_rev", "blocks")


def create_snapshot(out_dir: str, name: str) -> str:
    """Point-in-time snapshot of a built index (ref:
    ``handler/admin/CoreAdminHandler.java`` CREATESNAPSHOT /
    ``handler/ReplicationHandler.java`` backup, test
    ``handler/TestReplicationHandlerBackup.java``).

    Hard-links every stage's parquet files (copy fallback across
    filesystems) plus meta.json and the lineage manifests into
    ``<out_dir>/snapshots/<name>`` — the parquet files are immutable
    once written (commits replace whole bucket directories), so
    hard-links give O(#files) snapshots of arbitrarily large indexes,
    exactly like Lucene's segment-file hard-link backups.
    """
    snap = os.path.join(out_dir, "snapshots", name)
    if os.path.exists(snap):
        raise ValueError(f"snapshot {name!r} already exists")

    def _link_tree(src: str, dst: str) -> None:
        for root, _dirs, files in os.walk(src):
            rel = os.path.relpath(root, src)
            tgt = os.path.join(dst, rel) if rel != "." else dst
            os.makedirs(tgt, exist_ok=True)
            for fn in files:
                s, t = os.path.join(root, fn), os.path.join(tgt, fn)
                try:
                    os.link(s, t)
                except OSError:
                    shutil.copy2(s, t)

    os.makedirs(snap, exist_ok=True)
    for stage in _SNAP_STAGES:
        sdir = _stage_dir(out_dir, stage)
        if os.path.isdir(sdir):
            _link_tree(sdir, os.path.join(snap, os.path.basename(sdir)))
        mpath = _manifest_path(out_dir, stage)
        if os.path.exists(mpath):
            shutil.copy2(mpath, os.path.join(snap, os.path.basename(mpath)))
    shutil.copy2(os.path.join(out_dir, "meta.json"), os.path.join(snap, "meta.json"))
    return snap


def restore_snapshot(out_dir: str, name: str) -> None:
    """RESTORECORE analog: replace the live index state with the named
    snapshot's (stages, manifests, meta).

    Crash semantics: the new state is FULLY materialized under
    ``<out_dir>/.restore-tmp`` first (hard-links, no data copy), so the
    slow phase touches nothing live. The swap phase is rename-only and is
    journaled by a ``.restore-inprogress`` marker containing the snapshot
    name: a crash mid-swap leaves the marker behind, and because snapshot
    files are immutable, re-running ``restore_snapshot`` with that name
    (see :func:`pending_restore`) rebuilds the temp tree and completes the
    swap idempotently. Without the marker the state is guaranteed to be
    either wholly old or wholly new.
    """
    snap = os.path.join(out_dir, "snapshots", name)
    if not os.path.isdir(snap):
        raise ValueError(f"no snapshot {name!r} under {out_dir}")
    tmp_root = os.path.join(out_dir, ".restore-tmp")
    marker = os.path.join(out_dir, ".restore-inprogress")
    if os.path.isdir(tmp_root):
        shutil.rmtree(tmp_root)
    os.makedirs(tmp_root)

    # phase 1 (slow, non-destructive): materialize the whole restored
    # state under tmp_root via hard links
    staged: list[tuple[str, str]] = []  # (tmp path, live path) rename pairs
    for stage in _SNAP_STAGES:
        live = _stage_dir(out_dir, stage)
        src = os.path.join(snap, os.path.basename(live))
        if os.path.isdir(src):
            tmp = os.path.join(tmp_root, os.path.basename(live))
            shutil.copytree(src, tmp, copy_function=_link_or_copy)
            staged.append((tmp, live))
        mlive = _manifest_path(out_dir, stage)
        msrc = os.path.join(snap, os.path.basename(mlive))
        if os.path.exists(msrc):
            mtmp = os.path.join(tmp_root, os.path.basename(mlive))
            _link_or_copy(msrc, mtmp)
            staged.append((mtmp, mlive))
    mtmp = os.path.join(tmp_root, "meta.json")
    _link_or_copy(os.path.join(snap, "meta.json"), mtmp)
    staged.append((mtmp, os.path.join(out_dir, "meta.json")))

    # phase 2 (fast, journaled): rename-only swap
    with open(marker, "w") as f:
        f.write(name)
    for tmp, live in staged:
        if os.path.isdir(live):
            shutil.rmtree(live)
        elif os.path.exists(live):
            os.remove(live)
        os.replace(tmp, live)
    os.remove(marker)
    shutil.rmtree(tmp_root, ignore_errors=True)


def pending_restore(out_dir: str) -> str | None:
    """Name of a snapshot whose restore was interrupted mid-swap (the
    ``.restore-inprogress`` journal marker), or None if the live state is
    consistent. Callers recover with ``restore_snapshot(out_dir, name)``."""
    marker = os.path.join(out_dir, ".restore-inprogress")
    if os.path.exists(marker):
        with open(marker) as f:
            return f.read().strip() or None
    return None


def _link_or_copy(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)
