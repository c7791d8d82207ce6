"""BM25 top-k retrieval over the compressed posting-block index.

The Spark restatement of the reference's two-phase distributed search
(SURVEY.md §3.1, Solr ``handler/component/QueryComponent.java:634-693``):

- phase 1 (GET_TOP_IDS analog): prune the block scan to the query terms'
  buckets (directory partition pruning + Parquet row-group pruning),
  decode blocks with an Arrow UDF (numpy varint kernels), aggregate
  per-doc scores, take the global top-k via ``orderBy(...).limit(k)``
  (Spark's TakeOrderedAndProject = per-partition PQ then driver merge —
  exactly Solr's ``mergeIds`` shard priority queue,
  ``QueryComponent.java:971``).
- phase 2 (GET_FIELDS analog): join the k winning doc_ids back to the
  doc registry for display fields — a broadcast semi-join of k rows.

Scoring matches the frozen semantics (FIXTURES.md §3 / Solr
``search/similarities/BM25SimilarityFactory.java:47-50``): k1=1.2,
b=0.75, idf = ln(1+(N-df+0.5)/(df+0.5)), doc length = filtered token
count (discountOverlaps=true). Contributions are computed in float64 and
the final score is quantized to float32 before ranking with
tie-break (score desc, doc_id asc) — the analog of Solr's docid/shard
tie-break (``ShardFieldSortedHitQueue.java:104-107``) — so ranking is
deterministic and independent of float summation order.

Exactness and pruning: results are always EXACT top-k; pruning is only
applied where provably rank-safe (Solr's Block-Max WAND is opt-in via
minExactCount, ``QueryComponent.java:448`` — we keep exactness and use
block-max metadata purely to skip blocks that cannot reach the top k):

- single-term queries: two-pass threshold pruning
  (:meth:`SearchEngine._single_term_pruned_blocks`);
- conjunctive (AND) queries: doc-range block skipping driven by the
  rarest term (:meth:`SearchEngine._and_pruned_blocks`);
- disjunctive (OR) multi-term queries: rank-safe block-max pruning — a
  seed pass establishes θ (a lower bound on the k-th score) and blocks
  whose weighted upper bound ``block_max·w + Σ other terms' global max``
  falls below θ are skipped (:meth:`SearchEngine._or_pruned_blocks`).

All three paths pull block METADATA (not postings) to the driver to pick
seed blocks; each is guarded by ``_WAND_META_LIMIT`` — past that many
metadata rows (a pathological hot term at corpus scale) the engine falls
back to exact full decode rather than materializing the metadata table
driver-side.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from solr_spark.index.build import InvertedIndex
from solr_spark.index.codec import delta_varint_decode, varint_decode

_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("dl", T.IntegerType(), False),
    ]
)


def _decode_blocks_udf():
    """Arrow-batched block decoder: binary columns → exploded postings."""

    def dec(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            terms, doc_ids, tfs, dls = [], [], [], []
            for term, de, te, le in zip(pdf["term"], pdf["doc_ids_enc"], pdf["tfs_enc"], pdf["dls_enc"]):
                d = delta_varint_decode(bytes(de))
                terms.append(np.full(len(d), term, dtype=object))
                doc_ids.append(d.astype(np.int64))
                tfs.append(varint_decode(bytes(te)).astype(np.int32))
                dls.append(varint_decode(bytes(le)).astype(np.int32))
            yield pd.DataFrame(
                {
                    "term": np.concatenate(terms),
                    "doc_id": np.concatenate(doc_ids),
                    "tf": np.concatenate(tfs),
                    "dl": np.concatenate(dls),
                }
            )

    return dec


@dataclass
class TermStats:
    term: str
    df: int
    idf: float
    weight: float  # query-term multiplicity


class SearchEngine:
    """Query engine over a built :class:`InvertedIndex`."""

    def __init__(self, index: InvertedIndex):
        self.index = index
        self.spark = index.spark
        self.config = index.config
        self.k1 = index.config.k1
        self.b = index.config.b
        self.avgdl = index.avgdl or 1.0

    # ------------------------------------------------------------------
    def analyze_query(self, text: str) -> list[str]:
        return self.config.chain().tokenize_py(text)

    def _term_stats(self, terms: list[str]) -> list[TermStats]:
        """Global stats for the query terms — the ExactStatsCache analog.

        A filtered read of term_dict (predicate pushdown on the sorted
        term column) collected to the driver: O(#query terms) rows.
        """
        if not terms:
            return []
        mult = Counter(terms)
        uniq = sorted(mult)
        rows = (
            self.index.term_dict.where(F.col("term").isin(uniq))
            .select(
                "term", "df", "idf",
                # piggyback the bucket hash on the same collect — saves
                # _blocks_for its own driver job on every fresh query
                F.pmod(F.xxhash64("term"), F.lit(self.config.n_term_buckets))
                .cast("int")
                .alias("b"),
            )
            .collect()
        )
        cache = self.__dict__.setdefault("_bucket_cache", {})
        for r in rows:
            cache[r["term"]] = r["b"]
        by_term = {r["term"]: r for r in rows}
        return [
            TermStats(t, by_term[t]["df"], by_term[t]["idf"], float(mult[t]))
            for t in uniq
            if t in by_term
        ]

    def _term_buckets(self, terms: list[str]) -> list[int]:
        """term → term_bucket, memoized per engine: the mapping must match
        the build side's pmod(xxhash64(term), B), so unknown terms go
        through one tiny local Spark expression (JVM hash) and the result
        is cached — repeated queries pay zero driver round-trips."""
        cache = self.__dict__.setdefault("_bucket_cache", {})
        missing = [t for t in terms if t not in cache]
        if missing:
            rows = (
                self.spark.createDataFrame([(t,) for t in missing], "term string")
                .select(
                    "term",
                    F.pmod(F.xxhash64("term"), F.lit(self.config.n_term_buckets))
                    .cast("int")
                    .alias("b"),
                )
                .collect()
            )
            for r in rows:
                cache[r["term"]] = r["b"]
        return sorted({cache[t] for t in terms})

    def _blocks_for(self, terms: list[str]) -> DataFrame:
        """Pruned block scan: partition pruning on term_bucket + term filter."""
        buckets = self._term_buckets(terms)
        return self.index.blocks.where(
            F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
        )

    def _score_decoded(self, decoded: DataFrame, stats: list[TermStats]) -> DataFrame:
        """Per-posting BM25 contribution (float64, JVM expressions)."""
        idf_map = F.create_map(
            *[x for s in stats for x in (F.lit(s.term), F.lit(s.idf * s.weight))]
        )
        tf, dl = F.col("tf").cast("double"), F.col("dl").cast("double")
        contrib = idf_map[F.col("term")] * tf / (
            tf + F.lit(self.k1) * (F.lit(1.0 - self.b) + F.lit(self.b) * dl / F.lit(self.avgdl))
        )
        return decoded.withColumn("contrib", contrib)

    # ------------------------------------------------------------------
    def topk(
        self,
        query_text: str,
        k: int = 10,
        mode: str = "OR",
        prune: bool = True,
    ) -> DataFrame:
        """Top-k (doc_id, score) for an analyzed free-text query.

        ``mode='AND'`` requires all distinct query terms to match
        (Boolean conjunction); ``mode='OR'`` is the disjunctive default.
        Returns columns (doc_id long, score float) ranked by
        (score desc, doc_id asc), at most k rows.
        """
        terms = self.analyze_query(query_text)
        stats = self._term_stats(terms)
        return self.topk_from_stats(
            stats, k=k, mode=mode, prune=prune, n_query_terms=len(set(terms))
        )

    def score_all(self, stats: list[TermStats], blocks: DataFrame | None = None) -> DataFrame:
        """Unlimited per-doc scores: (doc_id, score_raw double, n_terms).

        The building block for composed ranking (dismax, rerank, RRF):
        decode (optionally pre-pruned) blocks, sum per-doc contributions.
        """
        if not stats:  # no known terms → no scored docs
            return self.spark.createDataFrame(
                [], "doc_id long, score_raw double, n_terms long"
            )
        if blocks is None:
            blocks = self._blocks_for([s.term for s in stats])
        decoded = blocks.select("term", "doc_ids_enc", "tfs_enc", "dls_enc").mapInPandas(
            _decode_blocks_udf(), schema=_DECODED_SCHEMA
        )
        scored = self._score_decoded(decoded, stats)
        return scored.groupBy("doc_id").agg(
            F.sum("contrib").alias("score_raw"), F.count("*").alias("n_terms")
        )

    def topk_from_stats(
        self,
        stats: list[TermStats],
        k: int = 10,
        mode: str = "OR",
        prune: bool = True,
        n_query_terms: int | None = None,
        min_match: int = 1,
        exclude_doc: int | None = None,
    ) -> DataFrame:
        """Ranked top-k from term stats.

        ``min_match`` is the edismax ``mm`` analog (OR mode: require ≥ mm
        distinct matching terms, ``ExtendedDismaxQParser.java:144-165``);
        ``exclude_doc`` drops one doc pre-limit (the MLT seed-doc filter,
        ``MoreLikeThisComponent``).
        """
        empty = self.spark.createDataFrame([], "doc_id long, score float")
        n_required = len(stats)
        min_match = min(min_match, n_required) if n_required else min_match
        if n_query_terms is None:
            n_query_terms = n_required
        # conjunction over a term absent from the index matches nothing
        if not stats or (mode == "AND" and n_required < n_query_terms):
            return empty
        if mode == "AND" and prune and n_required > 1:
            blocks = self._and_pruned_blocks(stats, k)
        elif prune and n_required == 1 and min_match <= 1 and exclude_doc is None:
            blocks = self._single_term_pruned_blocks(stats[0], k)
        elif (
            mode == "OR" and prune and n_required > 1
            and min_match <= 1 and exclude_doc is None
        ):
            blocks = self._or_pruned_blocks(stats, k)
        else:
            blocks = self._blocks_for([s.term for s in stats])

        agg = self.score_all(stats, blocks=blocks)
        if mode == "AND":
            agg = agg.where(F.col("n_terms") == F.lit(n_required))
        elif min_match > 1:
            agg = agg.where(F.col("n_terms") >= F.lit(min_match))
        if exclude_doc is not None:
            agg = agg.where(F.col("doc_id") != F.lit(exclude_doc))
        return (
            agg.select("doc_id", F.col("score_raw").cast("float").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    # ------------------------------------------------------------------
    # rank-safe block-max pruning
    #
    # blocks store stats-INDEPENDENT metadata (max_tf, min_dl); the
    # impact upper bound idf·tf/(tf+k1(1-b+b·dl/avgdl)) is monotonic in
    # tf (up) / dl (down), so bound(max_tf, min_dl) ≥ every posting's
    # impact under the CURRENT global stats — blocks never go stale when
    # N/avgdl/idf drift between commits.
    # ------------------------------------------------------------------
    def _bound_py(self, idf: float, max_tf: int, min_dl: int) -> float:
        tf, dl = float(max_tf), float(min_dl)
        return idf * tf / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))

    def _bound_col(self, idf) -> "F.Column":
        """Column form of the block impact bound (idf: Column or float)."""
        tf = F.col("max_tf").cast("double")
        dl = F.col("min_dl").cast("double")
        idf_c = F.lit(idf) if isinstance(idf, float) else idf
        return idf_c * tf / (
            tf + F.lit(self.k1) * (F.lit(1.0 - self.b) + F.lit(self.b) * dl / F.lit(self.avgdl))
        )

    def _single_term_pruned_blocks(self, s: TermStats, k: int) -> DataFrame:
        """Two-pass threshold pruning for a single-term query.

        Pass 1: take the blocks with highest block_max covering ≥ k docs,
        score them exactly, θ = k-th best score. Pass 2: keep only blocks
        with block_max ≥ θ. Rank-safe: a block with block_max < θ cannot
        contain a doc scoring ≥ θ. Metadata collect is capped at
        ``_WAND_META_LIMIT`` rows — beyond that, exact full decode.
        """
        blocks = self._blocks_for([s.term])
        meta = (
            blocks.select("salt", "block_no", "n_docs", "max_tf", "min_dl")
            .limit(self._WAND_META_LIMIT + 1)
            .collect()
        )
        if not meta or len(meta) > self._WAND_META_LIMIT:
            return blocks
        meta = [(self._bound_py(s.idf, r["max_tf"], r["min_dl"]), r) for r in meta]
        meta.sort(key=lambda x: -x[0])
        meta = [r for _, r in meta]
        covered, seed = 0, []
        for r in meta:
            seed.append((r["salt"], r["block_no"]))
            covered += r["n_docs"]
            if covered >= k:
                break
        if covered >= k and len(seed) < len(meta):
            seed_keys = [f"{a}#{b}" for a, b in seed]
            seed_blocks = blocks.where(
                F.concat_ws("#", F.col("salt"), F.col("block_no")).isin(seed_keys)
            )
            decoded = seed_blocks.select("term", "doc_ids_enc", "tfs_enc", "dls_enc").mapInPandas(
                _decode_blocks_udf(), schema=_DECODED_SCHEMA
            )
            scored = self._score_decoded(decoded, [s])
            kth = (
                scored.select(F.col("contrib").alias("sc"))
                .orderBy(F.desc("sc"))
                .limit(k)
                .collect()
            )
            if len(kth) >= k:
                theta = kth[-1]["sc"]
                return blocks.where(self._bound_col(s.idf) >= F.lit(theta))
        return blocks

    # max #block-metadata rows we will pull to the driver before falling
    # back to exact full decode (at corpus scale the metadata itself is a
    # table; a distributed variant would select seed blocks with a window)
    _WAND_META_LIMIT = 100_000

    def _or_pruned_blocks(self, stats: list[TermStats], k: int) -> DataFrame:
        """Rank-safe Block-Max pruning for disjunctive queries (the
        candidate/threshold half of Block-Max WAND).

        1. Seed pass: decode the highest-``block_max`` blocks covering
           ≥ k docs; θ = k-th best per-doc partial sum. θ is a lower
           bound on the true k-th score (missing contributions only add),
           so pruning against it is rank-safe.
        2. Prune: block b of term t cannot put any doc into the top k if
           ``block_max(t,b) + Σ_{t'≠t} global_max(t') < θ`` — the
           term-level upper bound that makes classic WAND effective when
           a rare high-idf term dominates a hot low-impact one.
        Blocks with upper bound == θ are kept (tie-break safety).
        """
        blocks = self._blocks_for([s.term for s in stats])
        meta = (
            blocks.select("term", "salt", "block_no", "n_docs", "max_tf", "min_dl")
            .limit(self._WAND_META_LIMIT + 1)
            .collect()
        )
        if len(meta) > self._WAND_META_LIMIT or not meta:
            return blocks
        weight = {s.term: s.weight for s in stats}
        idf = {s.term: s.idf for s in stats}
        bound = {
            id(r): self._bound_py(idf[r["term"]], r["max_tf"], r["min_dl"]) for r in meta
        }
        gmax: dict[str, float] = {}
        for r in meta:
            # query-weighted upper bound (bound is computed unweighted)
            gmax[r["term"]] = max(
                gmax.get(r["term"], 0.0), bound[id(r)] * weight[r["term"]]
            )
        total_gmax = sum(gmax.values())

        ordered = sorted(meta, key=lambda r: -bound[id(r)])
        covered, seed = 0, []
        for r in ordered:
            seed.append((r["term"], r["salt"], r["block_no"]))
            covered += r["n_docs"]
            if covered >= k:
                break
        if covered < k or len(seed) == len(meta):
            return blocks
        seed_keys = [f"{t}#{a}#{b}" for t, a, b in seed]
        key_col = F.concat_ws("#", F.col("term"), F.col("salt"), F.col("block_no"))
        seed_blocks = blocks.where(key_col.isin(seed_keys))
        decoded = seed_blocks.select("term", "doc_ids_enc", "tfs_enc", "dls_enc").mapInPandas(
            _decode_blocks_udf(), schema=_DECODED_SCHEMA
        )
        kth = (
            self._score_decoded(decoded, stats)
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("partial"))
            .orderBy(F.desc("partial"))
            .limit(k)
            .collect()
        )
        if len(kth) < k:
            return blocks
        theta = kth[-1]["partial"]
        # per-term slack = Σ other terms' weighted global max; keep blocks
        # whose weighted upper bound reaches θ (== kept for tie safety)
        slack_map = F.create_map(
            *[x for t in gmax for x in (F.lit(t), F.lit(total_gmax - gmax[t]))]
        )
        widf_map = F.create_map(
            *[x for t in weight for x in (F.lit(t), F.lit(weight[t] * idf[t]))]
        )
        return blocks.where(
            self._bound_col(widf_map[F.col("term")]) + slack_map[F.col("term")]
            >= F.lit(theta)
        )

    def _and_pruned_blocks(self, stats: list[TermStats], k: int) -> DataFrame:
        """Conjunctive pruning: candidates live only in the rarest term's
        postings; other terms' blocks are skipped unless their
        [min_doc_id, max_doc_id] range overlaps a rare-term block range.
        Sound because blocks hold doc_id-sorted runs: a block whose doc-id
        range misses every candidate range cannot contain a candidate.
        """
        rare = min(stats, key=lambda s: s.df)
        others = [s for s in stats if s.term != rare.term]
        rare_blocks = self._blocks_for([rare.term])
        ranges = (
            rare_blocks.select("min_doc_id", "max_doc_id")
            .limit(self._WAND_META_LIMIT + 1)
            .collect()
        )
        if len(ranges) > self._WAND_META_LIMIT:
            # even the RAREST term has too many blocks to range-collect —
            # fall back to the exact unpruned scan of all terms
            return self._blocks_for([s.term for s in stats])
        if not ranges:
            # rare term empty → AND result empty; return empty block scan
            return rare_blocks
        # merge overlapping candidate ranges driver-side (few blocks: df_rare/128)
        ivs = sorted((r["min_doc_id"], r["max_doc_id"]) for r in ranges)
        merged = [list(ivs[0])]
        for lo, hi in ivs[1:]:
            if lo <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], hi)
            else:
                merged.append([lo, hi])
        other_blocks = self._blocks_for([s.term for s in others])
        cond = None
        for lo, hi in merged:
            c = (F.col("max_doc_id") >= F.lit(lo)) & (F.col("min_doc_id") <= F.lit(hi))
            cond = c if cond is None else (cond | c)
        if len(merged) <= 64:  # avoid giant predicates for dense ranges
            other_blocks = other_blocks.where(cond)
        return rare_blocks.unionByName(other_blocks)

    # ------------------------------------------------------------------
    def topk_with_fields(self, query_text: str, k: int = 10, mode: str = "OR") -> DataFrame:
        """Phase-2 analog: join winners back to the doc registry."""
        hits = self.topk(query_text, k=k, mode=mode)
        docs = self.index.docs
        meta = [c for c in docs.columns if c not in ("doc_id", "stored_text")]
        return (
            docs.join(F.broadcast(hits), "doc_id")
            .select("doc_id", "score", *meta)
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
