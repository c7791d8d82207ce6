"""Positional phrase queries over the posting-block index.

The reference's phrase path: quoted phrases in the ``lucene`` grammar
(``parser/SolrQueryParserBase.java:546`` → Lucene PhraseQuery over the
``.prx`` positions stream), plus the proximity-query plugins
(``SurroundQParserPlugin.java``, ``ComplexPhraseQParserPlugin.java``).

Frozen semantics (mirrored by ``oracle_sql.phrase_topk_sql``):

- position = index in the SURVIVING analyzed-token stream (no position
  gaps at removed stopwords — a documented deviation from Lucene's
  StopFilter position-increment; both engine and oracle agree).
- match: exact adjacency (slop=0) — term i of the phrase at position
  p+i for each i.
- score: Lucene PhraseQuery shape — BM25 with tf := phrase frequency
  and idf := Σ idf(term instance) (duplicate phrase terms counted each
  occurrence): ``score = idf_total · pf / (pf + k1·(1-b+b·dl/avgdl))``,
  float32-quantized, ranked (score desc, doc_id asc).

Execution (one shuffle): prune the block scan to the phrase terms,
decode postings WITH positions (Arrow UDF, segmented-varint kernel),
shuffle by doc_id into per-doc groups, verify adjacency with numpy
set-intersections inside ``applyInPandas``, score JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from solr_spark.index.codec import delta_varint_decode, positions_decode, varint_decode
from solr_spark.query.engine import SearchEngine

_DECODED_POS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("dl", T.IntegerType(), False),
        T.StructField("positions", T.ArrayType(T.LongType()), False),
    ]
)

_EMPTY_PF = pd.DataFrame(
    {
        "doc_id": pd.Series([], dtype="int64"),
        "pf": pd.Series([], dtype="int32"),
        "dl": pd.Series([], dtype="int32"),
    }
)

_PF_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("pf", T.IntegerType(), False),
        T.StructField("dl", T.IntegerType(), False),
    ]
)


def _decode_blocks_pos_udf():
    """Block decoder including the positions stream."""

    def dec(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for term, de, te, le, pe in zip(
                pdf["term"], pdf["doc_ids_enc"], pdf["tfs_enc"], pdf["dls_enc"], pdf["pos_enc"]
            ):
                doc_ids = delta_varint_decode(bytes(de)).astype(np.int64)
                tfs = varint_decode(bytes(te)).astype(np.int64)
                dls = varint_decode(bytes(le)).astype(np.int64)
                flat = positions_decode(bytes(pe), tfs).astype(np.int64)
                bounds = np.cumsum(tfs)
                start = 0
                for i, d in enumerate(doc_ids):
                    rows.append(
                        (term, int(d), int(tfs[i]), int(dls[i]), flat[start : bounds[i]].tolist())
                    )
                    start = bounds[i]
            yield pd.DataFrame(rows, columns=[f.name for f in _DECODED_POS_SCHEMA.fields])

    return dec


def phrase_topk(engine: SearchEngine, phrase: str, k: int = 10) -> DataFrame:
    """Top-k for an exact phrase (slop=0). See module docstring for the
    frozen scoring semantics."""
    if not engine.config.with_positions:
        raise ValueError("index built without positions; rebuild with with_positions=True")
    terms = engine.analyze_query(phrase)
    empty = engine.spark.createDataFrame([], "doc_id long, score float")
    if not terms:
        return empty
    uniq = sorted(set(terms))
    stats = engine._term_stats(uniq)
    if len(stats) < len(uniq):
        return empty  # a phrase term absent from the index matches nothing
    idf_by_term = {s.term: s.idf for s in stats}
    idf_total = float(sum(idf_by_term[t] for t in terms))  # per term INSTANCE

    blocks = engine._blocks_for(uniq)
    decoded = blocks.select("term", "doc_ids_enc", "tfs_enc", "dls_enc", "pos_enc").mapInPandas(
        _decode_blocks_pos_udf(), schema=_DECODED_POS_SCHEMA
    )

    n_terms = len(terms)

    def verify(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pos_by_term = {t: np.asarray(p, dtype=np.int64) for t, p in zip(pdf["term"], pdf["positions"])}
        if len(pos_by_term) < len(uniq):
            return _EMPTY_PF
        cand = pos_by_term[terms[0]]
        for i in range(1, n_terms):
            if len(cand) == 0:
                break
            cand = cand[np.isin(cand + i, pos_by_term[terms[i]])]
        pf = int(len(cand))
        if pf == 0:
            return _EMPTY_PF
        return pd.DataFrame({"doc_id": [int(key[0])], "pf": [pf], "dl": [int(pdf["dl"].iloc[0])]})

    pf_df = decoded.groupBy("doc_id").applyInPandas(verify, schema=_PF_SCHEMA)
    pf, dl = F.col("pf").cast("double"), F.col("dl").cast("double")
    score = F.lit(idf_total) * pf / (
        pf + F.lit(engine.k1) * (F.lit(1.0 - engine.b) + F.lit(engine.b) * dl / F.lit(engine.avgdl))
    )
    return (
        pf_df.select("doc_id", score.cast("float").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
