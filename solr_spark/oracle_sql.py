"""ANSI-SQL (DuckDB) oracle builders mirroring the engine's semantics.

Used by ``__spark_entry__.oracle_sql()``: for each engine query the driver
runs the Spark plan AND this SQL side-by-side and compares results. The
tokenizer fragment comes from the same AnalyzerChain the engine uses, so
both sides share one frozen definition.
"""

from __future__ import annotations

from solr_spark.analysis import CODE_CHAIN, AnalyzerChain

K1 = 1.2
B = 0.75


def bm25_topk_sql(
    terms: list[str],
    mode: str = "OR",
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    chain: AnalyzerChain = CODE_CHAIN,
) -> str:
    """Full BM25 top-k in one SQL statement (tokenize→postings→score).

    Mirrors the engine exactly: idf = ln(1+(N-df+0.5)/(df+0.5)), doc_len =
    surviving tokens, avgdl = Σdl/N (all docs), contributions in double,
    ranking on the float32-cast score with doc_id tie-break, output score
    rounded to 4 decimals (the entry wrappers round identically).
    """
    uniq = sorted(set(terms))
    term_list = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    toks = chain.duckdb_tokens_select(table, id_col, text_col)
    and_filter = f"WHERE nt = {len(uniq)}" if mode == "AND" else ""
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, tok FROM {toks} t
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM {table}) AS n_docs,
         (SELECT count(*) FROM toks) * 1.0 / (SELECT count(*) FROM {table}) AS avgdl
),
tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks
  WHERE tok IN ({term_list}) GROUP BY doc_id, tok
),
dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
scored AS (
  SELECT tf.doc_id,
         SUM( ln(1.0 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl)) ) AS score_raw,
         COUNT(*) AS nt
  FROM tf
  JOIN dfreq USING (tok)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id,
       ROUND(CAST(CAST(score_raw AS REAL) AS DOUBLE), 4) AS score
FROM scored
{and_filter}
ORDER BY CAST(score_raw AS REAL) DESC, doc_id ASC
LIMIT {k}
""".strip()


def term_dict_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    order: str = "df DESC, term ASC",
    term_filter: str = "",
    limit: int = 20,
    chain: AnalyzerChain = CODE_CHAIN,
) -> str:
    """Term dictionary (term, df, cf) — TermsComponent oracle.

    ``term_filter``: optional SQL predicate over ``tok`` (e.g. a prefix
    bound, TermsComponent.java:250-311).
    """
    toks = chain.duckdb_tokens_select(table, id_col, text_col)
    flt = f"WHERE {term_filter}" if term_filter else ""
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, tok FROM {toks} t),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks {flt} GROUP BY doc_id, tok)
SELECT tok AS term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
FROM tf
GROUP BY tok
ORDER BY {order}
LIMIT {limit}
""".strip()


# ---------------------------------------------------------------------------
# training-data pipeline oracles (dedup / similarity / textops / multimodal)
# ---------------------------------------------------------------------------

from solr_spark.functions.hashing import (  # noqa: E402
    MINHASH_MOD,
    md5_long_sql,
    minhash_perm_sql,
)


def _toks_cte(chain: AnalyzerChain, table: str = "documents", id_col: str = "doc_id",
              text_col: str = "text", where: str = "") -> str:
    w = f" WHERE {where}" if where else ""
    return (
        f"toks AS (SELECT {id_col} AS doc_id, {chain.duckdb_tokens_expr(text_col)} AS tt "
        f"FROM {table}{w})"
    )


def _shingle_cte(n: int = 3) -> str:
    """Shingle-hash CTE over ``toks`` (word n-grams, md5_long hashed)."""
    elems = ", ".join(f"tt[i+{j}]" for j in range(n))
    return (
        "sh0 AS (SELECT doc_id, unnest(list_transform("
        f"range(1, greatest(len(tt)-{n - 1}, 0)+1), i -> concat_ws(' ', {elems}))) AS s "
        "FROM toks),\n"
        f"sh AS (SELECT DISTINCT doc_id, {md5_long_sql('s')} AS h FROM sh0)"
    )


_JACCARD_CTES = """
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
verified AS (
  SELECT doc_a, doc_b,
         i * 1.0 / (sa.sz + sb.sz - i) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b)
""".strip()


def ngram_jaccard_sql(threshold: float, n: int = 3, chain: AnalyzerChain = CODE_CHAIN) -> str:
    return f"""
WITH {_toks_cte(chain)},
{_shingle_cte(n)},
{_JACCARD_CTES}
SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard
FROM verified WHERE jaccard >= {threshold}
ORDER BY doc_a, doc_b
""".strip()


def minhash_lsh_sql(
    threshold: float,
    n_hashes: int = 32,
    n_bands: int = 16,
    n: int = 3,
    chain: AnalyzerChain = CODE_CHAIN,
) -> str:
    """The full MinHash→bands→candidates→exact-verify pipeline in SQL —
    the oracle mirrors the ENGINE's defined semantics (banded LSH recall),
    not the exact-Jaccard superset."""
    r = n_hashes // n_bands
    mins = ", ".join(
        f"min({minhash_perm_sql('h', i)}) AS m{i}" for i in range(n_hashes)
    )
    band_selects = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band_no, concat_ws(':', "
        + ", ".join(f"m{b * r + j}" for j in range(r))
        + ") AS band_key FROM mins"
        for b in range(n_bands)
    )
    return f"""
WITH {_toks_cte(chain)},
{_shingle_cte(n)},
mins AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS ({band_selects}),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_no = b.band_no AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
{_JACCARD_CTES}
SELECT v.doc_a, v.doc_b, ROUND(v.jaccard, 6) AS jaccard
FROM verified v JOIN cands c ON v.doc_a = c.doc_a AND v.doc_b = c.doc_b
WHERE v.jaccard >= {threshold}
ORDER BY v.doc_a, v.doc_b
""".strip()


def exact_dedup_sql(clone_below: int, offset: int) -> str:
    """Union documents with re-keyed clones (doc_id < clone_below, shifted
    by offset) and report duplicate groups."""
    return f"""
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {offset} AS doc_id, text FROM documents WHERE doc_id < {clone_below})
SELECT sha256(text) AS content_sha256, count(*) AS n_dups, min(doc_id) AS canonical_id
FROM u GROUP BY 1 HAVING count(*) > 1
ORDER BY canonical_id
""".strip()


def simhash_cte(chain: AnalyzerChain = CODE_CHAIN, bits: int = 60) -> str:
    return f"""
{_toks_cte(chain)},
tfv AS (SELECT doc_id, tok, count(*) AS tf
        FROM (SELECT doc_id, unnest(tt) AS tok FROM toks) GROUP BY 1, 2),
th AS (SELECT doc_id, tf, {md5_long_sql('tok')} AS h FROM tfv),
wj AS (
  SELECT doc_id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN tf ELSE -tf END) AS wj
  FROM th, (SELECT unnest(range(0, {bits})) AS j)
  GROUP BY 1, 2),
sim AS (
  SELECT doc_id,
         sum(CASE WHEN wj > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END) AS simhash
  FROM wj GROUP BY doc_id)
""".strip()


def simhash_pairs_sql(max_hamming: int, chain: AnalyzerChain = CODE_CHAIN) -> str:
    """Brute-force pairwise oracle — equals the engine's pigeonhole-band
    join because that banding is lossless within the radius."""
    return f"""
WITH {simhash_cte(chain)}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
ORDER BY doc_a, doc_b
""".strip()


_COS = (
    "list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)


def embedding_neardup_sql(threshold: float) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({_COS}, 4) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {_COS} >= {threshold}
ORDER BY id_a, id_b
""".strip()


def ann_topk_sql(query_id: int, k: int = 10) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_id})
SELECT e.vec_id AS id,
       ROUND(list_dot_product(e.v, q.qv) /
             (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
FROM e, q
ORDER BY list_dot_product(e.v, q.qv) /
         (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
         e.vec_id ASC
LIMIT {k}
""".strip()
