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
