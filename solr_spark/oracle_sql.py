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
    having: str = "",
) -> str:
    """Term dictionary (term, df, cf) — TermsComponent oracle.

    ``term_filter``: optional SQL predicate over ``tok`` (e.g. a prefix
    bound, TermsComponent.java:250-311). ``having``: optional predicate
    over the aggregated ``df``/``cf`` (terms.mincount/maxcount analog,
    TermsComponent.java:316-318).
    """
    toks = chain.duckdb_tokens_select(table, id_col, text_col)
    flt = f"WHERE {term_filter}" if term_filter else ""
    hv = f"HAVING {having}" if having else ""
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, tok FROM {toks} t),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks {flt} GROUP BY doc_id, tok)
SELECT tok AS term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
FROM tf
GROUP BY tok
{hv}
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


def filter_pack_sql(chain: AnalyzerChain = CODE_CHAIN,
                    where: str = "doc_id < 30") -> str:
    """Oracle for the analysis filter pack: every filter's DuckDB twin
    unnested with positions (same pack spec as the Spark side)."""
    from solr_spark.analysis import filters as flt

    tt = chain.duckdb_tokens_expr("text")
    selects = []
    for name, expr in flt.pack_sql_exprs(tt):
        selects.append(
            f"SELECT CAST(doc_id AS BIGINT) AS doc_id, '{name}' AS filter, "
            f"CAST(generate_subscripts({expr}, 1) - 1 AS INT) AS pos, "
            f"unnest({expr}) AS token "
            f"FROM documents WHERE {where}"
        )
    return " UNION ALL ".join(selects) + " ORDER BY doc_id, filter, pos"


def dedup_clusters_sql(threshold: float, n: int = 3,
                       chain: AnalyzerChain = CODE_CHAIN) -> str:
    """Connected components over the exact n-gram-Jaccard pair relation
    (recursive CTE = the ground truth for the engine's distributed
    min-label propagation), plus per-cluster canonical pick."""
    return f"""
WITH RECURSIVE {_toks_cte(chain)},
{_shingle_cte(n)},
{_JACCARD_CTES},
pairs AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= {threshold}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node),
comp AS (SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node),
ranked AS (
  SELECT c.cluster_id, c.node AS doc_id,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, c.node ASC) AS rn
  FROM comp c JOIN documents d ON d.doc_id = c.node)
SELECT cluster_id, CAST(count(*) AS BIGINT) AS size,
       min(CASE WHEN rn = 1 THEN doc_id END) AS canonical_id
FROM ranked GROUP BY cluster_id ORDER BY cluster_id
""".strip()


def decontaminate_sql(bench_pred: str, corpus_pred: str, n: int = 4,
                      chain: AnalyzerChain = CODE_CHAIN) -> str:
    """Benchmark-contamination oracle: corpus docs sharing any n-token
    shingle with the benchmark slice, with distinct-shingle counts."""
    elems = ", ".join(f"tt[i+{j}]" for j in range(n))
    return f"""
WITH {_toks_cte(chain)},
shs AS (SELECT DISTINCT doc_id, unnest(list_transform(
          range(1, greatest(len(tt)-{n - 1}, 0)+1),
          i -> concat_ws(' ', {elems}))) AS s FROM toks),
bench AS (SELECT DISTINCT s FROM shs WHERE {bench_pred}),
hits AS (SELECT shs.doc_id, shs.s FROM shs JOIN bench USING (s)
         WHERE {corpus_pred})
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
FROM hits GROUP BY doc_id ORDER BY doc_id
""".strip()


def stratified_sample_sql(strata_col: str, key: str, n_per: int,
                          cols: str, table: str = "documents") -> str:
    from solr_spark.functions.hashing import md5_long_sql
    h = md5_long_sql(f"CAST({key} AS VARCHAR)")
    return f"""
WITH ranked AS (
  SELECT {cols},
         row_number() OVER (PARTITION BY {strata_col}
                            ORDER BY ({h}) ASC, {key} ASC) AS rn
  FROM {table})
SELECT {cols} FROM ranked WHERE rn <= {n_per} ORDER BY {strata_col}, {key}
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


def highlight_passages_sql(
    chain: AnalyzerChain, terms: list[str], doc_limit: int,
    passage_words: int = 10, n_passages: int = 2,
) -> str:
    """Oracle for the passage-RANKED highlighter: same frozen break
    (fixed W-word windows over the whitespace split) and PassageScorer
    form (Σ idf_t · tf_t, idf from the full-corpus chain tokens)."""
    W = passage_words
    score = " + ".join(
        f"(SELECT idf FROM idf WHERE t = '{t}') * "
        f"len(list_filter(pw, x -> lower(x) = '{t}'))"
        for t in terms
    )
    idf_rows = " UNION ALL ".join(
        f"SELECT '{t}' AS t, ln(1.0 + (s.n_docs - "
        f"(SELECT count(DISTINCT doc_id) FROM toks WHERE tok = '{t}') + 0.5) / "
        f"((SELECT count(DISTINCT doc_id) FROM toks WHERE tok = '{t}') + 0.5)) AS idf "
        f"FROM stats s"
        for t in terms
    )
    return f"""
WITH {_prelude(chain)},
idf AS ({idf_rows}),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE doc_id < {doc_limit}),
p AS (SELECT doc_id, CAST(t.i AS INT) AS p_no,
             list_slice(ws, t.i * {W} + 1, t.i * {W} + {W}) AS pw
      FROM w, UNNEST(range(0, CASE WHEN len(ws) = 0 THEN 0
                                   ELSE CAST(floor((len(ws) - 1) / {W}) AS INT) + 1 END)) AS t(i)),
sc AS (SELECT doc_id, p_no, pw, ({score}) AS score FROM p),
rk AS (SELECT doc_id, p_no, pw, score,
              row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, p_no ASC) AS rank
       FROM sc WHERE score > 0)
SELECT doc_id, p_no, array_to_string(pw, ' ') AS passage,
       CAST(ROUND(score, 4) AS REAL) AS score
FROM rk WHERE rank <= {n_passages}
ORDER BY doc_id, p_no
""".strip()


def _payload_tp_cte(chain: AnalyzerChain) -> str:
    """(doc_id, tok, pos, pay) rows with the frozen payload function
    (len(token) + position) mod 8 — mirrors IndexConfig.with_payloads."""
    arr = chain.duckdb_tokens_expr("text")
    return f"""tp AS (
  SELECT doc_id, u.tok AS tok, (length(u.tok) + u.pos) % 8 AS pay FROM (
    SELECT doc_id, unnest(list_transform({arr}, (t, i) -> {{'tok': t, 'pos': i - 1}})) AS u
    FROM documents))"""


def payload_score_sql(chain: AnalyzerChain, term: str, func: str, k: int = 10) -> str:
    """Oracle for payload_score (PayloadScoreQParserPlugin.java)."""
    agg = {
        "sum": "sum(pay)",
        "max": "max(pay)",
        "min": "min(pay)",
        "avg": "sum(pay) * 1.0 / count(*)",
    }[func]
    return f"""
WITH {_payload_tp_cte(chain)}
SELECT doc_id, CAST({agg} AS DOUBLE) AS score
FROM tp WHERE tok = '{term}'
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
""".strip()


def payload_check_sql(chain: AnalyzerChain, term: str, payload: int, k: int = 10) -> str:
    """Oracle for payload_check (PayloadCheckQParserPlugin.java)."""
    return f"""
WITH {_payload_tp_cte(chain)}
SELECT doc_id, count(*) AS n_hits
FROM tp WHERE tok = '{term}' AND pay = {payload}
GROUP BY doc_id
ORDER BY n_hits DESC, doc_id ASC
LIMIT {k}
""".strip()


def _arr_lit(vec) -> str:
    """DuckDB DOUBLE[] literal that round-trips Python float64 exactly."""
    return "[" + ", ".join(repr(float(x)) for x in vec) + "]"


def embedding_lsh_sql(threshold: float, max_hamming: int = 1) -> str:
    """Oracle for the SCALE-path embedding near-dup entry: the same
    hyperplane-sign LSH banding as dedup.embedding_lsh_pairs (pigeonhole
    bands over the sign signature → candidate pairs → exact cosine on
    candidates only), reproduced in SQL with the frozen plane literals."""
    from solr_spark.dedup import EMB_PLANES

    n_planes = len(EMB_PLANES)
    sig_terms = " + ".join(
        f"CASE WHEN list_dot_product(v, {_arr_lit(p)}) > 0 THEN {1 << i} ELSE 0 END"
        for i, p in enumerate(EMB_PLANES)
    )
    k = max_hamming + 1
    width = n_planes // k
    band_selects = []
    for bnd in range(k):
        lo = bnd * width
        w = n_planes - lo if bnd == k - 1 else width
        band_selects.append(
            f"SELECT vec_id, {bnd} AS band_no, "
            f"(simhash // {1 << lo}) % {1 << w} AS band_bits FROM sig"
        )
    bands = " UNION ALL ".join(band_selects)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (SELECT vec_id, ({sig_terms}) AS simhash FROM e),
ex AS ({bands}),
cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         FROM ex x JOIN ex y
           ON x.band_no = y.band_no AND x.band_bits = y.band_bits
          AND x.vec_id < y.vec_id),
pair AS (SELECT c.id_a, c.id_b, {_COS} AS cosine
         FROM cand c JOIN e a ON a.vec_id = c.id_a JOIN e b ON b.vec_id = c.id_b)
SELECT id_a, id_b, ROUND(cosine, 4) AS cosine
FROM pair WHERE cosine >= {threshold}
ORDER BY id_a, id_b
""".strip()


def ann_ivf_sql(query_id: int, k: int = 10, n_probe: int = 4) -> str:
    """Oracle for the frozen-codebook IVF entry: identical assignment
    (argmax of dot − ‖c‖²/2, first-index tie-break) and probe selection
    (top n_probe lists by query score, list_no asc tie-break)."""
    from solr_spark.similarity import IVF_FROZEN_CENTROIDS as C

    score_exprs = [
        f"list_dot_product({{v}}, {_arr_lit(c)}) - {repr(float(0.5 * (c * c).sum()))}"
        for c in C
    ]
    vec_scores = "[" + ", ".join(s.format(v="v") for s in score_exprs) + "]"
    probe_rows = " UNION ALL ".join(
        f"SELECT {i} AS list_no, {s.format(v='qv')} AS s FROM q"
        for i, s in enumerate(score_exprs)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_id}),
asn AS (SELECT vec_id, v,
        list_indexof({vec_scores}, list_aggregate({vec_scores}, 'max')) - 1 AS list_id
        FROM e),
probes AS (SELECT list_no FROM ({probe_rows}) ORDER BY s DESC, list_no ASC LIMIT {n_probe})
SELECT asn.vec_id AS id,
       ROUND(list_dot_product(asn.v, q.qv) /
             (sqrt(list_dot_product(asn.v, asn.v)) * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
FROM asn, q
WHERE asn.list_id IN (SELECT list_no FROM probes)
ORDER BY list_dot_product(asn.v, q.qv) /
         (sqrt(list_dot_product(asn.v, asn.v)) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
         asn.vec_id ASC
LIMIT {k}
""".strip()


def vector_similarity_sql(query_id: int, threshold: float) -> str:
    """Oracle for the vectorSimilarity threshold surface: all vectors
    with cosine ≥ threshold, ranked (cosine desc, id asc)."""
    cos = (
        "list_dot_product(e.v, q.qv) / "
        "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))"
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_id})
SELECT e.vec_id AS id, ROUND({cos}, 4) AS cosine
FROM e, q
WHERE {cos} >= {threshold}
ORDER BY {cos} DESC, e.vec_id ASC
""".strip()


def quantized_topk_sql(query_id: int, k: int = 10, bits: int = 8) -> str:
    """Oracle for the int8-quantized cosine top-k: the same per-vector
    symmetric quantization (scale = max|x|/qmax, half-up floor rounding)
    applied in SQL, then exact cosine over the reconstruction."""
    qmax = float(2 ** (bits - 1) - 1)
    cos = ("list_dot_product(dv, qv) / "
           "(sqrt(list_dot_product(dv, dv)) * sqrt(list_dot_product(qv, qv)))")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
am AS (SELECT vec_id, v,
              list_max(list_transform(v, x -> abs(x))) AS absmax FROM e),
qz AS (SELECT vec_id, v,
              CASE WHEN absmax > 0 THEN absmax / {qmax} ELSE 1.0 END AS scale
       FROM am),
dq AS (SELECT vec_id,
              list_transform(v, x -> floor(x / scale + 0.5) * scale) AS dv
       FROM qz),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_id})
SELECT dq.vec_id AS id, ROUND({cos}, 4) AS cosine
FROM dq, q
ORDER BY {cos} DESC, dq.vec_id ASC
LIMIT {k}
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


# ---------------------------------------------------------------------------
# composed query-operator oracles (prefix/fuzzy/MLT/rerank/dismax/RRF/...)
# ---------------------------------------------------------------------------


def _prelude(chain: AnalyzerChain = CODE_CHAIN, table: str = "documents",
             id_col: str = "doc_id", text_col: str = "text", p: str = "") -> str:
    """Shared CTEs (token explode, doc lengths, corpus stats), with an
    optional name prefix ``p`` so two preludes can coexist (dismax)."""
    toks = chain.duckdb_tokens_select(table, id_col, text_col)
    return f"""{p}toks AS (SELECT {id_col} AS doc_id, tok FROM {toks} t),
{p}dl AS (SELECT doc_id, count(*) AS dl FROM {p}toks GROUP BY doc_id),
{p}stats AS (SELECT (SELECT count(*) FROM {table}) AS n_docs,
  (SELECT count(*) FROM {p}toks) * 1.0 / (SELECT count(*) FROM {table}) AS avgdl)"""


def _scored(name: str, term_src: str, p: str = "") -> str:
    """BM25-scored CTE (doc_id, score_raw, nt) for terms from
    ``term_src`` (an IN-list ``('a','b')`` or ``(SELECT tok FROM exp)``)."""
    return f"""{name}_tf AS (SELECT doc_id, tok, count(*) AS tf FROM {p}toks
  WHERE tok IN {term_src} GROUP BY 1, 2),
{name}_df AS (SELECT tok, count(*) AS df FROM {name}_tf GROUP BY tok),
{name} AS (
  SELECT t.doc_id,
         SUM( ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf / (t.tf + {K1} * (1.0 - {B} + {B} * l.dl / s.avgdl)) ) AS score_raw,
         COUNT(*) AS nt
  FROM {name}_tf t JOIN {name}_df d USING (tok)
  JOIN {p}dl l USING (doc_id) CROSS JOIN {p}stats s
  GROUP BY t.doc_id)"""


def _inlist(terms: list[str]) -> str:
    return "(" + ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(terms))) + ")"


def bm25_topk_numfound_sql(
    terms: list[str],
    mode: str = "OR",
    k: int = 10,
    chain: AnalyzerChain = CODE_CHAIN,
) -> str:
    """bm25_topk_sql + Solr's response hit count: every row carries
    num_found (exact matching-doc count) and num_found_exact=TRUE —
    the minExactCount=unset contract (QueryComponent.java:448)."""
    uniq = sorted(set(terms))
    term_list = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    toks = chain.duckdb_tokens_select("documents", "doc_id", "text")
    and_filter = f"WHERE nt = {len(uniq)}" if mode == "AND" else ""
    return f"""
WITH toks AS (
  SELECT doc_id AS doc_id, tok FROM {toks} t
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT count(*) FROM toks) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
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
       ROUND(CAST(CAST(score_raw AS REAL) AS DOUBLE), 4) AS score,
       (SELECT CAST(count(*) AS BIGINT) FROM scored {and_filter}) AS num_found,
       TRUE AS num_found_exact
FROM scored
{and_filter}
ORDER BY CAST(score_raw AS REAL) DESC, doc_id ASC
LIMIT {k}
""".strip()


_RANKED = """SELECT doc_id, ROUND(CAST(CAST(score_raw AS REAL) AS DOUBLE), 4) AS score
FROM {src} {flt}
ORDER BY CAST(score_raw AS REAL) DESC, doc_id ASC
LIMIT {k}"""


def bm25_mm_sql(terms: list[str], mm: int, k: int = 10,
                chain: AnalyzerChain = CODE_CHAIN) -> str:
    """edismax min-should-match: OR with ≥ mm distinct matching terms."""
    return (
        f"WITH {_prelude(chain)},\n{_scored('sc', _inlist(terms))}\n"
        + _RANKED.format(src="sc", flt=f"WHERE nt >= {mm}", k=k)
    )


def boosted_bool_sql(
    weights: dict[str, float],
    must_any: list[list[str]] | None = None,
    not_terms: list[str] | None = None,
    range_pred: str | None = None,
    k: int = 10,
    chain: AnalyzerChain = CODE_CHAIN,
) -> str:
    """Boolean query oracle with per-term boosts (lucene ``term^2`` /
    parenthesized nesting / metadata range).

    ``weights``: analyzed term → boost (score = Σ boost·idf·bm25_tf over
    matching terms). ``must_any``: conjunction of groups, each group
    satisfied by ≥1 contained term (``(a OR b) AND c`` ⇒
    ``[['a','b'], ['c']]``). ``not_terms``: prohibited. ``range_pred``:
    extra SQL predicate over the ``documents`` row (fq analog).
    """
    inlist = _inlist(list(weights))
    vals = ", ".join(
        f"('{t.replace(chr(39), chr(39) * 2)}', {float(w)!r})" for t, w in sorted(weights.items())
    )
    conds = []
    for group in must_any or []:
        conds.append(f"sc.doc_id IN (SELECT doc_id FROM sc_tf WHERE tok IN {_inlist(group)})")
    for t in not_terms or []:
        esc = t.replace("'", "''")
        conds.append(
            f"sc.doc_id NOT IN (SELECT DISTINCT doc_id FROM toks WHERE tok = '{esc}')"
        )
    if range_pred:
        conds.append(f"sc.doc_id IN (SELECT doc_id FROM documents WHERE {range_pred})")
    where = ("WHERE " + "\n  AND ".join(conds)) if conds else ""
    return f"""WITH {_prelude(chain)},
w(tok, wt) AS (VALUES {vals}),
sc_tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
  WHERE tok IN {inlist} GROUP BY 1, 2),
sc_df AS (SELECT tok, count(*) AS df FROM sc_tf GROUP BY tok),
sc AS (
  SELECT t.doc_id,
         SUM( w.wt * ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf / (t.tf + {K1} * (1.0 - {B} + {B} * l.dl / s.avgdl)) ) AS score_raw
  FROM sc_tf t JOIN sc_df d USING (tok) JOIN w USING (tok)
  JOIN dl l USING (doc_id) CROSS JOIN stats s
  GROUP BY t.doc_id)
SELECT sc.doc_id, ROUND(CAST(CAST(score_raw AS REAL) AS DOUBLE), 4) AS score
FROM sc
{where}
ORDER BY CAST(score_raw AS REAL) DESC, sc.doc_id ASC
LIMIT {k}"""


def expansion_topk_sql(pred: str, cap: int = 50, k: int = 10,
                       chain: AnalyzerChain = CODE_CHAIN) -> str:
    """Prefix/fuzzy rewrite: top ``cap`` matching terms by (df desc, term
    asc), scored as an OR. ``pred`` is a SQL predicate over ``tok``/df."""
    return f"""WITH {_prelude(chain)},
alldf AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
exp AS (SELECT tok FROM alldf WHERE {pred} ORDER BY df DESC, tok ASC LIMIT {cap}),
{_scored('sc', '(SELECT tok FROM exp)')}
""" + _RANKED.format(src="sc", flt="", k=k)


def prefix_topk_sql(prefix: str, cap: int = 50, k: int = 10) -> str:
    esc = prefix.replace("'", "''")
    return expansion_topk_sql(f"tok LIKE '{esc}%'", cap, k)


def fuzzy_topk_sql(word: str, max_edits: int = 2, cap: int = 50, k: int = 10) -> str:
    esc = word.replace("'", "''")
    return expansion_topk_sql(
        f"abs(length(tok) - {len(word)}) <= {max_edits} "
        f"AND levenshtein(tok, '{esc}') <= {max_edits}",
        cap, k,
    )


def mlt_topk_sql(seed_doc_id: int, max_terms: int = 10, k: int = 10,
                 chain: AnalyzerChain = CODE_CHAIN) -> str:
    return f"""WITH {_prelude(chain)},
alldf AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
seedtf AS (SELECT tok, count(*) AS tf FROM toks WHERE doc_id = {seed_doc_id} GROUP BY tok),
seedterms AS (
  SELECT st.tok FROM seedtf st JOIN alldf a USING (tok) CROSS JOIN stats s
  ORDER BY st.tf * ln(1.0 + (s.n_docs - a.df + 0.5) / (a.df + 0.5)) DESC, st.tok ASC
  LIMIT {max_terms}),
{_scored('sc', '(SELECT tok FROM seedterms)')}
""" + _RANKED.format(src="sc", flt=f"WHERE doc_id <> {seed_doc_id}", k=k)


def rerank_sql(terms1: list[str], terms2: list[str], k: int = 10,
               rerank_docs: int = 50, weight: float = 2.0,
               chain: AnalyzerChain = CODE_CHAIN) -> str:
    return f"""WITH {_prelude(chain)},
{_scored('s1', _inlist(terms1))},
{_scored('s2', _inlist(terms2))},
first AS (
  SELECT doc_id, CAST(score_raw AS REAL) AS sa FROM s1
  ORDER BY CAST(score_raw AS REAL) DESC, doc_id ASC LIMIT {rerank_docs}),
comb AS (
  SELECT f.doc_id,
         CAST(CAST(f.sa AS DOUBLE)
              + {weight} * COALESCE(CAST(CAST(s2.score_raw AS REAL) AS DOUBLE), 0.0)
              AS REAL) AS sc
  FROM first f LEFT JOIN s2 ON f.doc_id = s2.doc_id)
SELECT doc_id, ROUND(CAST(sc AS DOUBLE), 4) AS score
FROM comb ORDER BY sc DESC, doc_id ASC LIMIT {k}"""


def boost_recip_nchars_sql(terms: list[str], k: int = 10,
                           chain: AnalyzerChain = CODE_CHAIN) -> str:
    """Boost query: score × recip(n_chars, 0.001, 1, 1)."""
    boosted = ("CAST(CAST(CAST(score_raw AS REAL) AS DOUBLE)"
               " * (1.0 / (1.0 + 0.001 * n_chars)) AS REAL)")
    return f"""WITH {_prelude(chain)},
{_scored('sc', _inlist(terms))}
SELECT sc.doc_id, ROUND(CAST({boosted} AS DOUBLE), 4) AS score
FROM sc JOIN documents USING (doc_id)
ORDER BY {boosted} DESC, sc.doc_id ASC LIMIT {k}"""


def boost_expr_sql(terms: list[str], boost_expr: str, k: int = 10,
                   chain: AnalyzerChain = CODE_CHAIN) -> str:
    """Boost query oracle with an arbitrary SQL boost expression over the
    joined ``documents`` row (ExternalFileField-style function boosts):
    score = f32(f32(bm25) * boost_expr)."""
    boosted = (f"CAST(CAST(CAST(score_raw AS REAL) AS DOUBLE)"
               f" * ({boost_expr}) AS REAL)")
    return f"""WITH {_prelude(chain)},
{_scored('sc', _inlist(terms))}
SELECT sc.doc_id, ROUND(CAST({boosted} AS DOUBLE), 4) AS score
FROM sc JOIN documents USING (doc_id)
ORDER BY {boosted} DESC, sc.doc_id ASC LIMIT {k}"""


def rank_boost_log_sql(terms: list[str], weight: float, scaling: float,
                       k: int = 10, chain: AnalyzerChain = CODE_CHAIN) -> str:
    """{!rank function=log} combined additively with BM25 (rank_boost_topk
    oracle): f32(f32(bm25) + f32(w*ln(scaling+n_chars)))."""
    comb = (f"CAST(CAST(CAST(score_raw AS REAL) AS DOUBLE)"
            f" + CAST(CAST({weight} * ln({scaling} + n_chars) AS REAL) AS DOUBLE)"
            f" AS REAL)")
    return f"""WITH {_prelude(chain)},
{_scored('sc', _inlist(terms))}
SELECT sc.doc_id, ROUND(CAST({comb} AS DOUBLE), 4) AS score
FROM sc JOIN documents USING (doc_id)
ORDER BY {comb} DESC, sc.doc_id ASC LIMIT {k}"""


def near_topk_sql(
    words: list[str], window: int, k: int = 10, chain: AnalyzerChain = CODE_CHAIN
) -> str:
    """Unordered-near oracle: pf = DISTINCT anchors (any term occurrence)
    whose [p, p+window] contains every term (mirrors _make_near_verify)."""
    terms = [t for w in words for t in chain.tokenize_py(w)]
    uniq = sorted(set(terms))
    esc = [t.replace("'", "''") for t in uniq]
    all_list = ", ".join(f"'{t}'" for t in esc)
    joins = "\n".join(
        f"  JOIN pos q{i} ON q{i}.doc_id = p0.doc_id AND q{i}.tok = '{t}' "
        f"AND q{i}.pos BETWEEN p0.pos AND p0.pos + {window}"
        for i, t in enumerate(esc)
    )
    idf_parts = " + ".join(
        f"ln(1.0 + (s.n_docs - (SELECT count(DISTINCT doc_id) FROM toks WHERE tok = '{t.replace(chr(39), chr(39)*2)}') + 0.5)"
        f" / ((SELECT count(DISTINCT doc_id) FROM toks WHERE tok = '{t.replace(chr(39), chr(39)*2)}') + 0.5))"
        for t in terms
    )
    return f"""WITH {_prelude(chain)},
pos AS (
  SELECT doc_id, unnest(tt) AS tok, generate_subscripts(tt, 1) AS pos
  FROM (SELECT doc_id, {chain.duckdb_tokens_expr('text')} AS tt FROM documents)),
pf AS (
  SELECT p0.doc_id, count(DISTINCT p0.pos) AS pf
  FROM pos p0
{joins}
  WHERE p0.tok IN ({all_list})
  GROUP BY p0.doc_id)
SELECT pf.doc_id,
       ROUND(CAST(CAST(({idf_parts})
             * pf.pf / (pf.pf + {K1} * (1.0 - {B} + {B} * l.dl / s.avgdl)) AS REAL) AS DOUBLE), 4) AS score
FROM pf JOIN dl l USING (doc_id) CROSS JOIN stats s
ORDER BY CAST(({idf_parts}) * pf.pf / (pf.pf + {K1} * (1.0 - {B} + {B} * l.dl / s.avgdl)) AS REAL) DESC,
         pf.doc_id ASC
LIMIT {k}"""


def complex_phrase_sql(
    words: list[str], slop: int = 0, k: int = 10, chain: AnalyzerChain = CODE_CHAIN,
    max_expansions: int = 50,
) -> str:
    """ComplexPhrase oracle: phrase positions where a trailing-* word
    matches ANY dictionary term with that prefix; pf = DISTINCT chain
    starts; idf_i computed from the docs containing ANY matching term of
    position i (mirrors complex_phrase_pf exactly — including the
    MultiTermQuery rewrite cap: each wildcard position expands to the
    top ``max_expansions`` dictionary terms by (df desc, term asc), the
    same cap the engine applies, for BOTH chain matching and idf_i)."""
    prefix_ctes: list[str] = []

    def exp_cte(i: int, w: str) -> str:
        """Register a capped-expansion CTE for wildcard position i."""
        esc = w[:-1].lower().replace("'", "''")
        prefix_ctes.append(
            f"exp{i} AS (SELECT tok FROM ("
            f"SELECT tok, count(DISTINCT doc_id) AS df FROM toks "
            f"WHERE tok LIKE '{esc}%' GROUP BY tok "
            f"ORDER BY df DESC, tok ASC LIMIT {max_expansions}))"
        )
        return f"exp{i}"

    cte_by_pos: dict[int, str] = {}

    def cond(alias: str, i: int, w: str) -> str:
        if w.endswith("*") and "*" not in w[:-1]:
            if i not in cte_by_pos:
                cte_by_pos[i] = exp_cte(i, w)
            return f"{alias}.tok IN (SELECT tok FROM {cte_by_pos[i]})"
        toks = chain.tokenize_py(w)
        esc = (toks[0] if toks else w.lower()).replace("'", "''")
        return f"{alias}.tok = '{esc}'"

    def df_sub(i: int, w: str) -> str:
        if w.endswith("*") and "*" not in w[:-1]:
            if i not in cte_by_pos:
                cte_by_pos[i] = exp_cte(i, w)
            return (
                f"(SELECT count(DISTINCT doc_id) FROM toks "
                f"WHERE tok IN (SELECT tok FROM {cte_by_pos[i]}))"
            )
        toks = chain.tokenize_py(w)
        esc = (toks[0] if toks else w.lower()).replace("'", "''")
        return f"(SELECT count(DISTINCT doc_id) FROM toks WHERE tok = '{esc}')"

    n = len(words)
    joins = "\n".join(
        f"  JOIN pos p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.pos > p{i - 1}.pos "
        f"AND p{i}.pos <= p0.pos + {i + slop} AND {cond(f'p{i}', i, words[i])}"
        for i in range(1, n)
    )
    idf_parts = " + ".join(
        f"ln(1.0 + (s.n_docs - {df_sub(i, w)} + 0.5) / ({df_sub(i, w)} + 0.5))"
        for i, w in enumerate(words)
    )
    head_cond = cond("p0", 0, words[0])
    exp_ctes = ("," + ",\n".join(prefix_ctes)) if prefix_ctes else ""
    return f"""WITH {_prelude(chain)},
pos AS (
  SELECT doc_id, unnest(tt) AS tok, generate_subscripts(tt, 1) AS pos
  FROM (SELECT doc_id, {chain.duckdb_tokens_expr('text')} AS tt FROM documents)){exp_ctes},
pf AS (
  SELECT p0.doc_id, count(DISTINCT p0.pos) AS pf
  FROM pos p0
{joins}
  WHERE {head_cond}
  GROUP BY p0.doc_id)
SELECT pf.doc_id,
       ROUND(CAST(CAST(({idf_parts})
             * pf.pf / (pf.pf + {K1} * (1.0 - {B} + {B} * l.dl / s.avgdl)) AS REAL) AS DOUBLE), 4) AS score
FROM pf JOIN dl l USING (doc_id) CROSS JOIN stats s
ORDER BY CAST(({idf_parts}) * pf.pf / (pf.pf + {K1} * (1.0 - {B} + {B} * l.dl / s.avgdl)) AS REAL) DESC,
         pf.doc_id ASC
LIMIT {k}"""


def edismax_pf_sql(
    terms: list[str],
    phrase: str,
    pf_weight: float = 2.0,
    k: int = 10,
    chain: AnalyzerChain = CODE_CHAIN,
) -> str:
    """Single-field edismax with phrase (pf) boost: score =
    f32(bm25_OR) + pf_weight·f32(phrase score), f32-requantized for
    ranking (ExtendedDismaxQParser.java:93 pf handling)."""
    ph_terms = chain.tokenize_py(phrase)
    esc = [t.replace("'", "''") for t in ph_terms]
    joins = "\n".join(
        f"  JOIN pos p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.pos > p{i - 1}.pos "
        f"AND p{i}.pos <= p0.pos + {i} AND p{i}.tok = '{esc[i]}'"
        for i in range(1, len(ph_terms))
    )
    idf_parts = " + ".join(
        f"ln(1.0 + (s.n_docs - (SELECT count(DISTINCT doc_id) FROM toks WHERE tok = '{t}') + 0.5)"
        f" / ((SELECT count(DISTINCT doc_id) FROM toks WHERE tok = '{t}') + 0.5))"
        for t in esc
    )
    return f"""WITH {_prelude(chain)},
{_scored('sc', _inlist(terms))},
pos AS (
  SELECT doc_id, unnest(tt) AS tok, generate_subscripts(tt, 1) AS pos
  FROM (SELECT doc_id, {chain.duckdb_tokens_expr('text')} AS tt FROM documents)),
ppf AS (
  SELECT p0.doc_id, count(DISTINCT p0.pos) AS pf
  FROM pos p0
{joins}
  WHERE p0.tok = '{esc[0]}'
  GROUP BY p0.doc_id),
comb AS (
  SELECT sc.doc_id,
         CAST(CAST(sc.score_raw AS REAL) AS DOUBLE)
         + {pf_weight} * COALESCE(CAST(CAST(({idf_parts})
             * ppf.pf / (ppf.pf + {K1} * (1.0 - {B} + {B} * l.dl / s.avgdl)) AS REAL) AS DOUBLE), 0.0)
           AS raw
  FROM sc LEFT JOIN ppf USING (doc_id)
  JOIN dl l USING (doc_id) CROSS JOIN stats s)
SELECT doc_id, ROUND(CAST(CAST(raw AS REAL) AS DOUBLE), 4) AS score
FROM comb ORDER BY CAST(raw AS REAL) DESC, doc_id ASC LIMIT {k}"""


def edismax_full_sql(
    terms_text: list[str],
    terms_src: list[str],
    qf_text: float = 1.0,
    qf_src: float = 0.5,
    tie: float = 0.1,
    bq_terms: list[str] | None = None,
    bq_weight: float = 0.5,
    k: int = 10,
    chain: AnalyzerChain = CODE_CHAIN,
) -> str:
    """Two-field edismax with per-field qf weights, tie, additive boost
    query (bq) on the text field, and additive boost function
    bf = recip(n_chars, 0.001, 1, 1)."""
    bq_cte = f",\n{_scored('sb', _inlist(bq_terms), p='t1_')}" if bq_terms else ""
    bq_add = (
        f" + {bq_weight} * COALESCE(CAST(CAST(sb.score_raw AS REAL) AS DOUBLE), 0.0)"
        if bq_terms
        else ""
    )
    bq_join = "LEFT JOIN sb ON ids.doc_id = sb.doc_id" if bq_terms else ""
    w1 = f"{qf_text} * COALESCE(CAST(CAST(s1.score_raw AS REAL) AS DOUBLE), 0.0)"
    w2 = f"{qf_src} * COALESCE(CAST(CAST(s2.score_raw AS REAL) AS DOUBLE), 0.0)"
    return f"""WITH {_prelude(chain, text_col='text', p='t1_')},
{_prelude(chain, text_col='source', p='t2_')},
{_scored('s1', _inlist(terms_text), p='t1_')},
{_scored('s2', _inlist(terms_src), p='t2_')}{bq_cte},
ids AS (SELECT doc_id FROM s1 UNION SELECT doc_id FROM s2),
comb AS (
  SELECT ids.doc_id,
         greatest({w1}, {w2})
         + {tie} * (({w1}) + ({w2}) - greatest({w1}, {w2}))
         {bq_add}
         + 1.0 / (1.0 + 0.001 * d.n_chars) AS raw
  FROM ids LEFT JOIN s1 ON ids.doc_id = s1.doc_id
  LEFT JOIN s2 ON ids.doc_id = s2.doc_id
  {bq_join}
  JOIN documents d ON ids.doc_id = d.doc_id)
SELECT doc_id, ROUND(CAST(CAST(raw AS REAL) AS DOUBLE), 4) AS score
FROM comb ORDER BY CAST(raw AS REAL) DESC, doc_id ASC LIMIT {k}"""


def dismax_sql(terms_text: list[str], terms_src: list[str], tie: float = 0.1,
               k: int = 10, chain: AnalyzerChain = CODE_CHAIN) -> str:
    """DisMax over the ``text`` and ``source`` fields of documents."""
    return f"""WITH {_prelude(chain, text_col='text', p='t1_')},
{_prelude(chain, text_col='source', p='t2_')},
{_scored('sx', _inlist(terms_text), p='t1_')},
{_scored('sy', _inlist(terms_src), p='t2_')},
comb AS (
  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
         COALESCE(CAST(CAST(a.score_raw AS REAL) AS DOUBLE), 0.0) AS sa,
         COALESCE(CAST(CAST(b.score_raw AS REAL) AS DOUBLE), 0.0) AS sb
  FROM sx a FULL OUTER JOIN sy b ON a.doc_id = b.doc_id)
SELECT doc_id,
       ROUND(CAST(CAST(greatest(sa, sb) + {tie} * (sa + sb - greatest(sa, sb)) AS REAL) AS DOUBLE), 4) AS score
FROM comb
ORDER BY CAST(greatest(sa, sb) + {tie} * (sa + sb - greatest(sa, sb)) AS REAL) DESC, doc_id ASC
LIMIT {k}"""


def rrf_sql(terms1: list[str], terms2: list[str], k: int = 10, depth: int = 20,
            c: int = 60, chain: AnalyzerChain = CODE_CHAIN) -> str:
    return f"""WITH {_prelude(chain)},
{_scored('s1', _inlist(terms1))},
{_scored('s2', _inlist(terms2))},
r1 AS (SELECT doc_id, row_number() OVER (ORDER BY CAST(score_raw AS REAL) DESC, doc_id ASC) AS rank
       FROM s1 QUALIFY rank <= {depth}),
r2 AS (SELECT doc_id, row_number() OVER (ORDER BY CAST(score_raw AS REAL) DESC, doc_id ASC) AS rank
       FROM s2 QUALIFY rank <= {depth}),
u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
SELECT doc_id, ROUND(SUM(1.0 / ({c} + rank)), 6) AS rrf_score
FROM u GROUP BY doc_id
ORDER BY SUM(1.0 / ({c} + rank)) DESC, doc_id ASC LIMIT {k}"""


def spellcheck_sql(word: str, max_edits: int = 2, n: int = 5,
                   chain: AnalyzerChain = CODE_CHAIN) -> str:
    esc = word.replace("'", "''")
    return f"""WITH {_prelude(chain)},
alldf AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok)
SELECT tok AS term, df, levenshtein(tok, '{esc}') AS dist
FROM alldf
WHERE abs(length(tok) - {len(word)}) <= {max_edits}
  AND levenshtein(tok, '{esc}') <= {max_edits}
ORDER BY dist ASC, df DESC, tok ASC LIMIT {n}"""


def wordbreak_split_sql(word: str, n: int = 10, min_part: int = 2,
                        chain: AnalyzerChain = CODE_CHAIN) -> str:
    esc = word.lower().replace("'", "''")
    hi = len(word) - min_part + 1  # range() end is exclusive
    return f"""WITH {_prelude(chain)},
alldf AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
splits AS (SELECT CAST(i AS INT) AS split_at,
                  substr('{esc}', 1, CAST(i AS INT)) AS left_part,
                  substr('{esc}', CAST(i AS INT) + 1) AS right_part
           FROM range({min_part}, {hi}) r(i))
SELECT s.split_at, s.left_part, s.right_part, a.df AS df_left, b.df AS df_right
FROM splits s JOIN alldf a ON a.tok = s.left_part
              JOIN alldf b ON b.tok = s.right_part
ORDER BY (a.df + b.df) DESC, s.split_at ASC LIMIT {n}"""


def wordbreak_combine_sql(words: list[str], n: int = 10,
                          chain: AnalyzerChain = CODE_CHAIN) -> str:
    rows = ", ".join(
        "({}, '{}', '{}', '{}')".format(
            i,
            words[i].lower().replace("'", "''"),
            words[i + 1].lower().replace("'", "''"),
            (words[i] + words[i + 1]).lower().replace("'", "''"),
        )
        for i in range(len(words) - 1)
    )
    return f"""WITH {_prelude(chain)},
alldf AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
pairs(pos, word1, word2, combined) AS (VALUES {rows})
SELECT CAST(p.pos AS INT) AS pos, p.word1, p.word2, p.combined, a.df
FROM pairs p JOIN alldf a ON a.tok = p.combined
ORDER BY a.df DESC, p.pos ASC LIMIT {n}"""


def suggest_sql(prefix: str, n: int = 10, chain: AnalyzerChain = CODE_CHAIN) -> str:
    esc = prefix.replace("'", "''")
    return f"""WITH {_prelude(chain)},
alldf AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok)
SELECT tok AS term, df FROM alldf
WHERE tok LIKE '{esc}%'
ORDER BY df DESC, tok ASC LIMIT {n}"""


def highlight_sql(term: str, k: int = 10, before: int = 30, width: int = 80,
                  chain: AnalyzerChain = CODE_CHAIN) -> str:
    tok = chain.tokenize_py(term)
    needle = (tok[0] if tok else term.lower()).replace("'", "''")
    pos = f"strpos(lower(d.text), '{needle}')"
    return f"""WITH {_prelude(chain)},
{_scored('sc', _inlist([needle]))},
hits AS (SELECT doc_id, CAST(score_raw AS REAL) AS score FROM sc
         ORDER BY CAST(score_raw AS REAL) DESC, doc_id ASC LIMIT {k})
SELECT h.doc_id, ROUND(CAST(h.score AS DOUBLE), 4) AS score,
       CASE WHEN {pos} > 0
            THEN substr(d.text, greatest(1, {pos} - {before}), {width}) END AS snippet
FROM hits h JOIN documents d USING (doc_id)
ORDER BY h.score DESC, h.doc_id ASC"""


def significant_terms_sql(fg_term: str, min_fg_df: int = 2, n: int = 10,
                          chain: AnalyzerChain = CODE_CHAIN) -> str:
    tok = chain.tokenize_py(fg_term)
    esc = (tok[0] if tok else fg_term).replace("'", "''")
    return f"""WITH {_prelude(chain)},
fg AS (SELECT DISTINCT doc_id FROM toks WHERE tok = '{esc}'),
fgdf AS (
  SELECT tok, count(DISTINCT doc_id) AS fg_df FROM toks
  WHERE doc_id IN (SELECT doc_id FROM fg)
  GROUP BY tok HAVING count(DISTINCT doc_id) >= {min_fg_df}),
bgdf AS (SELECT tok, count(DISTINCT doc_id) AS bg_df FROM toks GROUP BY tok)
SELECT f.tok AS term, f.fg_df, b.bg_df,
       ROUND(f.fg_df * f.fg_df / b.bg_df, 6) AS score
FROM fgdf f JOIN bgdf b ON f.tok = b.tok
ORDER BY f.fg_df * f.fg_df / b.bg_df DESC, f.tok ASC LIMIT {n}"""


def phrase_topk_sql(
    phrase: str, k: int = 10, chain: AnalyzerChain = CODE_CHAIN, slop: int = 0
) -> str:
    """Phrase BM25 oracle ``"…"~slop``: positions = 1-based index in the
    surviving-token stream (relative offsets match the engine's 0-based
    positions); match = ordered chain with span ≤ n-1+slop; pf = count of
    DISTINCT chain starts; idf summed per term INSTANCE; tf := pf."""
    terms = chain.tokenize_py(phrase)
    n = len(terms)
    esc = [t.replace("'", "''") for t in terms]
    joins = "\n".join(
        f"  JOIN pos p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.pos > p{i - 1}.pos "
        f"AND p{i}.pos <= p0.pos + {i + slop} AND p{i}.tok = '{esc[i]}'"
        for i in range(1, n)
    )
    idf_parts = " + ".join(
        f"ln(1.0 + (s.n_docs - (SELECT count(DISTINCT doc_id) FROM toks WHERE tok = '{t}') + 0.5)"
        f" / ((SELECT count(DISTINCT doc_id) FROM toks WHERE tok = '{t}') + 0.5))"
        for t in esc
    )
    return f"""WITH {_prelude(chain)},
pos AS (
  SELECT doc_id, unnest(tt) AS tok, generate_subscripts(tt, 1) AS pos
  FROM (SELECT doc_id, {chain.duckdb_tokens_expr('text')} AS tt FROM documents)),
pf AS (
  SELECT p0.doc_id, count(DISTINCT p0.pos) AS pf
  FROM pos p0
{joins}
  WHERE p0.tok = '{esc[0]}'
  GROUP BY p0.doc_id)
SELECT pf.doc_id,
       ROUND(CAST(CAST(({idf_parts})
             * pf.pf / (pf.pf + {K1} * (1.0 - {B} + {B} * l.dl / s.avgdl)) AS REAL) AS DOUBLE), 4) AS score
FROM pf JOIN dl l USING (doc_id) CROSS JOIN stats s
ORDER BY CAST(({idf_parts}) * pf.pf / (pf.pf + {K1} * (1.0 - {B} + {B} * l.dl / s.avgdl)) AS REAL) DESC,
         pf.doc_id ASC
LIMIT {k}"""


def tfidf_matrix_sql(
    where: str,
    min_df: int = 2,
    max_df_frac: float = 0.5,
    chain: AnalyzerChain = CODE_CHAIN,
) -> str:
    """DuckDB oracle for :func:`solr_spark.query.extras.term_vectors_matrix`
    (TermVectorsEvaluator analog): tf from the docs selected by
    ``where``, df/N over the whole corpus via the frozen analyzer."""
    return f"""
WITH {_prelude(chain)},
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks WHERE {where} GROUP BY 1, 2)
SELECT t.doc_id, t.tok AS term, t.tf, d.df,
       ROUND(CAST(CAST((t.tf * 1.0 / l.dl) * ln(1.0 + s.n_docs * 1.0 / d.df)
                  AS REAL) AS DOUBLE), 6) AS tfidf
FROM tf t JOIN df d USING (tok) JOIN dl l USING (doc_id) CROSS JOIN stats s
WHERE d.df >= {min_df} AND d.df <= {max_df_frac} * s.n_docs
ORDER BY t.doc_id, t.tok
""".strip()


def _ltr_feats_ctes(
    terms_q: list[str], terms_f: list[str], rerank_docs: int,
    chain: AnalyzerChain = CODE_CHAIN,
) -> str:
    """Shared CTEs for the LTR oracles: first-pass window + features."""
    return f"""WITH {_prelude(chain)},
{_scored('s1', _inlist(terms_q))},
{_scored('s2', _inlist(terms_f))},
first AS (
  SELECT doc_id, CAST(score_raw AS REAL) AS f_orig FROM s1
  ORDER BY CAST(score_raw AS REAL) DESC, doc_id ASC LIMIT {rerank_docs}),
feats AS (
  SELECT f.doc_id,
         CAST(f.f_orig AS DOUBLE) AS f_orig,
         COALESCE(CAST(CAST(s2.score_raw AS REAL) AS DOUBLE), 0.0) AS f_sub,
         CAST(l.dl AS DOUBLE) AS f_dl,
         CAST(doc.n_chars AS DOUBLE) AS f_nc
  FROM first f LEFT JOIN s2 USING (doc_id)
  JOIN dl l USING (doc_id)
  JOIN documents doc ON doc.doc_id = f.doc_id)"""


def ltr_linear_sql(
    terms_q: list[str], terms_f: list[str], k: int = 10, rerank_docs: int = 50,
    w_original: float = 0.6, w_feature: float = 0.3,
    w_dl: float = -0.004, w_nc: float = 0.0005,
    chain: AnalyzerChain = CODE_CHAIN,
) -> str:
    """DuckDB oracle for :func:`...extras.ltr_linear_rescore`."""
    return f"""{_ltr_feats_ctes(terms_q, terms_f, rerank_docs, chain)},
sc AS (
  SELECT doc_id,
         CAST({w_original} * f_orig + {w_feature} * f_sub
              + {w_dl} * f_dl + {w_nc} * f_nc AS REAL) AS sc,
         f_orig, f_sub, f_dl, f_nc
  FROM feats)
SELECT doc_id, ROUND(CAST(sc AS DOUBLE), 4) AS score,
       ROUND(f_orig, 4) AS f_orig, ROUND(f_sub, 4) AS f_sub,
       f_dl, f_nc
FROM sc ORDER BY sc DESC, doc_id ASC LIMIT {k}"""


def ltr_trees_sql(
    terms_q: list[str], terms_f: list[str], k: int = 10, rerank_docs: int = 50,
    chain: AnalyzerChain = CODE_CHAIN,
) -> str:
    """DuckDB oracle for :func:`...extras.ltr_trees_rescore` — the SAME
    two frozen depth-2 trees as nested CASE expressions."""
    return f"""{_ltr_feats_ctes(terms_q, terms_f, rerank_docs, chain)},
sc AS (
  SELECT doc_id, f_orig, f_dl,
         CAST(
           (CASE WHEN f_orig <= 2.0
                 THEN CASE WHEN f_dl <= 120.0 THEN 0.1 ELSE 0.3 END
                 ELSE CASE WHEN f_sub <= 1.0 THEN 0.8 ELSE 1.2 END END)
         + (CASE WHEN f_dl <= 150.0
                 THEN CASE WHEN f_orig <= 3.0 THEN 0.05 ELSE 0.5 END
                 ELSE CASE WHEN f_orig <= 1.0 THEN -0.2 ELSE 0.2 END END)
         AS REAL) AS sc
  FROM feats)
SELECT doc_id, ROUND(CAST(sc AS DOUBLE), 4) AS score,
       ROUND(f_orig, 4) AS f_orig, f_dl
FROM sc ORDER BY sc DESC, doc_id ASC, f_dl ASC LIMIT {k}"""


def suggest_infix_sql(needle: str, n: int = 10, chain: AnalyzerChain = CODE_CHAIN) -> str:
    """DuckDB oracle for :func:`...extras.suggest_infix` — same
    strpos/substr highlight construction."""
    esc = needle.replace("'", "''")
    ln = len(needle)
    return f"""WITH {_prelude(chain)},
alldf AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok)
SELECT tok AS term, df,
       substr(tok, 1, strpos(tok, '{esc}') - 1) || '<b>{esc}</b>' ||
       substr(tok, strpos(tok, '{esc}') + {ln}) AS highlighted
FROM alldf WHERE tok LIKE '%{esc}%'
ORDER BY df DESC, tok ASC LIMIT {n}"""


def suggest_blended_infix_sql(needle: str, n: int = 10,
                              chain: AnalyzerChain = CODE_CHAIN) -> str:
    esc = needle.replace("'", "''")
    return f"""WITH {_prelude(chain)},
alldf AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok)
SELECT tok AS term, df,
       CAST(strpos(tok, '{esc}') - 1 AS INT) AS position,
       ROUND(df / CAST(strpos(tok, '{esc}') AS DOUBLE), 6) AS weight
FROM alldf WHERE strpos(tok, '{esc}') > 0
ORDER BY weight DESC, tok ASC LIMIT {n}"""


def interleave_sql(
    terms_a: list[str], terms_b: list[str], k: int = 10, depth: int = 20,
    chain: AnalyzerChain = CODE_CHAIN,
) -> str:
    """DuckDB oracle for :func:`...extras.interleave_team_draft` — the
    deterministic A-first team draft via the closed-form slot key
    min(2*rA - 1, 2*rB)."""
    return f"""WITH {_prelude(chain)},
{_scored('s1', _inlist(terms_a))},
{_scored('s2', _inlist(terms_b))},
ra AS (SELECT doc_id, row_number() OVER
         (ORDER BY CAST(score_raw AS REAL) DESC, doc_id ASC) AS r
       FROM s1 ORDER BY CAST(score_raw AS REAL) DESC, doc_id ASC LIMIT {depth}),
rb AS (SELECT doc_id, row_number() OVER
         (ORDER BY CAST(score_raw AS REAL) DESC, doc_id ASC) AS r
       FROM s2 ORDER BY CAST(score_raw AS REAL) DESC, doc_id ASC LIMIT {depth}),
j AS (
  SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
         COALESCE(ra.r * 2 - 1, 1 << 30) AS sa,
         COALESCE(rb.r * 2, 1 << 30) AS sb
  FROM ra FULL JOIN rb ON ra.doc_id = rb.doc_id)
SELECT doc_id,
       CASE WHEN sa <= sb THEN 'A' ELSE 'B' END AS team,
       CAST(least(sa, sb) AS BIGINT) AS slot
FROM j ORDER BY slot LIMIT {k}"""


def luke_summary_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    chain: AnalyzerChain = CODE_CHAIN,
) -> str:
    """DuckDB oracle for :func:`solr_spark.admin.luke_summary` — recompute
    the index-level stats straight from the raw table: distinct terms,
    postings = distinct (doc, term) pairs, tokens = surviving-token count,
    avgdl = tokens / docs."""
    toks = chain.duckdb_tokens_select(table, id_col, text_col)
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, tok FROM {toks} t),
per AS (SELECT tok, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS cf
        FROM toks GROUP BY tok)
SELECT CAST((SELECT COUNT(*) FROM {table}) AS BIGINT) AS num_docs,
       CAST(COUNT(*) AS BIGINT) AS num_terms,
       CAST(SUM(df) AS BIGINT) AS total_postings,
       CAST(SUM(cf) AS BIGINT) AS total_tokens,
       CAST(ROUND((SELECT COUNT(*) FROM toks) * 1.0
                  / (SELECT COUNT(*) FROM {table}), 4) AS DOUBLE) AS avgdl,
       CAST(MAX(df) AS BIGINT) AS max_df
FROM per
""".strip()


def luke_field_stats_sql(fields: list[str], table: str = "documents") -> str:
    """DuckDB oracle for :func:`solr_spark.admin.luke_field_stats`."""
    selects = [
        f"SELECT '{f}' AS field, CAST(COUNT({f}) AS BIGINT) AS docs_with, "
        f"CAST(COUNT(DISTINCT {f}) AS BIGINT) AS distinct_vals FROM {table}"
        for f in fields
    ]
    return " UNION ALL ".join(selects) + " ORDER BY field"


def analysis_stages_sql(
    doc_id: int,
    chain: AnalyzerChain,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for :func:`solr_spark.admin.analysis_stages` — the
    same staged expressions (`duckdb_stage_exprs`) unnested with
    per-stage positions via generate_subscripts."""
    selects = []
    for i, (name, expr) in enumerate(chain.duckdb_stage_exprs(text_col), start=1):
        selects.append(
            f"SELECT CAST({id_col} AS BIGINT) AS doc_id, {i} AS stage_no, "
            f"'{name}' AS stage, "
            f"CAST(generate_subscripts({expr}, 1) - 1 AS INT) AS pos, "
            f"unnest({expr}) AS token "
            f"FROM {table} WHERE {id_col} = {doc_id}"
        )
    return " UNION ALL ".join(selects) + " ORDER BY stage_no, pos"


def cluster_results_sql(
    terms: list[str],
    mode: str = "OR",
    n_docs: int = 30,
    n_clusters: int = 8,
    min_df: int = 2,
    max_df_frac: float = 0.5,
    chain: AnalyzerChain = CODE_CHAIN,
) -> str:
    """DuckDB oracle for :func:`...extras.cluster_results` — BM25 top-N
    window, corpus df/N, per-hit dominant term at the same round-6
    f32-stable TF-IDF, grouped into labeled clusters."""
    and_flt = f"WHERE nt = {len(set(terms))}" if mode == "AND" else ""
    return f"""WITH {_prelude(chain)},
{_scored('s1', _inlist(terms))},
hits AS (
  SELECT doc_id FROM s1 {and_flt}
  ORDER BY CAST(score_raw AS REAL) DESC, doc_id ASC LIMIT {n_docs}),
dfall AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
tfh AS (
  SELECT t.doc_id, t.tok, count(*) AS tf
  FROM toks t JOIN hits USING (doc_id) GROUP BY 1, 2),
m AS (
  SELECT t.doc_id, t.tok AS term,
         ROUND(CAST(CAST((t.tf * 1.0 / l.dl) * ln(1.0 + s.n_docs * 1.0 / d.df)
                    AS REAL) AS DOUBLE), 6) AS tfidf_r
  FROM tfh t JOIN dfall d USING (tok) JOIN dl l USING (doc_id)
  CROSS JOIN stats s
  WHERE d.df >= {min_df} AND d.df <= {max_df_frac} * s.n_docs),
best AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf_r DESC, term ASC) AS rn
  FROM m)
SELECT term AS label, CAST(count(*) AS BIGINT) AS size,
       list(doc_id ORDER BY doc_id) AS doc_ids
FROM best WHERE rn = 1
GROUP BY term ORDER BY size DESC, label ASC LIMIT {n_clusters}"""


def explain_scores_sql(
    terms: list[str],
    k: int = 10,
    mode: str = "OR",
    chain: AnalyzerChain = CODE_CHAIN,
) -> str:
    """DuckDB oracle for :func:`...extras.explain_scores` — the same
    BM25 decomposition per (top-k doc, term): df over the corpus,
    idf = ln(1+(N-df+0.5)/(df+0.5)), contribution at the engine's
    round-6 f32-stable precision."""
    and_flt = f"WHERE nt = {len(set(terms))}" if mode == "AND" else ""
    return f"""WITH {_prelude(chain)},
{_scored('s1', _inlist(terms))},
hits AS (
  SELECT doc_id FROM s1 {and_flt}
  ORDER BY CAST(score_raw AS REAL) DESC, doc_id ASC LIMIT {k}),
tfq AS (
  SELECT t.doc_id, t.tok, count(*) AS tf
  FROM toks t JOIN hits USING (doc_id)
  WHERE t.tok IN {_inlist(terms)} GROUP BY 1, 2),
dfq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks
        WHERE tok IN {_inlist(terms)} GROUP BY tok)
SELECT t.doc_id, t.tok AS term, CAST(t.tf AS INT) AS tf,
       CAST(d.df AS BIGINT) AS df,
       ROUND(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)), 6) AS idf,
       ROUND(CAST(CAST(
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
         * t.tf / (t.tf + {K1} * (1.0 - {B} + {B} * l.dl / s.avgdl))
         AS REAL) AS DOUBLE), 6) AS contribution
FROM tfq t JOIN dfq d USING (tok) JOIN dl l USING (doc_id)
CROSS JOIN stats s
ORDER BY t.doc_id, t.tok"""


def suggest_fuzzy_sql(
    probe: str, max_edits: int = 2, n: int = 10, chain: AnalyzerChain = CODE_CHAIN
) -> str:
    """DuckDB oracle for :func:`...extras.suggest_fuzzy`."""
    lit = "'" + probe.replace("'", "''") + "'"
    toks = chain.duckdb_tokens_select("documents", "doc_id", "text")
    return f"""
WITH td AS (SELECT tok AS term, count(DISTINCT doc_id) AS df
            FROM {toks} t GROUP BY tok)
SELECT term, CAST(df AS BIGINT) AS weight,
       CAST(levenshtein(term, {lit}) AS INT) AS distance
FROM td WHERE levenshtein(term, {lit}) <= {max_edits}
ORDER BY df DESC, term ASC LIMIT {n}
""".strip()


def relevance_functions_sql(
    probe: str, where: str, chain: AnalyzerChain = CODE_CHAIN
) -> str:
    """DuckDB oracle for :func:`...extras.relevance_functions` — the same
    termfreq/docfreq/idf/tf/norm pseudo-fields from the raw table."""
    lit = "'" + probe.replace("'", "''") + "'"
    return f"""WITH {_prelude(chain)},
tfq AS (SELECT doc_id, count(*) AS tf FROM toks WHERE tok = {lit} GROUP BY doc_id),
dfq AS (SELECT count(DISTINCT doc_id) AS df FROM toks WHERE tok = {lit})
SELECT d.doc_id,
       CAST(COALESCE(t.tf, 0) AS BIGINT) AS termfreq,
       CAST(dfq.df AS BIGINT) AS docfreq,
       ROUND(ln(1.0 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)), 6) AS idf,
       ROUND(CAST(CAST(
         COALESCE(t.tf, 0) * 1.0
         / (COALESCE(t.tf, 0) + {K1} * (1.0 - {B} + {B} * l.dl / s.avgdl))
         AS REAL) AS DOUBLE), 6) AS tf,
       ROUND(CAST(CAST(1.0 - {B} + {B} * l.dl / s.avgdl AS REAL) AS DOUBLE), 6) AS norm
FROM documents d
JOIN dl l USING (doc_id)
LEFT JOIN tfq t USING (doc_id)
CROSS JOIN dfq CROSS JOIN stats s
WHERE {where}
ORDER BY d.doc_id"""
