"""Text-analysis operators for large-scale training-data pipelines.

The document-understanding layer a 100 TB corpus pipeline needs on top of
the index engine: token counting, language identification, quality
scoring, and document fingerprinting. Everything is a pure JVM column
expression (whole-stage codegen — no Python in the hot path) and each
operator has a synchronized DuckDB SQL form for the oracle gate.

Reference analogs: Solr's TextProfileSignature / update-processor ingest
transforms (``update/processor/SignatureUpdateProcessorFactory.java``,
``update/processor/`` chain — SURVEY.md §2.2) cover the fingerprint/dedup
side; the quality/langid operators are the standard web-corpus curation
set (C4/Gopher-style heuristics) restated as Spark expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solr_spark.analysis import CODE_CHAIN, AnalyzerChain
from solr_spark.functions.hashing import md5_long, md5_long_sql

# BPE-ish word/punct segmentation (GPT-2-style coarse split: word runs or
# single non-space punctuation). Identical regex semantics in Spark (Java
# regex) and DuckDB (RE2) for this pattern class.
BPE_RE = r"\w+|[^\w\s]"

# frozen per-language marker-word profiles (n-gram heuristic, tiny by
# design so the exact same sets embed into the oracle SQL). Deterministic
# tie-break: higher hit-count wins, then language name ascending.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "for", "with", "that", "this"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "fr": ("le", "la", "les", "et", "est", "pour", "dans", "une", "que", "des"),
    "es": ("el", "la", "los", "y", "es", "para", "en", "una", "que", "por"),
}

# fingerprint: two independent polynomial rolling hashes mod the Mersenne
# prime 2^31-1 (so every intermediate product stays far below 2^63 in both
# engines), combined into one 62-bit value
FP_BASES = (1_000_003, 1_062_599)
FP_MOD = (1 << 31) - 1


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))).cast("long")


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish segment count (word runs + punctuation marks)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_RE)).cast("long")


def token_count_sql(text_expr: str) -> tuple[str, str]:
    """(whitespace, bpe) count expressions — DuckDB forms."""
    ws = rf"len(list_filter(string_split_regex({text_expr}, '\s+'), t -> t <> ''))"
    bpe = rf"len(regexp_extract_all({text_expr}, '{BPE_RE}'))"
    return ws, bpe


# ---------------------------------------------------------------------------
# language identification
# ---------------------------------------------------------------------------


def _hits(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(list(words))))


def language_id(col: Column | str) -> Column:
    """Marker-word language ID over the lowercased whitespace tokens.

    Returns the argmax language ('und' when nothing matches); deterministic
    tie-break by (hits desc, lang asc) so Spark and SQL agree exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.filter(F.split(F.lower(c), r"[^a-zà-ÿ]+"), lambda t: t != F.lit(""))
    scored = F.array(
        *[
            F.struct(_hits(toks, ws).alias("hits"), F.lit(lang).alias("lang"))
            for lang, ws in sorted(LANG_PROFILES.items())
        ]
    )
    # explicit reduce for the (hits desc, lang asc) argmax — struct max()
    # would tie-break lang DESCENDING, so it is not usable here
    best = F.aggregate(
        scored,
        F.struct(F.lit(-1).alias("hits"), F.lit("und").alias("lang")),
        lambda acc, s: F.when(
            (s["hits"] > acc["hits"])
            | ((s["hits"] == acc["hits"]) & (s["lang"] < acc["lang"])),
            s,
        ).otherwise(acc),
    )
    return F.when(best["hits"] <= 0, F.lit("und")).otherwise(best["lang"])


def language_id_sql(text_expr: str) -> str:
    """DuckDB form of :func:`language_id` (same profiles + tie-break)."""
    toks = rf"list_filter(string_split_regex(lower({text_expr}), '[^a-zà-ÿ]+'), t -> t <> '')"
    structs = []
    for lang, ws in sorted(LANG_PROFILES.items()):
        inlist = ", ".join(f"'{w}'" for w in ws)
        structs.append(
            f"{{'hits': len(list_filter({toks}, t -> t IN ({inlist}))), 'lang': '{lang}'}}"
        )
    arr = "[" + ", ".join(structs) + "]"
    reduced = (
        f"list_reduce({arr}, (acc, s) -> CASE WHEN s.hits > acc.hits OR "
        f"(s.hits = acc.hits AND s.lang < acc.lang) THEN s ELSE acc END)"
    )
    return f"CASE WHEN ({reduced}).hits <= 0 THEN 'und' ELSE ({reduced}).lang END"


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

QUALITY_STOPWORDS = ("the", "and", "of", "to", "in", "is", "a", "that", "for", "with")


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """C4/Gopher-style quality heuristics as appended columns.

    - ``q_n_chars`` / ``q_n_words``: length signals
    - ``q_mean_word_len``: mean whitespace-token length
    - ``q_punct_ratio``: punctuation chars / total chars
    - ``q_stopword_ratio``: stopword tokens / tokens (English function
      words — a fluency proxy)
    - ``q_score``: composite in [0,1] (documented formula below)

    All ratios computed in double; q_score =
    ``0.4*min(1, words/100) + 0.3*(1 - min(1, punct_ratio*4)) +
    0.3*min(1, stopword_ratio*5)``.
    """
    c = F.col(text_col)
    words = F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))
    n_chars = F.length(c).cast("double")
    n_words = F.size(words).cast("double")
    mean_wl = F.when(n_words > 0,
                     F.aggregate(words, F.lit(0.0), lambda a, w: a + F.length(w)) / n_words
                     ).otherwise(F.lit(0.0))
    n_punct = F.regexp_count(c, F.lit(r"[^\w\s]")).cast("double")
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    lower_words = F.transform(words, F.lower)
    n_stop = F.size(F.filter(lower_words, lambda t: t.isin(list(QUALITY_STOPWORDS)))).cast("double")
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    score = (
        0.4 * F.least(F.lit(1.0), n_words / 100.0)
        + 0.3 * (1.0 - F.least(F.lit(1.0), punct_ratio * 4.0))
        + 0.3 * F.least(F.lit(1.0), stop_ratio * 5.0)
    )
    return (
        df.withColumn("q_n_chars", n_chars.cast("long"))
        .withColumn("q_n_words", n_words.cast("long"))
        .withColumn("q_mean_word_len", mean_wl)
        .withColumn("q_punct_ratio", punct_ratio)
        .withColumn("q_stopword_ratio", stop_ratio)
        .withColumn("q_score", score)
    )


def quality_sql(text_expr: str) -> dict[str, str]:
    """DuckDB forms of the quality feature columns (same names/formulas)."""
    words = rf"list_filter(string_split_regex({text_expr}, '\s+'), t -> t <> '')"
    n_chars = f"CAST(length({text_expr}) AS DOUBLE)"
    n_words = f"CAST(len({words}) AS DOUBLE)"
    word_lens = f"list_transform({words}, w -> CAST(length(w) AS DOUBLE))"
    mean_wl = (
        f"CASE WHEN {n_words} > 0 THEN "
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {word_lens}), (a,b) -> a+b)"
        f" / {n_words} ELSE 0.0 END"
    )
    n_punct = rf"CAST(len(regexp_extract_all({text_expr}, '[^\w\s]')) AS DOUBLE)"
    punct_ratio = f"CASE WHEN {n_chars} > 0 THEN {n_punct} / {n_chars} ELSE 0.0 END"
    stops = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    n_stop = (
        f"CAST(len(list_filter(list_transform({words}, w -> lower(w)), "
        f"t -> t IN ({stops}))) AS DOUBLE)"
    )
    stop_ratio = f"CASE WHEN {n_words} > 0 THEN {n_stop} / {n_words} ELSE 0.0 END"
    score = (
        f"0.4 * least(1.0, {n_words} / 100.0)"
        f" + 0.3 * (1.0 - least(1.0, ({punct_ratio}) * 4.0))"
        f" + 0.3 * least(1.0, ({stop_ratio}) * 5.0)"
    )
    return {
        "q_n_chars": f"CAST({n_chars} AS BIGINT)",
        "q_n_words": f"CAST({n_words} AS BIGINT)",
        "q_mean_word_len": mean_wl,
        "q_punct_ratio": punct_ratio,
        "q_stopword_ratio": stop_ratio,
        "q_score": score,
    }


# ---------------------------------------------------------------------------
# document fingerprint (rolling polynomial hash)
# ---------------------------------------------------------------------------


def fingerprint(col: Column | str, chain: AnalyzerChain = CODE_CHAIN) -> Column:
    """Order-sensitive 61-bit document fingerprint.

    Polynomial rolling hash over the analyzed token stream, per base B:
    ``fp_B = fold(tokens, 0, (acc, t) -> (acc*B + md5_long(t) % P) % P)``
    with P = 2^31-1; result = fp_B1 * P + fp_B2 (62 bits). Order-sensitive
    (unlike the sha256 content signature) and tokenization-invariant to
    whitespace/case noise — the TextProfile signature analog
    (``update/processor/TextProfileSignature.java``).
    """
    hashes = F.transform(chain.tokens(col), lambda t: F.pmod(md5_long(t), F.lit(FP_MOD)))

    def fold(base: int):
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: F.pmod(acc * F.lit(base) + h, F.lit(FP_MOD)),
        )

    return fold(FP_BASES[0]) * F.lit(FP_MOD) + fold(FP_BASES[1])


def fingerprint_sql(text_expr: str, chain: AnalyzerChain = CODE_CHAIN) -> str:
    """DuckDB form of :func:`fingerprint` (same fold, BIGINT arithmetic)."""
    toks = chain.duckdb_tokens_expr(text_expr)
    tok_hashes = f"list_transform({toks}, t -> ({md5_long_sql('t')}) % {FP_MOD})"

    def fold(base: int) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), {tok_hashes}), "
            f"(acc, h) -> (acc * {base} + h) % {FP_MOD})"
        )

    return f"({fold(FP_BASES[0])} * {FP_MOD} + {fold(FP_BASES[1])})"


# ---------------------------------------------------------------------------
# intra-document repetition (Gopher repetition rules)
# ---------------------------------------------------------------------------


def repetition_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style intra-document repetition signals (the "repetitive
    content" filter family of large-corpus curation): per document,

    - ``n_lines`` / ``dup_line_frac``: fraction of non-empty lines that
      are duplicates of an earlier line
    - ``dup_line_char_frac``: fraction of line characters belonging to
      duplicated lines
    - ``top_bigram_frac``: occurrences of the most frequent word bigram
      over all bigram slots

    Distributed shape: explode → per-(doc, line/bigram) count with
    map-side partial aggregation → per-doc aggregate — two shuffles both
    keyed by ``id_col``, no per-doc Python, no O(lines²) expressions (an
    array-only formulation would be quadratic per document, which a
    100 TB corpus with long documents cannot afford).
    """
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda l: F.length(l) > 0)
    line_rows = df.select(id_col, F.explode(lines).alias("line"))
    line_agg = (
        line_rows.groupBy(id_col, "line")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_lines"),
            F.count(F.lit(1)).alias("n_distinct_lines"),
            F.sum(F.length("line") * F.col("cnt")).alias("chars_all"),
            F.sum(
                F.when(F.col("cnt") > 1, F.length("line") * F.col("cnt")).otherwise(0)
            ).alias("chars_dup"),
        )
    )
    words = F.expr(
        f"filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')"
    )
    bigrams = F.expr(
        f"zip_with(slice(filter(split(lower({text_col}), '\\\\s+'), t -> t <> ''), 1, "
        f"greatest(size(filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')) - 1, 0)), "
        f"slice(filter(split(lower({text_col}), '\\\\s+'), t -> t <> ''), 2, "
        f"greatest(size(filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')) - 1, 0)), "
        f"(a, b) -> concat(a, ' ', b))"
    )
    bg_rows = df.select(id_col, F.explode(bigrams).alias("bg"))
    bg_agg = (
        bg_rows.groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(F.max("cnt").alias("top_bigram_cnt"), F.sum("cnt").alias("n_bigrams"))
    )
    out = line_agg.join(bg_agg, id_col, "left")
    return out.select(
        id_col,
        "n_lines",
        F.round((F.col("n_lines") - F.col("n_distinct_lines")) / F.col("n_lines"), 6)
        .alias("dup_line_frac"),
        F.round(F.col("chars_dup") / F.col("chars_all"), 6).alias("dup_line_char_frac"),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.round(
            F.coalesce(F.col("top_bigram_cnt") / F.col("n_bigrams"), F.lit(0.0)), 6
        ).alias("top_bigram_frac"),
    )


def repetition_sql(where: str = "doc_id < 40") -> str:
    """DuckDB twin of :func:`repetition_features` over ``documents``."""
    return f"""
WITH lines AS (
  SELECT doc_id, l.line FROM documents,
    unnest(list_filter(string_split(text, chr(10)), x -> length(x) > 0)) AS l(line)
  WHERE {where}
), lc AS (
  SELECT doc_id, line, count(*) AS cnt FROM lines GROUP BY 1, 2
), la AS (
  SELECT doc_id, SUM(cnt) AS n_lines, COUNT(*) AS n_distinct,
         SUM(length(line) * cnt) AS chars_all,
         SUM(CASE WHEN cnt > 1 THEN length(line) * cnt ELSE 0 END) AS chars_dup
  FROM lc GROUP BY 1
), wd AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS w
  FROM documents WHERE {where}
), bg AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS b
  FROM wd, unnest(range(1, len(w))) AS r(i)
), bc AS (
  SELECT doc_id, b, count(*) AS cnt FROM bg GROUP BY 1, 2
), ba AS (
  SELECT doc_id, MAX(cnt) AS top_cnt, SUM(cnt) AS n_bigrams FROM bc GROUP BY 1
)
SELECT la.doc_id,
       CAST(la.n_lines AS BIGINT) AS n_lines,
       ROUND((la.n_lines - la.n_distinct) / CAST(la.n_lines AS DOUBLE), 6) AS dup_line_frac,
       ROUND(la.chars_dup / CAST(la.chars_all AS DOUBLE), 6) AS dup_line_char_frac,
       CAST(COALESCE(ba.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       ROUND(COALESCE(ba.top_cnt / CAST(ba.n_bigrams AS DOUBLE), 0.0), 6) AS top_bigram_frac
FROM la LEFT JOIN ba USING (doc_id)
ORDER BY doc_id
""".strip()


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# patterns chosen to compile with IDENTICAL semantics under Java regex
# (Spark) and RE2 (DuckDB): character classes + bounded repetition + \b
# only — no backrefs, no lookaround
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}"


def scrub_pii(col: Column | str) -> Column:
    """Replace emails / IPv4s / phone-shaped numbers with typed
    placeholders (ordered email → ip → phone so earlier replacements
    can't be re-matched by later, looser patterns). Pure JVM
    ``regexp_replace`` — the map-only 100 TB form."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_IP_RE, "<IP>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-type PII match counts (audit columns)."""
    c = F.col(col) if isinstance(col, str) else col
    no_email = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    no_ip = F.regexp_replace(no_email, PII_IP_RE, "<IP>")
    return {
        "n_emails": F.regexp_count(c, F.lit(PII_EMAIL_RE)),
        "n_ips": F.regexp_count(no_email, F.lit(PII_IP_RE)),
        "n_phones": F.regexp_count(no_ip, F.lit(PII_PHONE_RE)),
    }


def scrub_pii_sql(text_expr: str) -> str:
    """DuckDB twin of :func:`scrub_pii` (RE2; 'g' = replace ALL — DuckDB
    defaults to first-match-only, unlike Spark)."""
    out = f"regexp_replace({text_expr}, '{PII_EMAIL_RE}', '<EMAIL>', 'g')"
    out = f"regexp_replace({out}, '{PII_IP_RE}', '<IP>', 'g')"
    return f"regexp_replace({out}, '{PII_PHONE_RE}', '<PHONE>', 'g')"


def pii_counts_sql(text_expr: str) -> dict[str, str]:
    no_email = f"regexp_replace({text_expr}, '{PII_EMAIL_RE}', '<EMAIL>', 'g')"
    no_ip = f"regexp_replace({no_email}, '{PII_IP_RE}', '<IP>', 'g')"
    return {
        "n_emails": f"len(regexp_extract_all({text_expr}, '{PII_EMAIL_RE}'))",
        "n_ips": f"len(regexp_extract_all({no_email}, '{PII_IP_RE}'))",
        "n_phones": f"len(regexp_extract_all({no_ip}, '{PII_PHONE_RE}'))",
    }


# ---------------------------------------------------------------------------
# bigram-LM cross-entropy (CCNet-style LM quality score)
# ---------------------------------------------------------------------------


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document language-model quality score — the CCNet recipe
    (score each document by LM cross-entropy, bucket the corpus by it)
    with the KenLM replaced by a corpus-trained Laplace-smoothed bigram
    model: ``P(w2|w1) = (C(w1 w2) + α) / (C(w1 ·) + α·V)`` where
    ``C(w1 ·)`` is the bigram-context count and ``V`` the corpus
    vocabulary size. Returns ``(doc_id, n_bigrams, cross_entropy)`` —
    mean negative log-probability in nats; docs under 2 tokens drop.

    Distributed shape: the bigram model needs ONE aggregation — the
    context counts are the bigram counts re-summed over ``w2``
    (``C(w1 ·) = Σ_w2 C(w1 w2)``, an aggregation over the already
    vocabulary²-sized table, not a second corpus scan). The model
    tables are vocabulary-sized (tiny next to the corpus — Heaps'
    law), so the scoring joins broadcast; the vocabulary scalar V
    joins as a broadcast 1-row frame, not a driver collect. At
    100 TB: train the counts on a fixed reference slice instead of
    the full corpus and the scoring pass becomes map-only +
    broadcast joins.
    """
    toks = F.expr(f"filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')")
    base = df.select(F.col(id_col), toks.alias("tk"))
    occ = base.select(
        id_col,
        F.explode(
            F.expr(
                "zip_with(slice(tk, 1, greatest(size(tk) - 1, 0)), "
                "slice(tk, 2, greatest(size(tk) - 1, 0)), "
                "(a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("b"),
    ).select(id_col, "b.w1", "b.w2")
    c12 = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = base.select(F.explode("tk").alias("w")).agg(
        F.countDistinct("w").alias("V")
    )
    a = float(alpha)
    scored = (
        occ.join(F.broadcast(c12), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "nll",
            -F.log((F.col("c12") + F.lit(a)) / (F.col("c1") + F.lit(a) * F.col("V"))),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.avg("nll"), 5).alias("cross_entropy"),
    )


def bigram_lm_sql(where: str = "TRUE", alpha: float = 1.0) -> str:
    """DuckDB twin of :func:`bigram_lm_scores` over ``documents``."""
    a = float(alpha)
    return f"""
WITH tk AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS t
  FROM documents WHERE {where}
), occ AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM tk, unnest(range(1, len(t))) AS r(i)
), c12 AS (
  SELECT w1, w2, count(*) AS c12 FROM occ GROUP BY 1, 2
), c1 AS (
  SELECT w1, count(*) AS c1 FROM occ GROUP BY 1
), v AS (
  SELECT count(DISTINCT w) AS V FROM (SELECT unnest(t) AS w FROM tk)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(-ln((c12.c12 + {a}) / (c1.c1 + {a} * v.V))), 5) AS cross_entropy
FROM occ JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
GROUP BY doc_id ORDER BY doc_id
""".strip()


# ---------------------------------------------------------------------------
# Gopher hard filters (rule flags over the quality features)
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WL = 3.0
GOPHER_MAX_MEAN_WL = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.10
GOPHER_MIN_STOPWORDS = 2


def gopher_filter_flags(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher's document-level hard filters (Rae et al. 2021 §A.1.1, the
    rule set every web-corpus pipeline since reuses) as per-doc boolean
    columns plus the combined keep decision:

    - ``ok_word_count``: 50 ≤ words ≤ 100k
    - ``ok_mean_word_len``: mean word length in [3, 10]
    - ``ok_symbol_ratio``: symbol(non-word, non-space) chars / chars < 0.1
    - ``ok_stopwords``: ≥ 2 DISTINCT English stopwords present (the
      "stop word" fluency requirement)
    - ``keep`` = all of the above

    Map-only column expressions (one corpus scan, no shuffle, no
    Python) — composes with :func:`repetition_features` for the
    repetition rules, which need their own keyed aggregations.
    """
    c = F.col(text_col)
    words = F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))
    n_words = F.size(words).cast("double")
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(words, F.lit(0.0), lambda a, w: a + F.length(w)) / n_words,
    ).otherwise(F.lit(0.0))
    n_chars = F.length(c).cast("double")
    sym_ratio = F.when(
        n_chars > 0, F.regexp_count(c, F.lit(r"[^\w\s]")).cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    n_stop_distinct = F.size(
        F.array_distinct(
            F.filter(
                F.transform(words, F.lower),
                lambda t: t.isin(list(QUALITY_STOPWORDS)),
            )
        )
    )
    ok_wc = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    ok_wl = (mean_wl >= GOPHER_MIN_MEAN_WL) & (mean_wl <= GOPHER_MAX_MEAN_WL)
    ok_sym = sym_ratio < GOPHER_MAX_SYMBOL_RATIO
    ok_stop = n_stop_distinct >= GOPHER_MIN_STOPWORDS
    return df.select(
        F.col(id_col),
        ok_wc.alias("ok_word_count"),
        ok_wl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_wl & ok_sym & ok_stop).alias("keep"),
    )


def gopher_filter_sql(where: str = "TRUE") -> str:
    """DuckDB twin of :func:`gopher_filter_flags` over ``documents``."""
    words = r"list_filter(string_split_regex(text, '\s+'), t -> t <> '')"
    n_words = f"CAST(len({words}) AS DOUBLE)"
    mean_wl = (
        f"CASE WHEN {n_words} > 0 THEN "
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({words}, w -> CAST(length(w) AS DOUBLE))), (a,b) -> a+b)"
        f" / {n_words} ELSE 0.0 END"
    )
    n_chars = "CAST(length(text) AS DOUBLE)"
    sym_ratio = (
        f"CASE WHEN {n_chars} > 0 THEN "
        rf"CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) / {n_chars} "
        f"ELSE 0.0 END"
    )
    stops = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    n_stop = (
        f"len(list_distinct(list_filter(list_transform({words}, w -> lower(w)), "
        f"t -> t IN ({stops}))))"
    )
    return f"""
SELECT doc_id,
  ({n_words} >= {GOPHER_MIN_WORDS} AND {n_words} <= {GOPHER_MAX_WORDS}) AS ok_word_count,
  (({mean_wl}) >= {GOPHER_MIN_MEAN_WL} AND ({mean_wl}) <= {GOPHER_MAX_MEAN_WL}) AS ok_mean_word_len,
  (({sym_ratio}) < {GOPHER_MAX_SYMBOL_RATIO}) AS ok_symbol_ratio,
  ({n_stop} >= {GOPHER_MIN_STOPWORDS}) AS ok_stopwords,
  (({n_words} >= {GOPHER_MIN_WORDS} AND {n_words} <= {GOPHER_MAX_WORDS})
   AND (({mean_wl}) >= {GOPHER_MIN_MEAN_WL} AND ({mean_wl}) <= {GOPHER_MAX_MEAN_WL})
   AND (({sym_ratio}) < {GOPHER_MAX_SYMBOL_RATIO})
   AND ({n_stop} >= {GOPHER_MIN_STOPWORDS})) AS keep
FROM documents WHERE {where} ORDER BY doc_id
""".strip()
