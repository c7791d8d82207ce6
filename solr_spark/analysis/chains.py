"""Analysis chains: tokenizer + filter pipelines, Solr-style.

The reference composes per-field-type ``TokenizerChain``s (char filters →
tokenizer → token filters) from XML — see Solr
``schema/FieldTypePluginLoader.java:43,78-90`` and the ``_default`` schema
``server/solr/configsets/_default/conf/managed-schema.xml:299-316`` (the
``text_general`` chain: StandardTokenizer → StopFilter → LowerCaseFilter)
and ``managed-schema.xml:394-424`` (``text_en_splitting``:
WhitespaceTokenizer → Stop → WordDelimiterGraphFilter(generateWordParts=1,
splitOnCaseChange=1, ...) → LowerCase → PorterStem).

We freeze ONE deterministic chain (the "code chain") modeled on
text_en_splitting's word-delimiter behavior, chosen so the exact same
semantics are expressible in three synchronized forms:

1. Spark column expressions (JVM-side, whole-stage-codegen — the hot path),
2. plain Python (`tokenize_py`, used by the brute-force numpy oracle),
3. a DuckDB SQL fragment (`duckdb_tokens_select`, used by `oracle_sql()`).

Frozen semantics (documented; any change invalidates golden vectors):

  a. split CamelCase boundaries: insert a space at ``(ALPHA+)(Alpha lower)``
     (HTTPServer → HTTP Server) then ``(lower|digit)(Upper)``
     (parseJson2Xml → parse Json2 Xml) — WordDelimiterGraph's
     splitOnCaseChange=1 / generateWordParts=1 analog;
  b. lowercase (LowerCaseFilter);
  c. split on runs of non-[a-z0-9] (StandardTokenizer-ish for code: this
     also splits snake_case identifiers on '_');
  d. drop empty tokens and stopwords (StopFilter, ignoreCase by virtue of
     running after lowercase). No letter↔digit splitting (splitOnNumerics
     is NOT applied — frozen choice, simpler and identical across engines).

Doc length = count of surviving tokens — the discountOverlaps=true analog
(Solr ``search/similarities/BM25SimilarityFactory.java:47``): our chain
emits no positionIncrement-0 tokens, so token count IS the BM25 doc length.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Stop set mirrors text_general's StopFilter concept with a small frozen
# English set (managed-schema.xml:299-316 wires stopwords.txt; ours is fixed
# so every engine form agrees).
CODE_STOPWORDS: frozenset[str] = frozenset({"the", "a", "an", "of", "to", "in", "is"})

_CAMEL1 = r"([A-Z]+)([A-Z][a-z])"  # HTTPServer -> HTTP Server
_CAMEL2 = r"([a-z0-9])([A-Z])"  # parseJson  -> parse Json
_SPLIT = r"[^a-z0-9]+"

_CAMEL1_RE = re.compile(_CAMEL1)
_CAMEL2_RE = re.compile(_CAMEL2)
_SPLIT_RE = re.compile(_SPLIT)

# ASCIIFoldingFilter analog (Lucene ASCIIFoldingFilterFactory, wired in
# Solr schemas as <filter class="solr.ASCIIFoldingFilterFactory"/>): a
# FROZEN 1:1 Latin-1-supplement fold map, identical in all three engine
# forms via `translate` (Spark F.translate / str.translate / DuckDB
# translate). Multi-char expansions (æ→ae, ß→ss, œ→oe) are deliberately
# excluded from the frozen map — translate is char-for-char and the three
# forms must agree exactly; those chars fall to the non-alnum split like
# any other symbol.
_FOLD_SRC = "ÀÁÂÃÄÅàáâãäåÇçÈÉÊËèéêëÌÍÎÏìíîïÑñÒÓÔÕÖØòóôõöøÙÚÛÜùúûüÝýÿ"
_FOLD_DST = "AAAAAAaaaaaaCcEEEEeeeeIIIIiiiiNnOOOOOOooooooUUUUuuuuYyy"
if len(_FOLD_SRC) != len(_FOLD_DST):  # frozen-map invariant; survives -O
    raise AssertionError("ascii fold map src/dst length mismatch")
_FOLD_TABLE = str.maketrans(_FOLD_SRC, _FOLD_DST)


def _minimal_stem_py(t: str) -> str:
    """Frozen minimal plural stemmer (Lucene EnglishMinimalStemFilter
    analog, ``EnglishMinimalStemFilterFactory``): identical in all three
    engine forms. Rules, in order:
      len<4 or no trailing 's'      → unchanged
      ends 'ss' / 'us' / 'is'       → unchanged
      ends 'ies' and len>4          → …ies → …y
      otherwise                     → drop trailing 's'
    """
    if len(t) < 4 or not t.endswith("s"):
        return t
    if t.endswith(("ss", "us", "is")):
        return t
    if t.endswith("ies") and len(t) > 4:
        return t[:-3] + "y"
    return t[:-1]


def _duckdb_minimal_stem(list_expr: str) -> str:
    """DuckDB twin of ``_minimal_stem_py`` applied over a token list."""
    return (
        f"list_transform({list_expr}, t -> CASE "
        "WHEN length(t) < 4 OR NOT ends_with(t, 's') THEN t "
        "WHEN ends_with(t, 'ss') OR ends_with(t, 'us') OR ends_with(t, 'is') THEN t "
        "WHEN ends_with(t, 'ies') AND length(t) > 4 "
        "THEN substr(t, 1, length(t) - 3) || 'y' "
        "ELSE substr(t, 1, length(t) - 1) END)"
    )


@dataclass(frozen=True)
class AnalyzerChain:
    """A frozen tokenize→filter chain usable from Spark, Python and DuckDB.

    ``stem``: None, "minimal" (SQL-expressible plural stemmer — oracle
    gated) or "porter" (full Porter via the pandas-UDF extension point —
    golden-vector gated; the sandbox DuckDB cannot load its stem
    extension, so no SQL form exists for it).
    """

    name: str
    split_case: bool = True
    stopwords: frozenset[str] = field(default_factory=lambda: CODE_STOPWORDS)
    stem: str | None = None
    #: ASCIIFoldingFilter analog — fold the frozen Latin-1 accent map to
    #: ASCII before case-splitting (so É still marks a camel boundary).
    fold_ascii: bool = False

    # ---- form 1: Spark column expression (JVM-side, codegen'd) ----
    def tokens(self, col: Column | str) -> Column:
        """Array<string> of analyzed tokens — pure built-in functions.

        Stays inside WholeStageCodegen: regexp_replace/lower/split/filter
        (and the minimal-stem transform) are all JVM expressions; only
        the "porter" chain crosses into Python (Arrow-vectorized UDF).
        """
        if self.stem == "porter":
            c = F.col(col) if isinstance(col, str) else col
            return self.tokens_pandas_udf()(c)
        c = F.col(col) if isinstance(col, str) else col
        if self.fold_ascii:
            c = F.translate(c, _FOLD_SRC, _FOLD_DST)
        if self.split_case:
            c = F.regexp_replace(c, _CAMEL1, r"$1 $2")
            c = F.regexp_replace(c, _CAMEL2, r"$1 $2")
        c = F.lower(c)
        toks = F.split(c, _SPLIT)
        stops = sorted(self.stopwords)
        out = F.filter(toks, lambda t: (t != F.lit("")) & ~t.isin(stops))
        if self.stem == "minimal":
            out = F.transform(out, _minimal_stem_col)
        return out

    def doc_len(self, col: Column | str) -> Column:
        """BM25 doc length = surviving-token count (discountOverlaps=true)."""
        return F.size(self.tokens(col))

    # ---- form 2: plain Python (oracle / golden vectors) ----
    def tokenize_py(self, text: str) -> list[str]:
        if text is None:
            return []
        if self.fold_ascii:
            text = text.translate(_FOLD_TABLE)
        if self.split_case:
            text = _CAMEL1_RE.sub(r"\1 \2", text)
            text = _CAMEL2_RE.sub(r"\1 \2", text)
        toks = _SPLIT_RE.split(text.lower())
        out = [t for t in toks if t and t not in self.stopwords]
        if self.stem == "minimal":
            out = [_minimal_stem_py(t) for t in out]
        elif self.stem == "porter":
            from solr_spark.analysis.porter import porter_stem

            out = [porter_stem(t) for t in out]
        return out

    # ---- staged forms (FieldAnalysisRequestHandler analog) ----
    def stage_tokens(self, col: Column | str) -> list[tuple[str, Column]]:
        """Per-stage token arrays, in chain order — the analysis-handler
        view of the same frozen chain (ref:
        handler/AnalysisRequestHandlerBase.java, which reports the token
        stream after the tokenizer and after each filter). The final
        stage's array is identical to :meth:`tokens`."""
        if self.stem == "porter":
            raise NotImplementedError("porter chain has no staged column form")
        c = F.col(col) if isinstance(col, str) else col
        if self.fold_ascii:
            c = F.translate(c, _FOLD_SRC, _FOLD_DST)
        if self.split_case:
            c = F.regexp_replace(c, _CAMEL1, r"$1 $2")
            c = F.regexp_replace(c, _CAMEL2, r"$1 $2")
        toks = F.filter(F.split(F.lower(c), _SPLIT), lambda t: t != F.lit(""))
        stages = [("tokenizer", toks)]
        stops = sorted(self.stopwords)
        stopped = F.filter(toks, lambda t: ~t.isin(stops))
        stages.append(("stopfilter", stopped))
        if self.stem == "minimal":
            stages.append(("stemfilter", F.transform(stopped, _minimal_stem_col)))
        return stages

    def duckdb_stage_exprs(self, text_expr: str) -> list[tuple[str, str]]:
        """DuckDB twins of :meth:`stage_tokens`, one list expr per stage."""
        if self.stem == "porter":
            raise NotImplementedError("porter chain has no SQL form")
        e = text_expr
        if self.fold_ascii:
            e = f"translate({e}, '{_FOLD_SRC}', '{_FOLD_DST}')"
        if self.split_case:
            e = f"regexp_replace({e}, '{_CAMEL1}', '\\1 \\2', 'g')"
            e = f"regexp_replace({e}, '{_CAMEL2}', '\\1 \\2', 'g')"
        e = f"string_split_regex(lower({e}), '{_SPLIT}')"
        tok = f"list_filter({e}, t -> t <> '')"
        stages = [("tokenizer", tok)]
        stops = ", ".join(f"'{s}'" for s in sorted(self.stopwords))
        stopped = f"list_filter({tok}, t -> t NOT IN ({stops}))"
        stages.append(("stopfilter", stopped))
        if self.stem == "minimal":
            stages.append(("stemfilter", _duckdb_minimal_stem(stopped)))
        return stages

    # ---- form 3: DuckDB SQL fragment (for oracle_sql) ----
    def duckdb_tokens_expr(self, text_expr: str) -> str:
        """DuckDB list<varchar> expression of analyzed tokens (incl. filter)."""
        if self.stem == "porter":
            raise NotImplementedError(
                "porter chain has no SQL form (DuckDB stem extension "
                "unavailable offline); oracle coverage is golden-vector pytest"
            )
        e = text_expr
        if self.fold_ascii:
            e = f"translate({e}, '{_FOLD_SRC}', '{_FOLD_DST}')"
        if self.split_case:
            e = f"regexp_replace({e}, '{_CAMEL1}', '\\1 \\2', 'g')"
            e = f"regexp_replace({e}, '{_CAMEL2}', '\\1 \\2', 'g')"
        e = f"string_split_regex(lower({e}), '{_SPLIT}')"
        stops = ", ".join(f"'{s}'" for s in sorted(self.stopwords))
        e = f"list_filter({e}, t -> t <> '' AND t NOT IN ({stops}))"
        if self.stem == "minimal":
            e = _duckdb_minimal_stem(e)
        return e

    def duckdb_tokens_select(self, table: str, id_col: str, text_col: str) -> str:
        """A FROM-able subquery producing (id, tok) exploded token rows."""
        return (
            f"(SELECT {id_col}, unnest({self.duckdb_tokens_expr(text_col)}) AS tok "
            f"FROM {table})"
        )

    # ---- pandas UDF variant (for chains not expressible as builtins) ----
    def tokens_pandas_udf(self):
        """Arrow-vectorized tokenizer — identical output to `tokens()`.

        The built-in-expression form is preferred (stays JVM-side); this
        exists as the extension point for chains that need real Python
        (stemming, custom char maps) and as a parity check in tests.
        """
        chain = self

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def _tok(s: pd.Series) -> pd.Series:
            return s.map(chain.tokenize_py)

        return _tok


def _minimal_stem_col(t: Column) -> Column:
    """Spark column form of :func:`_minimal_stem_py` (same frozen rules)."""
    n = F.length(t)
    return (
        F.when((n < 4) | ~t.endswith("s"), t)
        .when(t.endswith("ss") | t.endswith("us") | t.endswith("is"), t)
        .when(t.endswith("ies") & (n > 4), F.concat(t.substr(F.lit(1), n - 3), F.lit("y")))
        .otherwise(t.substr(F.lit(1), n - 1))
    )


#: The code-aware chain (text_en_splitting analog) — the engine default.
CODE_CHAIN = AnalyzerChain(name="code")
#: Plain-text chain without case splitting (text_general analog).
TEXT_CHAIN = AnalyzerChain(name="text_general", split_case=False)
#: Code chain + minimal plural stemmer (EnglishMinimalStemFilter analog) —
#: SQL-expressible, oracle-gated.
CODE_STEM_CHAIN = AnalyzerChain(name="code_stem", stem="minimal")
#: Code chain + full Porter (PorterStemFilter analog, text_en_splitting) —
#: pandas-UDF path, golden-vector gated.
CODE_PORTER_CHAIN = AnalyzerChain(name="code_porter", stem="porter")


def tokenize_py(text: str) -> list[str]:
    """Module-level shortcut: CODE_CHAIN.tokenize_py."""
    return CODE_CHAIN.tokenize_py(text)


#: Code chain + ASCIIFoldingFilter (accent fold before case split).
CODE_FOLD_CHAIN = AnalyzerChain(name="code_fold", fold_ascii=True)


def shingles(toks: Column, n: int = 2, sep: str = " ") -> Column:
    """ShingleFilter analog (Lucene ShingleFilterFactory, wired in Solr
    suggester/spellcheck field types): word n-grams over an analyzed token
    array, as ONE JVM higher-order expression (transform over an index
    sequence + concat_ws) — no explode, no Python, so shingling composes
    into the same whole-stage-codegen span as the tokenizer.

    Emits size(toks)-n+1 shingles; fewer than n tokens → empty array
    (Solr's outputUnigramsIfNoShingles=false shape).
    """
    if n < 2:
        raise ValueError("shingle size must be >= 2")

    def mk(i: Column) -> Column:
        ps = [F.element_at(toks, (i + F.lit(j)).cast("int")) for j in range(n)]
        return F.concat_ws(sep, *ps)

    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    return F.when(F.size(toks) >= n, F.transform(idx, mk)).otherwise(
        F.array().cast("array<string>")
    )
