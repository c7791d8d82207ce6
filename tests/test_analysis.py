"""Golden-vector + cross-form parity tests for the analysis chain."""

import duckdb
import pytest

from solr_spark.analysis import CODE_CHAIN, TEXT_CHAIN

GOLDEN = [
    # (input, expected tokens) — frozen; changing the chain breaks these.
    ("def parseJsonHTTPServer2(self): return x",
     ["def", "parse", "json", "http", "server2", "self", "return", "x"]),
    ("snake_case_name and CamelCase", ["snake", "case", "name", "and", "camel", "case"]),
    ("the a an of to in is", []),
    ("", []),
    (None, []),
    ("x2y Q4Report __init__", ["x2y", "q4", "report", "init"]),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_golden_python(text, expected):
    assert CODE_CHAIN.tokenize_py(text) == expected


def test_spark_matches_python(spark):
    texts = [t for t, _ in GOLDEN if t is not None]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    rows = df.select("id", CODE_CHAIN.tokens("text").alias("toks")).collect()
    for r in rows:
        assert r["toks"] == CODE_CHAIN.tokenize_py(texts[r["id"]])


def test_pandas_udf_matches_python(spark):
    texts = [t for t, _ in GOLDEN if t is not None]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    rows = df.select("id", CODE_CHAIN.tokens_pandas_udf()("text").alias("toks")).collect()
    for r in rows:
        assert r["toks"] == CODE_CHAIN.tokenize_py(texts[r["id"]])


def test_duckdb_matches_python():
    con = duckdb.connect()
    for text, expected in GOLDEN:
        if text is None:
            continue
        expr = CODE_CHAIN.duckdb_tokens_expr("?")
        # inline the literal instead of parameter inside the expr builder
        lit = "'" + text.replace("'", "''") + "'"
        got = con.execute(f"SELECT {CODE_CHAIN.duckdb_tokens_expr(lit)}").fetchone()[0]
        assert got == expected, text


def test_text_chain_no_case_split():
    assert TEXT_CHAIN.tokenize_py("CamelCase word") == ["camelcase", "word"]


# ---------------------------------------------------------------------------
# stemming chains
# ---------------------------------------------------------------------------

from solr_spark.analysis import CODE_PORTER_CHAIN, CODE_STEM_CHAIN  # noqa: E402
from solr_spark.analysis.porter import GOLDEN as PORTER_GOLDEN  # noqa: E402
from solr_spark.analysis.porter import porter_stem  # noqa: E402


def test_porter_golden_vectors():
    """Porter stems must match the published algorithm's worked examples
    (Porter 1980; Lucene PorterStemFilter implements the same spec)."""
    for w, expect in PORTER_GOLDEN.items():
        assert porter_stem(w) == expect, w


def test_minimal_stem_three_forms_agree(spark):
    """The minimal plural stemmer must agree across Spark expressions,
    Python, and DuckDB SQL on a stress vocabulary."""
    words = ("tables merges entries flies glass status crisis bus ties is as"
             " pass classes stores caches indexes queries axis dos boss this")
    py = CODE_STEM_CHAIN.tokenize_py(words)
    sdf = spark.createDataFrame([(words,)], "t string").select(
        CODE_STEM_CHAIN.tokens("t").alias("toks")
    )
    assert sdf.collect()[0]["toks"] == py
    con = duckdb.connect()
    lit = "'" + words + "'"
    got = con.execute("SELECT " + CODE_STEM_CHAIN.duckdb_tokens_expr(lit)).fetchone()[0]
    assert got == py


def test_porter_chain_spark_matches_python(spark, oracle_corpus):
    """The porter chain's pandas-UDF Spark form must equal tokenize_py
    over real corpus docs (the declared extension point, chains.py)."""
    sample = oracle_corpus.head(25)
    sdf = spark.createDataFrame(sample[["doc_id", "content"]])
    got = {
        r["doc_id"]: r["toks"]
        for r in sdf.select("doc_id", CODE_PORTER_CHAIN.tokens("content").alias("toks")).collect()
    }
    for _, row in sample.iterrows():
        assert got[row["doc_id"]] == CODE_PORTER_CHAIN.tokenize_py(row["content"])


def test_porter_chain_has_no_sql_form():
    with pytest.raises(NotImplementedError):
        CODE_PORTER_CHAIN.duckdb_tokens_expr("'x'")


def test_ascii_fold_chain_three_forms(spark):
    """fold → case-split ordering: É creates a camel boundary after fold."""
    import duckdb

    from solr_spark.analysis import CODE_FOLD_CHAIN

    text = "Café Zürich àçcèntÉd naïve HTTPServer"
    expect = CODE_FOLD_CHAIN.tokenize_py(text)
    assert "cafe" in expect and "zurich" in expect
    assert "accent" in expect and "ed" in expect  # É → E camel split
    got_spark = (
        spark.createDataFrame([(text,)], "t string")
        .select(CODE_FOLD_CHAIN.tokens("t").alias("toks"))
        .collect()[0]["toks"]
    )
    assert got_spark == expect
    got_duck = duckdb.sql(
        f"SELECT {CODE_FOLD_CHAIN.duckdb_tokens_expr('?')} ", params=[text]
    ).fetchone()[0]
    assert got_duck == expect


def test_shingles_column(spark):
    from solr_spark.analysis import CODE_CHAIN, shingles

    df = spark.createDataFrame(
        [("scan the big table fast",), ("one",), ("",)], "t string"
    )
    out = df.select(shingles(CODE_CHAIN.tokens("t"), 2).alias("s")).collect()
    # stopword 'the' is removed BEFORE shingling (Solr filter order)
    assert out[0]["s"] == ["scan big", "big table", "table fast"]
    assert out[1]["s"] == [] and out[2]["s"] == []
    tri = df.select(shingles(CODE_CHAIN.tokens("t"), 3, sep="_").alias("s")).collect()
    assert tri[0]["s"] == ["scan_big_table", "big_table_fast"]
