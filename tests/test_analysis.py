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
