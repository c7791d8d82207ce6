"""Schema system: dynamic-field resolution precedence, copyField,
uniqueKey, Schema-API JSON roundtrip, schemaless inference."""

import pytest
from pyspark.sql import functions as F

from solr_spark.schema import (
    FieldSpec, SchemaRegistry, apply_inferred_types, infer_schemaless_types,
)


def _registry():
    return SchemaRegistry(
        name="test",
        unique_key="id",
        fields={"id": FieldSpec("id", "plong", required=True),
                "title": FieldSpec("title", "text_general")},
        dynamic=[("*_t", "text_general"), ("*_txt", "text_general"),
                 ("*_i", "pint"), ("attr_*", "string")],
        copy_fields=[("*_t", "_text_"), ("title", "_text_")],
    )


def test_dynamic_resolution_precedence():
    r = _registry()
    assert r.resolve("id").type == "plong"            # explicit beats dynamic
    assert r.resolve("body_t").type == "text_general"
    assert r.resolve("count_i").type == "pint"
    # longest pattern wins: 'foo_txt' matches *_txt (len 5) over *_t (len 3)?
    # '*_txt' matches 'foo_txt'; '*_t' also matches ('foo_tx'+'t'? no:
    # fnmatch '*_t' needs trailing '_t'; 'foo_txt' ends 'xt' -> no match).
    assert r.resolve("foo_txt").type == "text_general"
    assert r.resolve("attr_anything").type == "string"
    assert r.resolve("nomatch") is None


def test_apply_copyfield_uniquekey(spark):
    r = _registry()
    df = spark.createDataFrame(
        [("1", "Spark", "hello world"), ("2", "Solr", "merge data"), (None, "x", "y")],
        "id string, title string, body_t string",
    )
    out = r.apply(df)
    rows = {r_["id"]: r_ for r_ in out.collect()}
    assert len(rows) == 2                       # NULL uniqueKey row dropped
    assert out.schema["id"].dataType.simpleString() == "bigint"
    assert rows[1]["_text_"] == "hello world Spark"   # copyField fan-in
    with pytest.raises(ValueError, match="unknown field"):
        r.apply(df.withColumnRenamed("body_t", "body_unknown"))


def test_managed_json_roundtrip():
    r = _registry()
    r2 = SchemaRegistry.from_managed_json(r.to_managed_json())
    assert r2.unique_key == "id" and r2.dynamic == r.dynamic
    assert r2.copy_fields == r.copy_fields
    assert r2.resolve("count_i").type == "pint"


def test_schemaless_inference(spark):
    df = spark.createDataFrame(
        [("1", "1.5", "true", "abc", None),
         ("2", "2", "false", "3", "9"),
         ("-7", "x", "TRUE", "z", None)],
        "a string, b string, c string, d string, e string",
    )
    inf = infer_schemaless_types(df)
    # a: all parse as long; b: 'x' kills numeric -> string; c: booleans
    # (case-insensitive, but only true/false); d: mixed -> string;
    # e: single non-null '9' -> plong
    assert inf == {"a": "plong", "b": "string", "c": "boolean",
                   "d": "string", "e": "plong"}
    typed = apply_inferred_types(df, inf)
    kinds = dict(typed.dtypes)
    assert kinds["a"] == "bigint" and kinds["c"] == "boolean" and kinds["b"] == "string"
    assert typed.agg(F.sum("a")).collect()[0][0] == -4
