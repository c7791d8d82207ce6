"""Sources/sinks: Solr XML update-format writer → loader roundtrip
(stdlib-etree in mapInPandas; XMLLoader.java analog)."""

import shutil

from pyspark.sql import functions as F

from solr_spark.sources import load_xml_docs, write_update_xml

BASE = "/tmp/solr_spark_xml_test"


def test_xml_roundtrip_preserves_values(spark):
    rows = [
        (1, "en", "plain text"),
        (2, "de", "angle <brackets> & ampersands"),
        (3, "zh", "multi\nline\r\ntext"),
        (4, None, "null lang above; empty next"),
        (5, "fr", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    shutil.rmtree(BASE, ignore_errors=True)
    write_update_xml(df, BASE)
    back = load_xml_docs(spark, BASE, schema="doc_id long, lang string, text string")
    got = {r["doc_id"]: (r["lang"], r["text"]) for r in back.collect()}
    for doc_id, lang, text in rows:
        # empty string round-trips as NULL (self-closing field) — Solr's
        # loader treats missing/empty field text the same way
        expect = (lang, text if text != "" else None)
        assert got[doc_id] == expect, doc_id


def test_xml_roundtrip_casts_types(spark):
    df = spark.createDataFrame([(7, 3.5)], "doc_id long, score double")
    d = BASE + "_types"
    shutil.rmtree(d, ignore_errors=True)
    write_update_xml(df, d)
    back = load_xml_docs(spark, d, schema="doc_id long, score double")
    r = back.collect()[0]
    assert r["doc_id"] == 7 and r["score"] == 3.5


def test_xml_loader_accepts_add_wrapper(spark):
    d = BASE + "_wrapped"
    shutil.rmtree(d, ignore_errors=True)
    import os

    os.makedirs(d)
    with open(f"{d}/part.xml", "w") as f:
        f.write("<add>\n")
        f.write('<doc><field name="doc_id">11</field><field name="lang">en</field></doc>\n')
        f.write("</add>\n")
    back = load_xml_docs(spark, d, schema="doc_id long, lang string")
    assert [tuple(r) for r in back.collect()] == [(11, "en")]
