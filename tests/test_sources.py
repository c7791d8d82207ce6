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


# ---------------------------------------------------------------------------
# javabin — pure-codec vectors + distributed roundtrip
# ---------------------------------------------------------------------------


def test_javabin_codec_wire_vectors():
    """Byte-level pins against JavaBinCodec's documented layout
    (writeTag/writeInt/writeStr, JavaBinCodec.java:663,1167)."""
    from solr_spark.sources import JavaBinDecoder, JavaBinEncoder

    # SINT packing: 7 -> one byte (2<<5)|7 = 0x47
    e = JavaBinEncoder(); e.write_int(7)
    assert bytes(e._buf) == bytes([0x47])
    # SINT with continuation: 300 = 0x12C -> low4=0xC, flag 0x10, vint(300>>4=18)
    e = JavaBinEncoder(); e.write_int(300)
    assert bytes(e._buf) == bytes([(2 << 5) | 0x10 | 0x0C, 18])
    # negative int -> tag INT + 4-byte BE
    e = JavaBinEncoder(); e.write_int(-2)
    assert bytes(e._buf) == bytes([6, 0xFF, 0xFF, 0xFF, 0xFE])
    # STR size in UTF-8 bytes: 'é' is 2 bytes -> tag (1<<5)|2
    e = JavaBinEncoder(); e.write_str("é")
    assert bytes(e._buf) == bytes([(1 << 5) | 2, 0xC3, 0xA9])
    # size >= 0x1f escapes to vint continuation
    s = "x" * 40
    e = JavaBinEncoder(); e.write_str(s)
    assert bytes(e._buf)[:2] == bytes([(1 << 5) | 0x1F, 40 - 0x1F]) and len(e._buf) == 42

    def rt(v):
        enc = JavaBinEncoder()
        enc._buf.append(2)  # version
        enc.write_val(v)
        return JavaBinDecoder(bytes(enc._buf)).unmarshal()

    for v in [None, True, False, 0, 7, -7, 2**40, -(2**40), 3.25, "héllo",
              b"\x00\x01", [1, "a", None], {"k": [1.5, "v"]}]:
        got = rt(v)
        if isinstance(v, dict):
            assert got == v
        else:
            assert got == v and type(got) is type(v) or got == v


def test_javabin_extern_string_interning():
    """Repeated map keys write once, then back-reference (EXTERN_STRING)."""
    from solr_spark.sources import JavaBinDecoder, JavaBinEncoder

    docs = [{"doc_id": i, "lang": "en"} for i in range(50)]
    payload = JavaBinEncoder().marshal_doc_list(docs)
    # 'doc_id' (6 chars) appears once as raw bytes in the whole stream
    assert payload.count(b"doc_id") == 1 and payload.count(b"lang") == 1
    back = JavaBinDecoder(payload).unmarshal()
    assert back["numFound"] == 50 and back["docs"] == docs


def test_javabin_spark_roundtrip(spark):
    import shutil

    from solr_spark.sources import load_javabin, write_javabin

    d = "/tmp/solr_spark_javabin_test"
    shutil.rmtree(d, ignore_errors=True)
    df = spark.createDataFrame(
        [(1, "en", 3.5, None), (2, None, -0.25, 42), (3, "zh", 0.0, 7)],
        "doc_id long, lang string, score double, n int",
    ).repartition(2)
    write_javabin(df, d)
    back = load_javabin(spark, d, "doc_id long, lang string, score double, n int")
    got = sorted([tuple(r) for r in back.collect()])
    assert got == [(1, "en", 3.5, None), (2, None, -0.25, 42), (3, "zh", 0.0, 7)]


# ---------------------------------------------------------------------------
# CBOR — RFC 8949 vectors + distributed roundtrip
# ---------------------------------------------------------------------------


def test_cbor_rfc8949_vectors():
    """Appendix-A test vectors from RFC 8949 (public spec)."""
    from solr_spark.sources import cbor_decode, cbor_encode

    vectors = [
        (0, "00"), (1, "01"), (10, "0a"), (23, "17"), (24, "1818"),
        (100, "1864"), (1000, "1903e8"), (1000000, "1a000f4240"),
        (-1, "20"), (-10, "29"), (-100, "3863"),
        ("a", "6161"), ("IETF", "6449455446"),
        (True, "f5"), (False, "f4"),
    ]
    for v, hexs in vectors:
        assert cbor_encode(v).hex() == hexs, v
        assert cbor_decode(bytes.fromhex(hexs)) == v, v
    assert cbor_encode(None).hex() == "f6" and cbor_decode(b"\xf6") is None
    assert cbor_encode([1, [2, 3], [4, 5]]).hex() == "8301820203820405"
    assert cbor_decode(bytes.fromhex("8301820203820405")) == [1, [2, 3], [4, 5]]
    assert cbor_encode({"a": 1, "b": [2, 3]}).hex() == "a26161016162820203"
    assert cbor_decode(bytes.fromhex("a26161016162820203")) == {"a": 1, "b": [2, 3]}
    assert cbor_encode(1.1).hex() == "fb3ff199999999999a"
    assert cbor_decode(bytes.fromhex("fb3ff199999999999a")) == 1.1
    # float16 decode path (spec-legal input we never emit)
    assert cbor_decode(bytes.fromhex("f93c00")) == 1.0


def test_cbor_spark_roundtrip(spark):
    import shutil

    from solr_spark.sources import load_cbor, write_cbor

    d = "/tmp/solr_spark_cbor_test"
    shutil.rmtree(d, ignore_errors=True)
    df = spark.createDataFrame(
        [(1, "en", 3.5), (2, None, -0.25), (3, "zh", 0.0)],
        "doc_id long, lang string, score double",
    ).repartition(2)
    write_cbor(df, d)
    back = load_cbor(spark, d, "doc_id long, lang string, score double")
    got = sorted([tuple(r) for r in back.collect()])
    assert got == [(1, "en", 3.5), (2, None, -0.25), (3, "zh", 0.0)]


def test_json_response_envelope(spark):
    from solr_spark.sources.loaders import json_response_envelope
    import json

    df = spark.createDataFrame(
        [(1, "a", 0.5), (2, "b", 0.25), (3, "c", 0.125)],
        "doc_id long, lang string, score double",
    ).orderBy("doc_id")
    out = json.loads(
        json_response_envelope(df, rows=2, params={"q": "text:a", "rows": 2})
    )
    assert out["responseHeader"]["status"] == 0
    assert out["responseHeader"]["params"]["q"] == "text:a"
    r = out["response"]
    assert r["numFound"] == 3 and r["start"] == 0 and r["numFoundExact"] is True
    assert [d["doc_id"] for d in r["docs"]] == [1, 2]
    # paging: start=1 returns the middle page, numFound passed through
    out2 = json.loads(json_response_envelope(df, start=1, rows=1, num_found=3))
    assert [d["doc_id"] for d in out2["response"]["docs"]] == [2]


def test_xml_response_envelope(spark):
    from solr_spark.sources.loaders import xml_response_envelope
    import xml.etree.ElementTree as ET

    df = spark.createDataFrame(
        [(1, "a<b&c", True), (2, "plain", False)],
        "doc_id long, title string, flag boolean",
    ).orderBy("doc_id")
    xml = xml_response_envelope(df, rows=10)
    root = ET.fromstring(xml)
    result = root.find("result")
    assert result.get("numFound") == "2" and result.get("numFoundExact") == "true"
    docs = result.findall("doc")
    assert len(docs) == 2
    first = {f.get("name"): (f.tag, f.text) for f in docs[0]}
    assert first["doc_id"] == ("long", "1")
    assert first["title"] == ("str", "a<b&c")  # escaped then parsed back
    assert first["flag"] == ("bool", "true")


def test_geojson_response_roundtrip(spark):
    from solr_spark.sources import geojson_response, parse_geojson_response

    df = spark.createDataFrame(
        [(1, 40.5, -73.25, 'quote"d'), (2, -12.0, 170.125, "plain")],
        "doc_id long, lat double, lon double, label string",
    )
    payload = geojson_response(df.orderBy("doc_id"), "lat", "lon", rows=10)
    import json

    obj = json.loads(payload)
    assert obj["type"] == "FeatureCollection"
    f0 = obj["features"][0]
    # GeoJSON axis order is [lon, lat] (RFC 7946 §3.1.1)
    assert f0["geometry"]["coordinates"] == [-73.25, 40.5]
    assert f0["properties"] == {"doc_id": 1, "label": 'quote"d'}
    back = parse_geojson_response(
        spark, payload, "lat double, lon double, doc_id long, label string"
    )
    rows = {r["doc_id"]: r for r in back.collect()}
    assert rows[2]["lon"] == 170.125 and rows[1]["label"] == 'quote"d'


def test_graphml_response_roundtrip(spark):
    from solr_spark.sources import graphml_response, parse_graphml_response

    edges = spark.createDataFrame(
        [("a<1", "b&2"), ("a<1", 'c"3'), ("b&2", "c\"3")], "src string, dst string"
    )
    payload = graphml_response(edges)
    assert payload.startswith('<?xml version="1.0"')
    back = parse_graphml_response(spark, payload)
    got = {(r["src"], r["dst"]) for r in back.collect()}
    assert got == {("a<1", "b&2"), ("a<1", 'c"3'), ("b&2", 'c"3')}
    # node list is deduped: 3 distinct vertices despite 6 endpoint slots
    assert payload.count("<node ") == 3


def test_load_external_floats_last_wins(spark, tmp_path):
    """ExternalFileField file parse: key=value lines, # comments and
    malformed lines skipped, repeated key -> LAST value wins
    (FileFloatSource.java read order)."""
    from solr_spark.sources.loaders import load_external_floats

    p = tmp_path / "external_rank.txt"
    p.write_text(
        "# comment line\n"
        "1=0.5\n"
        "2=1.25\n"
        "garbage line\n"
        "3=oops\n"
        "1=9.0\n"
        "-4=-2.5\n"
    )
    got = {
        r["doc_id"]: r["ext_val"]
        for r in load_external_floats(spark, str(p)).collect()
    }
    assert got == {1: 9.0, 2: 1.25, -4: -2.5}


def test_load_external_floats_newest_file_only(spark, tmp_path):
    """Across several external_* files, ONLY the newest sorted-name
    file is read (VersionedFile semantics) — earlier files are ignored
    entirely, not merged, regardless of file sizes."""
    from solr_spark.sources.loaders import load_external_floats

    # earlier-named file is made LARGER so size-ordered split packing
    # would pick it if the implementation ignored file names
    (tmp_path / "external_rank.00").write_text(
        "1=0.5\n2=1.0\n" + "\n".join(f"{i}=0.1" for i in range(100, 400)) + "\n"
    )
    (tmp_path / "external_rank.01").write_text("1=9.0\n5=2.0\n")
    got = {
        r["doc_id"]: r["ext_val"]
        for r in load_external_floats(spark, str(tmp_path)).collect()
    }
    # newest file wins; keys present only in older files do NOT survive
    assert got == {1: 9.0, 5: 2.0}


def test_load_external_floats_order_survives_tiny_splits(spark, tmp_path):
    """Intra-file last-wins must be exact even when the file would be
    split by a tiny maxPartitionBytes — wholetext makes line order
    positional, not split-dependent."""
    from solr_spark.sources.loaders import load_external_floats

    p = tmp_path / "external_rank.txt"
    p.write_text(
        "\n".join(f"7={i / 10.0}" for i in range(500)) + "\n7=99.5\n"
    )
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128")
    try:
        got = {
            r["doc_id"]: r["ext_val"]
            for r in load_external_floats(spark, str(p)).collect()
        }
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert got == {7: 99.5}
