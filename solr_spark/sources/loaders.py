"""Sources / sinks — the ingest-loader and response-writer surface.

The reference dispatches updates by Content-Type to per-format loaders
(``handler/UpdateRequestHandler.java:90-122`` → ``handler/loader/
JsonLoader.java:70,150``, ``CSVLoader.java``, ``XMLLoader.java``) and
serializes results via response writers (``response/*Writer.java``). In
Spark both halves are the DataFrameReader/Writer — these wrappers pin
the engine's frozen conventions (schema-on-read with explicit schema,
UTF-8, header rows, multiline JSON records) so ingest is deterministic
across formats.

The XML loader/writer speak Solr's ``<add><doc><field name=…>`` update
format; parsing uses the stdlib ``xml.etree`` inside an Arrow-batched
``mapInPandas`` (one file per row via ``wholetext``) — no external
spark-xml package. The javabin and CBOR binary formats live in their
own modules (``javabin.py``, ``cbor.py`` — from-scratch codecs with
distributed file readers/writers); the Tika extraction module is out
of scope (SURVEY.md §2.1).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def load_json_docs(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JsonLoader analog: one JSON object per line (Solr's /update/json/docs
    streaming form). Explicit schema recommended — schemaless inference is
    the AddSchemaFieldsUpdateProcessor analog and costs an extra pass."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def load_csv_docs(
    spark: SparkSession, path: str, schema: str | None = None, sep: str = ",", header: bool = True
) -> DataFrame:
    """CSVLoader analog (``handler/loader/CSVLoaderBase.java`` split/header
    options → DataFrameReader csv options)."""
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if schema:
        reader = reader.schema(schema)
    return reader.csv(path)


def write_response_json(df: DataFrame, path: str) -> None:
    """JSONResponseWriter analog: newline-delimited JSON result stream."""
    df.write.mode("overwrite").json(path)


def write_response_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """CSVResponseWriter analog."""
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def _xml_escape(c: Column) -> Column:
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    c = F.regexp_replace(c, ">", "&gt;")
    # numeric entities for newlines keep the one-<doc>-per-text-line layout
    c = F.regexp_replace(c, "\r", "&#13;")
    return F.regexp_replace(c, "\n", "&#10;")


def write_update_xml(df: DataFrame, path: str) -> None:
    """Serialize rows as Solr XML update documents
    (``<add><doc><field name="col">value</field>…``) — the
    XMLResponseWriter / post-tool format. Pure column expressions build
    each ``<doc>`` element (JVM-side, codegen'd); files are text parts
    wrapped by the loader, so no driver-side serialization."""
    fields = [
        F.concat(
            F.lit(f'<field name="{c}">'),
            _xml_escape(F.col(c).cast("string")),
            F.lit("</field>"),
        )
        for c in df.columns
    ]
    doc = F.concat(F.lit("<doc>"), F.concat_ws("", *fields), F.lit("</doc>"))
    df.select(doc.alias("value")).write.mode("overwrite").text(path)


def load_xml_docs(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """XMLLoader analog (``handler/loader/XMLLoader.java:178``): parse
    Solr ``<add><doc><field name=…>`` update XML with the stdlib
    ``xml.etree`` inside Arrow-batched ``mapInPandas`` — each input text
    line holds one ``<doc>`` element (the writer's layout; a full
    ``<add>`` wrapper also parses). ``schema`` fixes output columns and
    types (schemaless inference would be the
    AddSchemaFieldsUpdateProcessor analog)."""
    from pyspark.sql.types import StructType

    target: StructType = (
        schema if isinstance(schema, StructType) else _parse_ddl(spark, schema)
    )
    names = [f.name for f in target.fields]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                line = line.strip()
                if not line or line.startswith("<add") or line.startswith("</add"):
                    continue
                el = ET.fromstring(line)
                docs = [el] if el.tag == "doc" else el.findall(".//doc")
                for d in docs:
                    vals = {f.get("name"): f.text for f in d.findall("field")}
                    rows.append([vals.get(n) for n in names])
            yield pd.DataFrame(rows, columns=names)

    parsed = spark.read.text(path).mapInPandas(
        parse, schema=", ".join(f"{n} string" for n in names)
    )
    return parsed.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in target.fields]
    )


def _parse_ddl(spark: SparkSession, ddl: str):
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(ddl)


def parse_csv_col(df: DataFrame, col: str, schema: str, sep: str = ",") -> DataFrame:
    """parseCSV / parseTSV stream-evaluator analog (solrj-streaming
    ``io/stream/ParseCSVStream`` / ``ParseTSVStream``): parse a CSV-line
    string COLUMN into typed fields with ``from_csv`` — JVM-side, no
    Python, unlike the reference's per-tuple driver parse. ``sep='\\t'``
    is the TSV form. Adds a ``_parsed`` struct column."""
    return df.withColumn("_parsed", F.from_csv(F.col(col), schema, {"sep": sep}))


def json_response_envelope(
    df: DataFrame,
    *,
    start: int = 0,
    rows: int = 10,
    num_found: int | None = None,
    params: dict | None = None,
    q_time_ms: int = 0,
) -> str:
    """JSONResponseWriter analog (``response/JSONResponseWriter.java`` /
    ``JSONWriter.java``): the classic Solr envelope
    ``{"responseHeader":{"status":0,"QTime":…,"params":{…}},
    "response":{"numFound":N,"start":S,"numFoundExact":true,"docs":[…]}}``.

    The reference's writer serializes on ONE node after the distributed
    search ends; same here — ``df`` is the (already ordered) result, the
    page is ``offset(start).limit(rows)`` so only the page crosses to the
    driver. Pass ``num_found`` when the caller already knows it (engines
    do) to avoid the extra count job."""
    import json as _json

    if num_found is None:
        num_found = df.count()
    page = df.offset(start).limit(rows).collect() if start else df.limit(rows).collect()
    envelope = {
        "responseHeader": {
            "status": 0,
            "QTime": int(q_time_ms),
            "params": {k: str(v) for k, v in (params or {}).items()},
        },
        "response": {
            "numFound": int(num_found),
            "start": int(start),
            "numFoundExact": True,
            "docs": [r.asDict(recursive=True) for r in page],
        },
    }
    return _json.dumps(envelope, default=str)


def xml_response_envelope(
    df: DataFrame,
    *,
    start: int = 0,
    rows: int = 10,
    num_found: int | None = None,
    q_time_ms: int = 0,
) -> str:
    """XMLResponseWriter analog (``response/XMLWriter.java:152-164``):
    ``<response><lst name="responseHeader">…</lst>
    <result name="response" numFound=… start=… numFoundExact="true">
    <doc>…</doc></result></response>``. Field elements use Solr's typed
    tags (<int>/<long>/<float>/<double>/<bool>/<str>)."""
    import xml.sax.saxutils as _sx

    if num_found is None:
        num_found = df.count()
    page = df.offset(start).limit(rows).collect() if start else df.limit(rows).collect()

    def field(name, v):
        if isinstance(v, bool):
            tag, s = "bool", str(v).lower()
        elif isinstance(v, int):
            tag, s = "long", str(v)
        elif isinstance(v, float):
            tag, s = "double", repr(v)
        else:
            tag, s = "str", _sx.escape(str(v))
        return f'<{tag} name="{_sx.escape(str(name))}">{s}</{tag}>'

    docs = "".join(
        "<doc>" + "".join(field(k, v) for k, v in r.asDict().items()) + "</doc>"
        for r in page
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?><response>'
        '<lst name="responseHeader"><int name="status">0</int>'
        f'<int name="QTime">{int(q_time_ms)}</int></lst>'
        f'<result name="response" numFound="{int(num_found)}" start="{int(start)}"'
        ' numFoundExact="true">' + docs + "</result></response>"
    )


def geojson_response(
    df: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    *,
    rows: int = 10,
) -> str:
    """GeoJSONResponseWriter analog (``response/GeoJSONResponseWriter.java``
    / ``GeoJSONWriter.java:40-75``): serialize the result page as an RFC
    7946 FeatureCollection — one Feature per doc, ``geometry`` a Point of
    ``[lon, lat]`` (GeoJSON axis order), every other column under
    ``properties``.

    Like the reference's writer, serialization happens on ONE node after
    the distributed search: only the page (``limit(rows)``) crosses to the
    driver."""
    import json as _json

    page = df.limit(rows).collect()
    feats = []
    for r in page:
        d = r.asDict(recursive=True)
        lat, lon = d.pop(lat_col), d.pop(lon_col)
        feats.append(
            {
                "type": "Feature",
                "geometry": {"type": "Point", "coordinates": [lon, lat]},
                "properties": d,
            }
        )
    return _json.dumps({"type": "FeatureCollection", "features": feats}, default=str)


def parse_geojson_response(spark: SparkSession, payload: str, schema: str) -> DataFrame:
    """Inverse of :func:`geojson_response` — re-ingest a FeatureCollection
    page as rows (lat/lon rebuilt from the Point geometry, properties
    flattened). ``schema`` is the output DDL and must name ``lat`` and
    ``lon``."""
    import json as _json

    obj = _json.loads(payload)
    rows = []
    for f in obj["features"]:
        lon, lat = f["geometry"]["coordinates"]
        rows.append({"lat": lat, "lon": lon, **f["properties"]})
    return spark.createDataFrame(rows, schema=schema)


def graphml_response(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst", *, limit: int = 100000
) -> str:
    """GraphMLResponseWriter analog (``response/GraphMLResponseWriter.java:
    45-120``): serialize a traversal result (e.g. ``gatherNodes`` output)
    as GraphML — ``<node id=…/>`` for every distinct vertex, ``<edge
    source=… target=…/>`` per edge. The reference streams the traversal's
    tuples through one writer; same single-node serialization here, over
    the collected edge page."""
    import xml.sax.saxutils as _sx

    rows = edges.select(src_col, dst_col).limit(limit).collect()
    nodes: dict[str, None] = {}
    for r in rows:
        nodes.setdefault(str(r[0]), None)
        nodes.setdefault(str(r[1]), None)
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">'
        '<graph id="G" edgedefault="directed">'
    ]
    parts += [f'<node id={_sx.quoteattr(n)}/>' for n in nodes]
    parts += [
        f'<edge source={_sx.quoteattr(str(r[0]))} target={_sx.quoteattr(str(r[1]))}/>'
        for r in rows
    ]
    parts.append("</graph></graphml>")
    return "".join(parts)


def parse_graphml_response(spark: SparkSession, payload: str) -> DataFrame:
    """Inverse of :func:`graphml_response`: parse the GraphML back into an
    edge DataFrame ``(src string, dst string)`` via stdlib etree (no
    external xml package, mirroring ``load_xml_docs``)."""
    import xml.etree.ElementTree as ET

    ns = "{http://graphml.graphdrawing.org/xmlns}"
    root = ET.fromstring(payload)
    rows = [
        {"src": e.get("source"), "dst": e.get("target")}
        for e in root.iter(f"{ns}edge")
    ]
    return spark.createDataFrame(rows, schema="src string, dst string")


def load_external_floats(
    spark: SparkSession,
    path: str,
    key_col: str = "doc_id",
    val_col: str = "ext_val",
) -> DataFrame:
    """ExternalFileField's keyed float file — modeled on historical
    Solr semantics (the feature was removed from the pinned reference
    tree; VersionedFile + FileFloatSource in earlier Solr): one
    ``key=value`` per line, ``#`` comments and malformed lines skipped.
    Like VersionedFile, only the NEWEST ``external_<field>.*`` file (max
    sorted name) is read — earlier files are ignored entirely, not
    merged. Within that file, when a key repeats the LAST line wins
    (top-to-bottom read, later entries overwrite). Returns ``(key_col
    long, val_col double)`` for use as a function-query operand (the
    classic external page-rank / CTR boost).

    Read shape: ``wholetext`` loads each file as ONE row, so line order
    is exact by construction (``posexplode`` position), independent of
    ``spark.sql.files.maxPartitionBytes`` or split packing — the
    monotonically_increasing_id byte-order caveat is gone. Keyed float
    files are small by contract (Solr materializes them as an in-heap
    float[] per reader anyway), so one-row-per-file is safe; the parse
    and last-wins aggregation stay distributed.
    """
    files = (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(path)
        .select(F.input_file_name().alias("fname"), "value")
    )
    # VersionedFile: only the max-sorted-name file counts (tiny sort —
    # one row per file).
    newest = files.orderBy(F.col("fname").desc()).limit(1)
    lines = newest.select(
        F.posexplode(F.split("value", "\n")).alias("seq", "line")
    )
    parsed = (
        lines.where(~F.col("line").startswith("#"))
        .select(
            "seq",
            F.regexp_extract("line", r"^\s*(-?\d+)=(-?\d+(?:\.\d+)?)\s*$", 1).alias("k"),
            F.regexp_extract("line", r"^\s*(-?\d+)=(-?\d+(?:\.\d+)?)\s*$", 2).alias("v"),
        )
        .where(F.col("k") != "")
    )
    return (
        parsed.groupBy(F.col("k").cast("long").alias(key_col))
        .agg(F.max(F.struct("seq", "v")).alias("last"))
        .select(key_col, F.col("last.v").cast("double").alias(val_col))
    )
