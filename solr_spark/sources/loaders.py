"""Sources / sinks — the ingest-loader and response-writer surface.

The reference dispatches updates by Content-Type to per-format loaders
(``handler/UpdateRequestHandler.java:90-122`` → ``handler/loader/
JsonLoader.java:70,150``, ``CSVLoader.java``) and serializes results via
response writers (``response/*Writer.java``). In Spark both halves are
the DataFrameReader/Writer — these wrappers pin the engine's frozen
conventions (schema-on-read with explicit schema, UTF-8, header rows,
multiline JSON records) so ingest is deterministic across formats.

Javabin/CBOR loaders are n/a (Parquet/Iceberg is the native binary
path); the Tika extraction module is out of scope (SURVEY.md §2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


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
