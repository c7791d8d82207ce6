from solr_spark.sources.cbor import cbor_decode, cbor_encode, load_cbor, write_cbor
from solr_spark.sources.javabin import (
    JavaBinDecoder,
    JavaBinEncoder,
    load_javabin,
    write_javabin,
)
from solr_spark.sources.loaders import (
    geojson_response,
    graphml_response,
    load_csv_docs,
    load_json_docs,
    load_xml_docs,
    parse_geojson_response,
    parse_graphml_response,
    write_response_csv,
    write_response_json,
    write_update_xml,
)

__all__ = [
    "load_json_docs",
    "load_csv_docs",
    "load_xml_docs",
    "write_response_json",
    "write_response_csv",
    "write_update_xml",
    "geojson_response",
    "parse_geojson_response",
    "graphml_response",
    "parse_graphml_response",
    "JavaBinEncoder",
    "JavaBinDecoder",
    "load_javabin",
    "write_javabin",
    "cbor_encode",
    "cbor_decode",
    "load_cbor",
    "write_cbor",
]
