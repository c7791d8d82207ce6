from solr_spark.sources.loaders import (
    load_csv_docs,
    load_json_docs,
    load_xml_docs,
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
]
