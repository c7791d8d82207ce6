from solr_spark.streaming.incremental import IncrementalIndexer, stream_directory
from solr_spark.streaming.windows import run_windowed_stream, windowed_agg

__all__ = [
    "IncrementalIndexer",
    "stream_directory",
    "windowed_agg",
    "run_windowed_stream",
]
