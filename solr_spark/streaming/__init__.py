from solr_spark.streaming.incremental import IncrementalIndexer, stream_directory

__all__ = ["IncrementalIndexer", "stream_directory"]
