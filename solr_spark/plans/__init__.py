from solr_spark.plans.compiler import execute_query

__all__ = ["execute_query"]
