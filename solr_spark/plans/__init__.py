from solr_spark.plans.compiler import execute_ast, execute_query

__all__ = ["execute_ast", "execute_query"]
