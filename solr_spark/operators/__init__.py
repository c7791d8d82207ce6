from solr_spark.operators.relational import *  # noqa: F401,F403
