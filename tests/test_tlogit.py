"""tlogit convergence gate: full-batch GD must recover a planted signal
(the reference's TestTextLogisticRegressionQParserPlugin trains on a
labeled split and asserts classification; iterative training has no SQL
oracle, so this pytest IS the correctness gate)."""

from pyspark.sql import functions as F

from solr_spark.analysis import CODE_CHAIN
from solr_spark.tlogit import tlogit_classify, tlogit_train


def test_tlogit_recovers_planted_signal(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    label = F.array_contains(CODE_CHAIN.tokens("text"), "customer")
    terms = ["customer", "merge", "join"]
    w = tlogit_train(docs, "text", label, terms, iters=25, lr=1.0)
    # the planted feature must dominate the decoys
    assert w[1] > 0.5, w
    assert w[1] > abs(w[2]) * 2 and w[1] > abs(w[3]) * 2, w

    scored = tlogit_classify(
        docs.withColumn("y", label.cast("int")), "text", w, terms, keep_cols=["doc_id", "y"]
    )
    agg = scored.select((F.col("predicted") == F.col("y")).cast("int").alias("ok")).agg(
        F.avg("ok").alias("acc")
    ).collect()[0]
    assert agg["acc"] >= 0.9, agg["acc"]
