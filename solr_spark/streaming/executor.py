"""ExecutorStream analog — run a batch of stored query expressions in
parallel.

Reference behavior: ``solrj-streaming io/stream/ExecutorStream.java``
(also ``ExecutorStreamTest.java``): reads tuples carrying a stored
streaming expression in an ``expr_s`` field and executes them
concurrently on a thread pool sized by the ``threads`` parameter,
draining each inner stream.

Spark-first re-expression: instead of a driver-side thread pool, every
stored expression is *compiled* into its lazy DataFrame plan and the
plans are unioned into ONE job. Spark's scheduler then interleaves all
branches' tasks across the cluster — the cluster-wide analog of the
reference's single-node thread pool, with no driver fan-out loop, no
per-expression job overhead, and Catalyst free to share scans between
branches. Result rows are tagged with the originating expression id
(the reference's tuple passthrough).

At 100 TB this shape matters: N stored queries become one DAG whose
stages saturate the executors together, instead of N serial driver
round-trips; a failed branch retries at task granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from solr_spark.plans import execute_query


def executor_stream(
    engine, stored: list[tuple[str, str]], k: int = 10
) -> DataFrame:
    """Execute every ``(expr_id, lucene_query_string)`` in ``stored``
    and return the union tagged by ``query_id``.

    Each expression compiles through the full lucene grammar
    (``solr_spark.query.parser`` → ``plans.compiler``), so boosts,
    boolean nesting, prohibits, field filters and ranges all work
    inside a stored expression, exactly like the reference's inner
    expressions get the full expression language.
    """
    if not stored:
        raise ValueError("executor_stream requires at least one stored expression")
    branches = [
        execute_query(engine, qstr, k=k).select(
            F.lit(qid).alias("query_id"), "doc_id", "score"
        )
        for qid, qstr in stored
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out
