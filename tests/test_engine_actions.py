"""Per-query Spark action/job-count guards (VERDICT r4 item 6).

Round 2's bench regression was a driver-round-trip storm — per-term
metadata jobs that multiplied the scheduler job count per query. These
tests pin each headline query shape to its expected job budget so a
future regression of that class fails fast in CI rather than in the
bench. Counted via job groups (``statusTracker``); the budgets allow
the small AQE/scan job splits we measure today but not a per-term loop
(which adds >= len(terms) jobs and grows with the query).

Reference behavior being guarded: SimpleSearch-style one-round-trip
query execution (the reference executes a query as one native scan —
``search/SolrIndexSearcher.java`` — not one pass per term).
"""

from __future__ import annotations

import pytest

from solr_spark.query.engine import SearchEngine


def _job_count(spark, name: str, fn) -> int:
    sc = spark.sparkContext
    sc.setJobGroup(name, name)
    fn()
    sc.setJobGroup("idle", "idle")
    return len(sc.statusTracker().getJobIdsForGroup(name))


@pytest.fixture(scope="module")
def warm(index):
    """One throwaway query absorbs the one-time parquet footer/schema
    jobs so the counted trials measure steady-state query cost."""
    SearchEngine(index).topk("server", k=5).collect()
    return index


def test_or_query_job_budget(warm, spark):
    eng = SearchEngine(warm)
    n = _job_count(spark, "ja_or", lambda: eng.topk("server client", k=10).collect())
    assert 1 <= n <= 3, f"fresh OR query launched {n} jobs (budget 3)"


def test_camel_query_job_budget(warm, spark):
    eng = SearchEngine(warm)
    n = _job_count(spark, "ja_camel", lambda: eng.topk("getUserName", k=10).collect())
    assert 1 <= n <= 3, f"fresh camel query launched {n} jobs (budget 3)"


def test_and_query_job_budget(warm, spark):
    eng = SearchEngine(warm)
    n = _job_count(
        spark, "ja_and", lambda: eng.topk("server client", k=10, mode="AND").collect()
    )
    assert 1 <= n <= 4, f"fresh AND query launched {n} jobs (budget 4)"


def test_theta_seed_job_budget(warm, spark):
    """With block-max pruning forced on, the θ seed adds a bounded number
    of jobs — not one per term or per block."""
    eng = SearchEngine(warm)
    eng._PRUNE_MIN_POSTINGS = 1  # force the prune path at test scale
    n = _job_count(spark, "ja_theta", lambda: eng.topk("server client", k=10).collect())
    assert 1 <= n <= 7, f"θ-pruned OR query launched {n} jobs (budget 7)"


def test_job_count_flat_in_term_count(warm, spark):
    """THE scale invariant: doubling the number of query terms must not
    change the job count (a per-term driver loop would)."""
    e3 = SearchEngine(warm)
    n3 = _job_count(spark, "ja_t3", lambda: e3.topk("server client parse", k=10).collect())
    e6 = SearchEngine(warm)
    n6 = _job_count(
        spark, "ja_t6",
        lambda: e6.topk("server client parse json http import", k=10).collect(),
    )
    assert n6 <= n3, f"6-term query used {n6} jobs vs 3-term {n3} — per-term loop?"


def test_repeat_query_reuses_memoized_stats(warm, spark):
    """A second query on the same engine reuses memoized term stats —
    its job count must not exceed the fresh-query budget."""
    eng = SearchEngine(warm)
    eng.topk("server parse", k=10).collect()
    n = _job_count(spark, "ja_rep", lambda: eng.topk("server json", k=10).collect())
    assert 1 <= n <= 3, f"warm-engine query launched {n} jobs (budget 3)"
