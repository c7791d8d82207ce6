"""Rank-identity of the distributed engine vs the brute-force oracle —
the control-vs-distributed diff pattern of BaseDistributedSearchTestCase."""

import numpy as np
import pytest

from solr_spark.query.engine import SearchEngine
from solr_spark.query.parser import parse_query
from solr_spark.queryset import make_query_set


@pytest.fixture(scope="module")
def engine(index):
    return SearchEngine(index)


def _assert_rank_identical(engine, oracle, query, mode, k=10):
    got = engine.topk(query, k=k, mode=mode).collect()
    exp = oracle.topk(query, k=k, mode=mode)
    got_ids = [r["doc_id"] for r in got]
    exp_ids = list(exp["doc_id"])
    assert got_ids == exp_ids, f"{query!r} ({mode}): {got_ids} != {exp_ids}"
    for r, es in zip(got, exp["score"]):
        assert abs(r["score"] - float(es)) <= 1e-5 * max(1.0, abs(es)), query


def test_single_hot_term(engine, oracle):
    _assert_rank_identical(engine, oracle, "import", "OR")


def test_single_mid_term(engine, oracle):
    _assert_rank_identical(engine, oracle, "config", "OR")


def test_camel_case_query_analysis(engine, oracle):
    _assert_rank_identical(engine, oracle, "getUserName", "OR")


def test_and_query(engine, oracle):
    _assert_rank_identical(engine, oracle, "server client", "AND")


def test_or_query(engine, oracle):
    _assert_rank_identical(engine, oracle, "http server json", "OR")


def test_duplicate_query_terms_weighting(engine, oracle):
    _assert_rank_identical(engine, oracle, "value value config", "OR")


def test_zero_hit(engine, oracle):
    assert engine.topk("zzzznotaterm", 10).count() == 0


def test_and_with_missing_term_is_empty(engine, oracle):
    assert engine.topk("config zzzznotaterm", 10, mode="AND").count() == 0


def test_full_query_set_rank_identity(engine, oracle, index):
    """The headline gate: full FIXTURES-style query set, rank-identical."""
    term_df = index.term_dict.select("term", "df").toPandas()
    qs = make_query_set(term_df)
    assert len(qs) == 100
    failures = []
    for row in qs.itertuples():
        got = engine.topk(row.query, k=row.k, mode=row.mode).collect()
        exp = oracle.topk(row.query, k=row.k, mode=row.mode)
        if [r["doc_id"] for r in got] != list(exp["doc_id"]):
            failures.append((row.query_id, row.query, row.mode))
    assert not failures, f"rank mismatches: {failures}"


def test_pruning_matches_exact(engine, oracle):
    """Block-max pruned results must equal unpruned (rank-safety proof)."""
    for q, mode in [("import", "OR"), ("config", "OR"), ("server client", "AND"),
                    ("parse json http", "AND"),
                    # OR-mode Block-Max WAND: rare+hot mixes where pruning bites
                    ("import config", "OR"), ("server client parse", "OR"),
                    ("import import config", "OR")]:  # duplicate-term weights
        pruned = [(r["doc_id"], r["score"]) for r in engine.topk(q, 10, mode, prune=True).collect()]
        exact = [(r["doc_id"], r["score"]) for r in engine.topk(q, 10, mode, prune=False).collect()]
        assert pruned == exact, q


def test_topk_with_fields(engine):
    rows = engine.topk_with_fields("import", k=5).collect()
    assert len(rows) == 5
    assert {"repo", "path", "lang", "score"} <= set(rows[0].asDict())


def test_randomized_queries_property(engine, oracle, index):
    """Seeded property-style randomized queries (reference's randomized
    test style): random 1-3 term queries, random mode."""
    rng = np.random.default_rng(1234)
    terms = [r["term"] for r in index.term_dict.sample(0.2, seed=7).limit(60).collect()]
    for _ in range(15):
        n = int(rng.integers(1, 4))
        q = " ".join(terms[i] for i in rng.integers(0, len(terms), n))
        mode = "AND" if rng.random() < 0.5 else "OR"
        _assert_rank_identical(engine, oracle, q, mode)


def test_parser_basics():
    p = parse_query("foo bar")
    assert p.terms == ["foo", "bar"] and p.mode == "OR"
    p = parse_query("foo AND bar")
    assert p.mode == "AND"
    p = parse_query('lang:python "exact phrase" -bad baz*')
    assert p.filters == {"lang": "python"}
    assert p.phrases == ["exact phrase"]
    assert p.prohibited == ["bad"]
    assert p.prefix_terms == ["baz"]
