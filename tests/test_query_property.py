"""Property-based grammar test: random boolean trees rendered to lucene
syntax must execute with exact set-algebra semantics (hypothesis-driven,
the reference's randomized-query test style)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from solr_spark.plans import execute_query
from solr_spark.query.engine import SearchEngine

TERMS = ["server", "client", "parse", "json"]


@pytest.fixture(scope="module")
def qengine(index):
    return SearchEngine(index)


@pytest.fixture(scope="module")
def docsets(qengine):
    out = {t: {r["doc_id"] for r in qengine.topk(t, k=10**6).collect()} for t in TERMS}
    out["*"] = {r["doc_id"] for r in qengine.index.docs.select("doc_id").collect()}
    return out


def trees():
    leaf = st.one_of(
        st.sampled_from(TERMS).map(lambda t: ("leaf", t)),
        # constant-score leaf: t^=N matches the same set as t
        st.sampled_from(TERMS).map(lambda t: ("cleaf", t)),
        # match-all leaf: *:* is the full collection
        st.just(("all",)),
    )

    def extend(children):
        return st.one_of(
            st.tuples(st.just("and"), children, children),
            st.tuples(st.just("or"), children, children),
            st.tuples(st.just("diff"), children, children),
            st.tuples(st.just("andnot"), children, children),
            st.tuples(st.just("notand"), children, children),
        )

    return st.recursive(leaf, extend, max_leaves=4)


def render(node) -> str:
    kind = node[0]
    if kind == "leaf":
        return node[1]
    if kind == "cleaf":
        return f"{node[1]}^=0.5"
    if kind == "all":
        return "*:*"
    _, l, r = node
    if kind == "and":
        return f"({render(l)} AND {render(r)})"
    if kind == "or":
        return f"({render(l)} OR {render(r)})"
    if kind == "andnot":  # difference via explicit AND NOT
        return f"({render(l)} AND NOT ({render(r)}))"
    if kind == "notand":  # NOT binds tighter than AND: (NOT r) AND l
        return f"(NOT ({render(r)}) AND {render(l)})"
    return f"({render(l)} -({render(r)}))"


def evaluate(node, docsets) -> set:
    kind = node[0]
    if kind in ("leaf", "cleaf"):
        return docsets[node[1]]
    if kind == "all":
        return docsets["*"]
    _, l, r = node
    a, b = evaluate(l, docsets), evaluate(r, docsets)
    if kind == "and":
        return a & b
    if kind == "or":
        return a | b
    if kind == "andnot" or kind == "diff":
        return a - b
    return a - b  # notand: l minus r (evaluate receives (l, r) swapped in render only)


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tree=trees())
def test_random_boolean_tree_set_semantics(tree, qengine, docsets):
    q = render(tree)
    expect = evaluate(tree, docsets)
    got = {r["doc_id"] for r in execute_query(qengine, q, k=10**6).collect()}
    assert got == expect, q


# ---------------------------------------------------------------------------
# JSON Query DSL round-trip: render AST -> JSON DSL -> parse -> same AST
# ---------------------------------------------------------------------------


def _ast_trees():
    from solr_spark.query.parser import BoolQ, ConstQ, TermQ, WildQ

    leaf = st.one_of(
        st.sampled_from(["alpha", "beta", "gamma"]).map(lambda t: TermQ(t, field="text")),
        st.sampled_from(["al", "be"]).map(lambda p: WildQ(p + "*")),
    )

    def extend(children):
        def mk(parts):
            must, should, must_not, filt = parts
            node = BoolQ(must=list(must), should=list(should), must_not=list(must_not))
            node.must.extend(ConstQ(f, 0.0) for f in filt)
            return node

        lists = st.lists(children, max_size=2)
        return st.tuples(lists, lists, lists, st.lists(children, max_size=1)).map(mk)

    return st.recursive(leaf, extend, max_leaves=8)


def _render_json(node):
    """Inverse of parse_json_query for the node shapes it emits."""
    from solr_spark.query.parser import BoolQ, ConstQ, TermQ, WildQ

    if isinstance(node, TermQ):
        if node.raw:
            return {"term": {"f": node.field, "v": node.text}}
        return {"field": {"f": node.field, "query": node.text}}
    if isinstance(node, WildQ):
        assert node.pattern.endswith("*")
        return {"prefix": {"query": node.pattern[:-1]}}
    if isinstance(node, BoolQ):
        body = {}
        must, filt = [], []
        for m in node.must:
            (filt if isinstance(m, ConstQ) and m.score == 0.0 else must).append(m)
        if must:
            body["must"] = [_render_json(m) for m in must]
        if node.should:
            body["should"] = [_render_json(s) for s in node.should]
        if node.must_not:
            body["must_not"] = [_render_json(s) for s in node.must_not]
        if filt:
            body["filter"] = [_render_json(f.node) for f in filt]
        return {"bool": body}
    raise AssertionError(type(node))


@given(ast=_ast_trees())
@settings(max_examples=200, deadline=None)
def test_json_dsl_roundtrip(ast):
    """parse_json_query(render(ast)) reproduces the AST exactly —
    clause lists, occurs classes, and scoreless-filter wrapping all
    survive the JSON round trip (pure parser property, no Spark)."""
    from solr_spark.query.parser import parse_json_query

    assert parse_json_query(_render_json(ast)) == ast
