"""Query compiler: ParsedQuery → executable DataFrame plan.

The analog of Solr's QParser → Lucene Query → SolrIndexSearcher chain
(``search/QParserPlugin.java`` → ``SolrIndexSearcher.getDocListC``,
SURVEY.md §3.1): the mini ``lucene``-syntax parser's output is compiled
into posting-set algebra over the block index:

- should/must terms → BM25-scored block decode (``score_all``)
- ``AND``/``+`` → conjunction (n_matched == n_terms)
- ``-term`` / ``NOT term`` → anti-join against the prohibited terms'
  doc sets (Solr's prohibited clauses / filter-query exclusion)
- ``field:value`` metadata filters → broadcast-friendly filter on the
  doc registry, applied as a SEMI-join before ranking — the ``fq``
  filter-DocSet intersection (``SolrIndexSearcher.java:1017``): cheap
  column predicates restrict the scored set, never touch scoring
- ``prefix*`` → term-dict expansion (MultiTermQuery rewrite, weight 1)

Filter ordering mirrors Solr's cost model (SURVEY.md §4): metadata
filters and prohibitions are doc-set restrictions applied after the
(already pruned) posting decode but before the global top-k, so the
expensive sort sees the smallest candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solr_spark.query.engine import SearchEngine
from solr_spark.query.extras import _expansion_stats
from solr_spark.query.parser import ParsedQuery, parse_query


def _match_set(engine: SearchEngine, terms: list[str]) -> DataFrame | None:
    """Distinct doc_ids containing ANY of the given raw words (analyzed)."""
    analyzed = [t for w in terms for t in engine.analyze_query(w)]
    stats = engine._term_stats(analyzed)
    if not stats:
        return None
    return engine.score_all(stats).select("doc_id")


def execute_query(
    engine: SearchEngine,
    query: str | ParsedQuery,
    k: int = 10,
    default_mode: str = "OR",
    max_expansions: int = 50,
) -> DataFrame:
    """Compile and run a mini-language query. Returns (doc_id, score f32)
    ranked (score desc, doc_id asc), at most k rows."""
    pq = parse_query(query, default_mode) if isinstance(query, str) else query

    # positive scored terms: bare terms + phrase words (conjunctive in v1)
    words = list(pq.terms) + [w for ph in pq.phrases for w in ph.split()]
    analyzed = [t for w in words for t in engine.analyze_query(w)]
    stats = engine._term_stats(analyzed)
    for pre in pq.prefix_terms:
        stats.extend(_expansion_stats(engine, F.col("term").startswith(pre.lower()), max_expansions))
    # dedupe stats by term (a prefix expansion may repeat a literal term)
    seen: dict[str, object] = {}
    for s in stats:
        seen.setdefault(s.term, s)
    stats = list(seen.values())

    n_required = len(set(analyzed))
    empty = engine.spark.createDataFrame([], "doc_id long, score float")
    if not stats:
        return empty
    if pq.mode == "AND" and len({s.term for s in stats if s.term in analyzed}) < n_required:
        return empty

    agg = engine.score_all(stats)
    if pq.mode == "AND" and n_required > 0:
        # conjunction over the literal (non-expansion) terms
        lit_terms = [s.term for s in stats if s.term in analyzed]
        lit = engine.score_all([s for s in stats if s.term in analyzed]).where(
            F.col("n_terms") >= F.lit(len(lit_terms))
        ).select("doc_id")
        agg = agg.join(lit, "doc_id", "left_semi")

    # prohibited clauses: anti-join their doc sets
    if pq.prohibited:
        bad = _match_set(engine, pq.prohibited)
        if bad is not None:
            agg = agg.join(bad, "doc_id", "left_anti")

    # metadata filters (fq analog): semi-join the doc registry
    if pq.filters:
        docs = engine.index.docs
        cond_df = docs
        for fname, fval in pq.filters.items():
            if fname in docs.columns:
                cond_df = cond_df.where(F.col(fname) == fval)
        agg = agg.join(cond_df.select("doc_id"), "doc_id", "left_semi")

    return (
        agg.select("doc_id", F.col("score_raw").cast("float").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
