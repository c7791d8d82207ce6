"""Relational / analytics operator surface.

Spark-first re-expression of the reference's three analytics layers:

- **facets** (classic + JSON Facet API, ``search/facet/*``,
  ``request/SimpleFacets.java:107``): field/range/pivot facets with the
  agg set of ``search/facet/{Count,Sum,Avg,MinMax,Percentile,...}Agg.java``
  → ``groupBy().agg()`` forms. Distributed partial+refine
  (``FacetFieldMerger.java``) is Catalyst's partial/final aggregation —
  free, no code to write.
- **search components** (``handler/component/``): StatsComponent
  (``StatsValuesFactory.java:52``), CollapsingQParser
  (``CollapsingQParserPlugin.java:122``), ExpandComponent, grouping
  (``search/Grouping.java:73``), TermsComponent (``TermsComponent.java:76``),
  Reciprocal Rank Fusion (``combine/ReciprocalRankFusion.java:37,82-83``).
- **streaming expressions** (``solrj-streaming/.../io/stream/*``,
  registry ``io/Lang.java:338+``): rollup/hashRollup, innerJoin/hashJoin,
  merge, unique, top, having, intersect, complement, cartesianProduct,
  fetch, timeseries, significantTerms, random — each is a documented thin
  composition over DataFrame ops (Solr implements these as pull-based
  TupleStreams because it lacks a dataflow engine; Spark IS one, so the
  right engineering move is delegation, not reimplementation).

Every function returns a lazy DataFrame — Catalyst fuses these into the
surrounding plan (pushdown/pruning/partial agg apply as usual).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "facet_field",
    "json_facet_allbuckets",
    "json_facet_sort_by_stat",
    "facet_range",
    "facet_range_other",
    "facet_field_multiselect",
    "facet_pivot",
    "stats_numeric",
    "collapse",
    "expand",
    "group_topn",
    "top",
    "unique",
    "merge_sorted",
    "rollup",
    "having",
    "intersect_keys",
    "complement_keys",
    "cartesian_product",
    "fetch",
    "timeseries",
    "random_sample",
    "rrf_fuse",
    "significant_terms_stats",
]


# ---------------------------------------------------------------------------
# facets (SimpleFacets / JSON Facet API analogs)
# ---------------------------------------------------------------------------


def facet_field(
    df: DataFrame,
    field: str,
    limit: int = 100,
    mincount: int = 1,
    sort_by_count: bool = True,
    prefix: str | None = None,
    contains: str | None = None,
    offset: int = 0,
    missing: bool = False,
) -> DataFrame:
    """facet.field → (field, count); Solr default sort count desc, index asc
    tie-break (FacetComponent).

    Full classic parameter set (``request/SimpleFacets.java:476-540``):
    ``facet.prefix`` / ``facet.contains`` restrict which buckets are
    counted (applied BEFORE mincount/limit, like the reference's term-enum
    seek); ``facet.offset`` pages into the sorted bucket list;
    ``facet.missing`` appends the count of rows with a NULL field value as
    a NULL-keyed bucket (SimpleFacets.java:529 getFieldMissingCount) —
    ordered last, matching Solr's response placement.

    Bucket predicates and the groupBy stay one shuffle; prefix/contains
    filter BEFORE the aggregation so at scale the shuffle only carries
    matching buckets (and the scan can prune on the pushed predicate).
    """
    c = F.col(field)
    base = df
    if prefix is not None:
        base = base.where(c.startswith(prefix))
    if contains is not None:
        base = base.where(c.contains(contains))
    out = base.where(c.isNotNull()).groupBy(field).agg(F.count("*").alias("count"))
    if mincount > 0:
        out = out.where(F.col("count") >= mincount)
    order = [F.desc("count"), F.asc(field)] if sort_by_count else [F.asc(field)]
    out = out.orderBy(*order)
    if offset:
        out = out.offset(offset)
    out = out.limit(limit)
    if missing:
        miss = df.where(c.isNull()).agg(
            F.lit(None).cast(df.schema[field].dataType).alias(field),
            F.count("*").alias("count"),
        )
        # union AFTER paging: Solr's missing bucket is not subject to
        # limit/offset and always trails the bucket list. Spark gives no
        # order guarantee across a union, so re-sort with an explicit
        # is-missing key to make the trailing placement a real contract.
        out = out.unionByName(miss).orderBy(F.col(field).isNull().asc(), *order)
    return out


def json_facet_sort_by_stat(
    df: DataFrame,
    field: str,
    agg_col: str,
    agg: str = "avg",
    desc: bool = True,
    mincount: int = 1,
    limit: int = 10,
) -> DataFrame:
    """JSON Facet API bucket sort by a nested aggregation
    (``sort: "x desc"`` where ``x`` is a subfacet stat —
    ``search/facet/FacetField.java`` sortVariable / ``FacetFieldProcessor
    .java`` sortAcc; tests ``search/facet/TestJsonFacets.java`` testSort*).

    Distributed note: sorting buckets by a STAT is where Solr needs
    overrequest + a refinement pass (a shard's local top-N by avg can
    miss the global winner — ``FacetFieldMerger``/``FacetRequestSorted``
    refinement). Spark's exact global aggregation makes the result exact
    by construction: one partial+final groupBy, then a total sort of the
    (small) bucket table. No overrequest knob to tune, no approximation.

    Output: (bucket, count, <agg>_<agg_col>) sorted by the stat with
    bucket-value ascending tie-break, Solr's ordering contract.
    """
    fn = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}[agg]
    stat_name = f"{agg}_{agg_col}"
    out = (
        df.groupBy(F.col(field).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.round(fn(F.col(agg_col)).cast("double"), 4).alias(stat_name),
        )
        .where(F.col("count") >= mincount)
    )
    key = F.col(stat_name).desc() if desc else F.col(stat_name).asc()
    return out.orderBy(key, F.col("bucket").asc()).limit(limit)


def json_facet_allbuckets(
    df: DataFrame, field: str, metric: Column, metric_name: str = "metric"
) -> DataFrame:
    """JSON Facet API ``allBuckets:true`` + ``numBuckets:true``
    (``search/facet/FacetFieldProcessor.java`` SpecialSlotAcc allBucketsAcc
    / ``FacetField.java`` numBuckets): ONE row with the bucket count and
    the metrics aggregated across every bucket (regardless of limit).

    One aggregation, no window: numBuckets is countDistinct(field) and the
    allBuckets accumulators fold over all non-null-field rows — exactly the
    reference's special slot that every bucket also adds into."""
    c = F.col(field)
    return df.where(c.isNotNull()).agg(
        F.countDistinct(c).cast("long").alias("num_buckets"),
        F.count("*").cast("long").alias("all_count"),
        metric.alias(metric_name),
    )


def facet_range(
    df: DataFrame, field: str, start: float, end: float, gap: float
) -> DataFrame:
    """facet.range (FacetRangeProcessor.java analog): fixed-width buckets
    over [start, end); returns (bucket_start, count) for non-empty buckets."""
    c = F.col(field)
    bucket = (F.floor((c - F.lit(start)) / F.lit(gap)) * F.lit(gap) + F.lit(start))
    return (
        df.where((c >= start) & (c < end))
        .groupBy(bucket.alias("bucket_start"))
        .agg(F.count("*").alias("count"))
        .orderBy("bucket_start")
    )


def facet_range_other(
    df: DataFrame, field: str, start: float, end: float
) -> DataFrame:
    """``facet.range.other=all`` (FacetRangeProcessor's OTHER enum,
    ``request/SimpleFacets.java`` / ``search/facet/FacetRange.java``):
    the three out-of/in-range counts emitted alongside range buckets —
    ``before`` (< start), ``between`` ([start, end)), ``after`` (>= end).
    ONE aggregation pass (conditional sums), no extra scans."""
    c = F.col(field)
    return df.agg(
        F.sum(F.when(c < start, 1).otherwise(0)).cast("long").alias("before"),
        F.sum(F.when((c >= start) & (c < end), 1).otherwise(0)).cast("long").alias("between"),
        F.sum(F.when(c >= end, 1).otherwise(0)).cast("long").alias("after"),
    )


def facet_field_multiselect(
    df: DataFrame,
    field: str,
    tagged_filters: dict[str, Column],
    exclude_tags: set[str] | None = None,
    limit: int = 100,
) -> DataFrame:
    """Multi-select faceting — ``{!ex=tag}`` / JSON-facet
    ``domain:{excludeTags:[...]}`` (``search/facet/FacetRequest.java``
    domain filters): facet counts computed with every tagged filter
    applied EXCEPT the excluded tags, so a UI filter on a field doesn't
    collapse that field's own facet to one bucket.

    Catalyst still sees one scan + one aggregation; the kept filters are
    pushed predicates."""
    exclude_tags = exclude_tags or set()
    for tag, pred in tagged_filters.items():
        if tag not in exclude_tags:
            df = df.where(pred)
    return facet_field(df, field, limit=limit)


def facet_queries(df: DataFrame, named: dict[str, Column]) -> DataFrame:
    """JSON Facet API ``query`` facets / ``facet.query`` (named filter
    counts, ``search/facet/FacetQuery.java``): one pass computes every
    named predicate's count via conditional aggregation — no per-facet
    re-scan. Returns (facet, count) ordered by facet name."""
    aggs = [
        F.count(F.when(cond, 1)).cast("long").alias(name)
        for name, cond in sorted(named.items())
    ]
    row = df.agg(*aggs)
    pairs = [
        F.struct(F.lit(name).alias("facet"), F.col(name).alias("count"))
        for name in sorted(named)
    ]
    return row.select(F.explode(F.array(*pairs)).alias("x")).select(
        "x.facet", "x.count"
    )


def facet_intervals(
    df: DataFrame, field: str, intervals: list[tuple[str, float | None, float | None, bool, bool]]
) -> DataFrame:
    """Interval facets (``request/IntervalFacets.java``, test
    ``TestIntervalFaceting.java``): arbitrary — possibly OVERLAPPING —
    intervals ``(key, lo, hi, incl_lo, incl_hi)`` with ``None`` as an
    open end (Solr's ``[0,10)`` / ``(10,*]`` syntax). Unlike facet.range
    each value may count into several intervals, so this is ONE pass of
    conditional-count aggregates (map-side combined, no shuffle blowup),
    then a pivot to (interval, count) rows."""
    c = F.col(field)
    aggs = []
    for key, lo, hi, incl_lo, incl_hi in intervals:
        cond = c.isNotNull()
        if lo is not None:
            cond = cond & ((c >= F.lit(lo)) if incl_lo else (c > F.lit(lo)))
        if hi is not None:
            cond = cond & ((c <= F.lit(hi)) if incl_hi else (c < F.lit(hi)))
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(key))
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(F.lit(key).alias("interval"), F.col(key).alias("count"))
            for key, *_ in intervals
        ]
    )
    return row.select(F.explode(pairs).alias("z")).select("z.interval", "z.count")


def json_facet_nested(
    df: DataFrame,
    parent_field: str,
    child_field: str,
    domain_filter: Column | None = None,
    agg_col: str | None = None,
    limit: int = 1000,
) -> DataFrame:
    """JSON Facet API nested subfacet WITH a domain change
    (``search/facet/FacetParser.java:141-225``, ``FacetRequest`` domain;
    tests ``search/facet/TestJsonFacets.java``).

    Field facet on ``parent_field``; each parent bucket carries a nested
    subfacet on ``child_field`` whose DOMAIN is the parent bucket's docs
    intersected with ``domain_filter`` (the ``domain: {filter: …}``
    switch), plus per-child aggs (count + avg of ``agg_col``).

    Output is the flattened bucket tree, one row per (parent, child):
    (parent, parent_count, child, child_count[, avg_<agg_col>]).
    Two partial-agg groupBys + one join on the parent key — no per-bucket
    re-query (Solr computes subfacets per bucket; the single grouped pass
    is the set-oriented equivalent).
    """
    parent = df.groupBy(F.col(parent_field).alias("parent")).agg(
        F.count("*").cast("long").alias("parent_count")
    )
    domain = df.where(domain_filter) if domain_filter is not None else df
    aggs = [F.count("*").cast("long").alias("child_count")]
    if agg_col is not None:
        aggs.append(
            F.round(F.avg(F.col(agg_col)).cast("double"), 4).alias(f"avg_{agg_col}")
        )
    child = domain.groupBy(
        F.col(parent_field).alias("parent"), F.col(child_field).alias("child")
    ).agg(*aggs)
    return (
        parent.join(child, "parent")
        .orderBy("parent", "child")
        .limit(limit)
    )


def facet_pivot(df: DataFrame, fields: list[str], limit: int = 1000) -> DataFrame:
    """facet.pivot (PivotFacetProcessor analog): multi-level counts as a
    flat rollup over the field list, ordered by the field tuple."""
    return (
        df.groupBy(*fields)
        .agg(F.count("*").alias("count"))
        .orderBy(*[F.asc(f) for f in fields])
        .limit(limit)
    )


# ---------------------------------------------------------------------------
# stats / collapse / grouping components
# ---------------------------------------------------------------------------


def stats_numeric(df: DataFrame, field: str) -> DataFrame:
    """StatsComponent (StatsValuesFactory.java:173): min/max/sum/count/
    missing/mean/stddev + approx cardinality (HLL analog)."""
    c = F.col(field)
    return df.agg(
        F.count(c).alias("count"),
        F.count(F.when(c.isNull(), 1)).alias("missing"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.sum(c).alias("sum"),
        F.avg(c).alias("mean"),
        F.stddev_samp(c).alias("stddev"),
        F.approx_count_distinct(c).alias("cardinality"),
        F.sum(c * c).alias("sumsq"),  # JSON Facet sumsq agg
        F.countDistinct(c).alias("countvals_distinct"),  # unique agg (exact)
    )


def relatedness_facet(
    df: DataFrame,
    facet_field_name: str,
    fg_filter: Column,
    min_count: int = 1,
    limit: int = 100,
) -> DataFrame:
    """JSON Facet ``relatedness(fg, bg)`` agg (semantic knowledge graph,
    ``search/facet/RelatednessAgg.java``) — simplified to the normalized
    ratio difference: for each bucket v of ``facet_field_name``,
    ``relatedness = fg_size/fg_total − bg_size/bg_total`` where fg = docs
    matching ``fg_filter`` (the documented popularity-scaling refinement
    is omitted; frozen and mirrored by the oracle). Returns
    (bucket, fg_size, bg_size, relatedness) ordered (relatedness desc,
    bucket)."""
    fld = F.col(facet_field_name)
    agg = df.groupBy(fld.alias("bucket")).agg(
        F.count(F.when(fg_filter, 1)).cast("long").alias("fg_size"),
        F.count("*").cast("long").alias("bg_size"),
    )
    totals = df.agg(
        F.count(F.when(fg_filter, 1)).cast("double").alias("fg_total"),
        F.count("*").cast("double").alias("bg_total"),
    )
    return (
        agg.crossJoin(F.broadcast(totals))
        .where(F.col("fg_size") >= min_count)
        .select(
            "bucket", "fg_size", "bg_size",
            F.round(
                F.col("fg_size") / F.col("fg_total") - F.col("bg_size") / F.col("bg_total"), 6
            ).alias("relatedness"),
        )
        .orderBy(F.desc("relatedness"), F.asc("bucket"))
        .limit(limit)
    )


def unique_block(
    children: DataFrame, facet_col: str, parent_key: str, limit: int = 100
) -> DataFrame:
    """JSON Facet ``uniqueBlock(_root_)`` agg (``search/facet/
    UniqueBlockAgg.java``): per facet bucket of child documents, the
    number of DISTINCT parent blocks represented — the parent-level
    count a child-domain facet needs. One grouped exact countDistinct.
    Returns (bucket, n_children, n_parents) ordered by bucket."""
    return (
        children.groupBy(F.col(facet_col).alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_children"),
            F.countDistinct(parent_key).cast("long").alias("n_parents"),
        )
        .orderBy("bucket")
        .limit(limit)
    )


def block_join_parent(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_parent_key: str,
    child_filter: Column,
    score_mode: str = "count",
    score_col: str | None = None,
) -> DataFrame:
    """Parent block join (``search/join/BlockJoinParentQParserPlugin
    .java`` / Lucene ToParentBlockJoinQuery): parents whose child block
    contains ≥1 child matching ``child_filter``; score aggregates the
    matching children per ScoreMode — the full Lucene set
    (``ScoreMode.{None→count, Total→sum, Max, Min, Avg}``) over
    ``score_col``. One aggregated semi-join — the columnar equivalent
    of Lucene's contiguous parent/child block scan."""
    matched = children.where(child_filter)
    fns = {
        "count": lambda: F.count(F.lit(1)).cast("long"),
        "sum": lambda: F.sum(score_col),
        "total": lambda: F.sum(score_col),
        "max": lambda: F.max(score_col),
        "min": lambda: F.min(score_col),
        "avg": lambda: F.round(F.avg(score_col).cast("double"), 4),
    }
    if score_mode not in fns:
        raise ValueError(f"unknown score_mode {score_mode}")
    agg = matched.groupBy(child_parent_key).agg(fns[score_mode]().alias("score"))
    return parents.join(
        agg.withColumnRenamed(child_parent_key, parent_key), parent_key
    )


def block_join_children(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_parent_key: str,
    parent_filter: Column,
) -> DataFrame:
    """Child block join (``BlockJoinChildQParserPlugin.java`` / Lucene
    ToChildBlockJoinQuery): children whose parent matches — a broadcast
    -friendly semi-join of children against the filtered parent keys."""
    keys = parents.where(parent_filter).select(
        F.col(parent_key).alias(child_parent_key)
    )
    return children.join(keys, child_parent_key, "left_semi")


def child_transform(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_parent_key: str,
    child_value: str,
    child_filter: Column | None = None,
    out_col: str = "children",
) -> DataFrame:
    """``[child]`` doc transformer (``response/transform/
    ChildDocTransformerFactory.java``): each parent row carries its
    nested child values as a sorted array column (the nested-document
    return shape, flattened to one atomic child field so the result is
    engine-comparable). ``child_filter`` is the transformer's
    ``childFilter=`` param.

    One shuffle: children aggregate by parent key (map-side partial
    collect), then join the parents — broadcastable when the parent page
    is small, exactly the response-building case."""
    ch = children
    if child_filter is not None:
        ch = ch.where(child_filter)
    nested = ch.groupBy(F.col(child_parent_key).alias(parent_key)).agg(
        F.sort_array(F.collect_list(child_value)).alias(out_col)
    )
    joined = parents.join(nested, parent_key, "left")
    # parents with no matching children get [] (Solr returns the parent
    # with no child docs, not a null)
    empty = F.array().cast(dict(nested.dtypes)[out_col])
    return joined.withColumn(out_col, F.coalesce(F.col(out_col), empty))


def subquery_transform(
    parents: DataFrame,
    sub: DataFrame,
    parent_key: str,
    sub_key: str,
    order_by: list[Column],
    value_cols: list[str],
    rows: int = 3,
    out_col: str = "subq",
) -> DataFrame:
    """``[subquery]`` doc transformer (``response/transform/
    SubQueryAugmenterFactory.java``, test ``TestSubQueryTransformer.java``):
    each parent row carries the top-``rows`` results of a subquery bound to
    one of its fields (Solr's ``subq.q={!terms f=.. v=$row.<field>}`` with
    ``subq.rows``/``subq.sort``). The binding is the equi-join key; the
    subquery's own sort+limit is a per-key window top-N.

    Each sub-result is flattened to one ``|``-joined string so the nested
    array stays engine-comparable; ``sort_array`` makes the column value
    deterministic. One shuffle for the window + one for the aggregation
    (same key → AQE reuses the partitioning); the parent join broadcasts
    when the parent page is small."""
    w = Window.partitionBy(sub_key).orderBy(*order_by)
    item = F.concat_ws("|", *[F.col(c).cast("string") for c in value_cols])
    top = (
        sub.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= rows)
        .select(F.col(sub_key).alias(parent_key), item.alias("_item"))
    )
    nested = top.groupBy(parent_key).agg(
        F.sort_array(F.collect_list("_item")).alias(out_col)
    )
    joined = parents.join(nested, parent_key, "left")
    empty = F.array().cast("array<string>")
    return joined.withColumn(out_col, F.coalesce(F.col(out_col), empty))


def collapse(df: DataFrame, field: str, order_by: list[Column]) -> DataFrame:
    """CollapsingQParserPlugin (:122): keep one group-head per field value
    under the given sort policy."""
    w = Window.partitionBy(field).orderBy(*order_by)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def expand(df: DataFrame, field: str, order_by: list[Column], rows: int = 5) -> DataFrame:
    """ExpandComponent (ExpandComponent.java:110): rows 2..n+1 per group —
    the docs hidden by collapse."""
    w = Window.partitionBy(field).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") > 1) & (F.col("_rn") <= rows + 1))
        .drop("_rn")
    )


def group_topn(df: DataFrame, field: str, order_by: list[Column], n: int = 2) -> DataFrame:
    """Result grouping (search/Grouping.java:73): top-N docs per group."""
    w = Window.partitionBy(field).orderBy(*order_by)
    return df.withColumn("group_rank", F.row_number().over(w)).where(F.col("group_rank") <= n)


# ---------------------------------------------------------------------------
# streaming-expression analogs (io/stream/*)
# ---------------------------------------------------------------------------


def top(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """rank/top stream (RankStream.java:47) → TakeOrderedAndProject."""
    return df.orderBy(*order_by).limit(k)


def unique(df: DataFrame, keys: list[str]) -> DataFrame:
    """unique stream (UniqueStream.java:44) — dedupe on key columns."""
    return df.dropDuplicates(keys)


def merge_sorted(dfs: list[DataFrame], order_by: list[Column]) -> DataFrame:
    """merge stream (MergeStream.java:41): k-way union + global order."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out.orderBy(*order_by)


def rollup(df: DataFrame, keys: list[str], metrics: dict[str, Column]) -> DataFrame:
    """rollup/hashRollup streams (RollupStream.java:43): groupBy + metrics.
    metrics: output_name → agg Column (count/sum/min/max/avg/stddev/
    percentile_approx — the io/stream/metrics set)."""
    return df.groupBy(*keys).agg(*[m.alias(n) for n, m in metrics.items()])


def having(df: DataFrame, predicate: Column) -> DataFrame:
    """having stream (HavingStream.java:41) — post-agg filter."""
    return df.where(predicate)


def intersect_keys(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """intersect stream (IntersectStream.java:42) → left-semi join."""
    return left.join(right.select(*on).dropDuplicates(on), on, "left_semi")


def complement_keys(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """complement stream (ComplementStream.java:42) → left-anti join."""
    return left.join(right.select(*on).dropDuplicates(on), on, "left_anti")


def cartesian_product(df: DataFrame, array_col: str, out_col: str) -> DataFrame:
    """cartesianProduct stream (CartesianProductStream.java:47) → explode."""
    return df.withColumn(out_col, F.explode(F.col(array_col)))


def fetch(stream: DataFrame, lookup: DataFrame, on: list[str]) -> DataFrame:
    """fetch stream (FetchStream.java:52): enrich by key — broadcast join."""
    return stream.join(F.broadcast(lookup), on, "left")


def timeseries(
    df: DataFrame, ts_col: str, unit: str, metrics: dict[str, Column]
) -> DataFrame:
    """timeseries stream (TimeSeriesStream.java:52): date-bucketed aggs.
    unit: 'day' | 'hour' | 'week' | 'month'."""
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    return df.groupBy(bucket).agg(*[m.alias(n) for n, m in metrics.items()]).orderBy("bucket")


def hash_partition_filter(
    df: DataFrame, key: str, workers: int, worker: int
) -> DataFrame:
    """``{!hash workers=N worker=i}`` (HashQParserPlugin — the filter the
    reference's /export + parallel() uses to split a collection across N
    workers): keep the rows whose hashed key lands in partition
    ``worker``. Deterministic md5-based hash with an exact SQL twin
    (``functions/hashing.py``), so any engine slices identically; the
    predicate is a pure JVM expression the scan evaluates in place."""
    from solr_spark.functions.hashing import md5_long

    h = F.pmod(md5_long(F.col(key).cast("string")), F.lit(workers))
    return df.where(h == F.lit(worker))


def random_hash_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """``random()`` stream (RandomStream / RandomFacadeStream) restated
    deterministically: hash-threshold sampling — keep rows whose md5-hash
    bucket of ``key`` falls below ``fraction``. Unlike rng-based
    ``sample()``, the same rows are picked on ANY engine/partitioning
    (the property that makes sampled pipelines reproducible at 100 TB),
    and the oracle computes the identical set in SQL."""
    from solr_spark.functions.hashing import md5_long

    bucket = F.pmod(md5_long(F.col(key).cast("string")), F.lit(10000))
    # round, don't truncate: 0.29 * 10000 is 2899.999... in binary floats,
    # and int() would silently shift the cutoff by one basis point
    return df.where(bucket < F.lit(int(round(fraction * 10000))))


def stratified_hash_sample(
    df: DataFrame, strata_col: str, key: str, n_per_stratum: int
) -> DataFrame:
    """Balanced training-mix sampler: deterministic top-N per stratum
    (e.g. N docs per language). Rows rank inside their stratum by
    (md5-hash of ``key``, ``key``) — a seedless shuffle-once order that
    picks the SAME rows on any engine/partitioning, like
    ``random_hash_sample``; one window over the strata partitioning."""
    from pyspark.sql import Window

    from solr_spark.functions.hashing import md5_long

    h = md5_long(F.col(key).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def random_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """random stream (RandomStream.java) — seeded sample."""
    return df.sample(fraction=fraction, seed=seed)


def rrf_fuse(rankings: list[DataFrame], id_col: str = "doc_id", k: int = 60, topn: int = 10) -> DataFrame:
    """Reciprocal Rank Fusion (combine/ReciprocalRankFusion.java:82-83):
    each input must have (id_col, rank); fused score = Σ 1/(k + rank)."""
    out = rankings[0].select(id_col, "rank")
    for r in rankings[1:]:
        out = out.unionByName(r.select(id_col, "rank"))
    return (
        out.groupBy(id_col)
        .agg(F.sum(1.0 / (F.lit(k) + F.col("rank"))).alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(topn)
    )


def significant_terms_stats(
    fg_terms: DataFrame, bg_terms: DataFrame, term_col: str = "term", min_df: int = 2
) -> DataFrame:
    """significantTerms stream (SignificantTermsStream.java:55): terms
    over-represented in the foreground doc set vs the corpus background.
    Inputs: (term, df) frames; score = fg_df/bg_df weighted by fg_df."""
    fg = fg_terms.withColumnRenamed("df", "fg_df")
    bg = bg_terms.withColumnRenamed("df", "bg_df")
    return (
        fg.join(bg, term_col)
        .where(F.col("fg_df") >= min_df)
        .withColumn("score", F.col("fg_df") * F.col("fg_df") / F.col("bg_df"))
        .orderBy(F.desc("score"), F.asc(term_col))
    )


# ---------------------------------------------------------------------------
# query-parser analogs: join / graph / frange / cursor / realtime-get
# ---------------------------------------------------------------------------


def join_filter(docs: DataFrame, other: DataFrame, from_col: str, to_col: str) -> DataFrame:
    """``{!join from=.. to=..}`` (JoinQParserPlugin.java / JoinQuery.java):
    keep docs whose ``to_col`` appears among the other set's ``from_col``
    values — a left-semi join (no score join in v1)."""
    keys = other.select(F.col(from_col).alias(to_col)).dropDuplicates([to_col])
    return docs.join(keys, to_col, "left_semi")


def join_score(
    docs: DataFrame,
    scored_from: DataFrame,
    from_col: str,
    to_col: str,
    score_col: str = "score",
    mode: str = "max",
) -> DataFrame:
    """``{!join ... score=max|min|avg|total|none}`` — the score-aware
    cross-core join (ScoreJoinQParserPlugin.java; Lucene
    ``JoinUtil.createJoinQuery`` ScoreMode). The from-side query's
    per-row scores are aggregated per join key and the to-side docs
    carry that aggregate as their score (``none`` keeps filter
    semantics at score 1.0, the plugin's constant-score path).

    One map-side-combined aggregation over the from side (it is the
    query result — small), then a key join into the to side; no
    correlated subquery per doc. The aggregated side is typically
    broadcastable; Spark's AQE decides.
    """
    agg = {
        "max": F.max, "min": F.min, "avg": F.avg, "total": F.sum,
        "none": lambda c: F.lit(1.0),
    }
    if mode not in agg:
        raise ValueError(f"score mode must be one of {sorted(agg)}: {mode!r}")
    keyed = (
        scored_from.groupBy(F.col(from_col).alias(to_col))
        .agg(agg[mode](F.col(score_col)).cast("double").alias("join_score"))
    )
    out_cols = [c for c in docs.columns if c != score_col]
    return docs.select(*out_cols).join(keyed, to_col, "inner")


def graph_traverse(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    start_nodes: list[int],
    max_depth: int,
) -> DataFrame:
    """``{!graph}`` BFS (GraphQParserPlugin.java / GraphQuery.java):
    iterative frontier expansion, returns (node, depth) at FIRST visit
    (min depth), start nodes at depth 0.

    Each hop is one hash join + anti-join against the visited set —
    the standard iterative-join BFS (GraphFrames-style). Frontiers are
    persisted per level so lineage stays shallow.
    """
    spark = edges.sparkSession
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).dropDuplicates()
    visited = spark.createDataFrame(
        [(int(n), 0) for n in start_nodes], "node long, depth int"
    ).persist()
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            e.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"))
            .dropDuplicates(["node"])
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(depth))
            .persist()
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt).persist()
        frontier = nxt
    return visited


def frange_filter(df: DataFrame, func: Column, lower: float, upper: float,
                  out_col: str = "func_value") -> DataFrame:
    """``{!frange l=.. u=..}`` (FunctionRangeQParserPlugin): filter rows by
    a computed function value, keeping the value as a column."""
    return df.withColumn(out_col, func).where(
        (F.col(out_col) >= lower) & (F.col(out_col) <= upper)
    )


def cursor_page(
    df: DataFrame, sort_cols: list[tuple[str, str]], page_size: int,
    after: tuple | None = None,
) -> DataFrame:
    """cursorMark deep paging (search/CursorMark.java:42-54): keyset
    pagination on a total order (last sort key must be unique — Solr
    enforces the uniqueKey tiebreak). ``sort_cols``: [(col, 'asc'|'desc')];
    ``after``: the last row's sort values from the previous page."""
    if after is not None:
        # lexicographic "row > after" predicate over the sort tuple
        clauses = []
        for i in range(len(sort_cols)):
            conj = []
            for j in range(i):
                conj.append(F.col(sort_cols[j][0]) == F.lit(after[j]))
            c, d = sort_cols[i]
            conj.append(F.col(c) < F.lit(after[i]) if d == "desc" else F.col(c) > F.lit(after[i]))
            clause = conj[0]
            for x in conj[1:]:
                clause = clause & x
            clauses.append(clause)
        pred = clauses[0]
        for x in clauses[1:]:
            pred = pred | x
        df = df.where(pred)
    order = [F.desc(c) if d == "desc" else F.asc(c) for c, d in sort_cols]
    return df.orderBy(*order).limit(page_size)


def realtime_get(df: DataFrame, id_col: str, ids: list) -> DataFrame:
    """RealTimeGetComponent analog (batch side): point lookup by ids —
    a pushed-down IN filter (at scale: partition + row-group pruning)."""
    return df.where(F.col(id_col).isin(ids))


def atomic_update(
    current: DataFrame, updates: DataFrame, key: str,
    set_cols: list[str] | None = None, inc_cols: list[str] | None = None,
    add_cols: list[str] | None = None, add_distinct_cols: list[str] | None = None,
    remove_cols: list[str] | None = None, removeregex_cols: list[str] | None = None,
) -> DataFrame:
    """Atomic-update merge (update/processor/AtomicUpdateDocumentMerger
    .java): the batch restatement of MERGE INTO. ``updates`` carries
    (key, [update payload columns...]); semantics per column family:

    - ``set``    — overwrite when an update row exists;
    - ``inc``    — add a numeric delta;
    - ``add``    — append the update's array values to a multivalued
                   column (duplicates kept, Solr ``add``);
    - ``add_distinct`` — append only values not already present
                   (``add-distinct``; duplicates inside the update
                   payload are also collapsed);
    - ``remove`` — drop every occurrence of each listed value
                   (``remove`` — a filter, NOT array_except, which would
                   also dedup the survivors);
    - ``removeregex`` — drop elements matching the update's regex
                   pattern (``removeregex``).

    All pure JVM higher-order array expressions — no Python, no explode."""
    set_cols = set_cols or []
    inc_cols = inc_cols or []
    add_cols = add_cols or []
    add_distinct_cols = add_distinct_cols or []
    remove_cols = remove_cols or []
    removeregex_cols = removeregex_cols or []
    payload = set_cols + inc_cols + add_cols + add_distinct_cols + remove_cols + removeregex_cols
    u = updates.select(F.col(key), *[F.col(c).alias(f"_u_{c}") for c in payload])
    out = current.join(u, key, "left")

    def _u(c):
        return F.col(f"_u_{c}")

    for c in set_cols:
        out = out.withColumn(c, F.coalesce(_u(c), F.col(c)))
    for c in inc_cols:
        out = out.withColumn(c, F.col(c) + F.coalesce(_u(c), F.lit(0)))
    for c in add_cols:
        out = out.withColumn(
            c, F.when(_u(c).isNull(), F.col(c)).otherwise(F.concat(F.col(c), _u(c)))
        )
    for c in add_distinct_cols:
        new_vals = F.array_distinct(
            F.filter(_u(c), lambda x: ~F.array_contains(F.col(c), x))
        )
        out = out.withColumn(
            c, F.when(_u(c).isNull(), F.col(c)).otherwise(F.concat(F.col(c), new_vals))
        )
    for c in remove_cols:
        out = out.withColumn(
            c,
            F.when(_u(c).isNull(), F.col(c)).otherwise(
                F.filter(F.col(c), lambda x: ~F.array_contains(_u(c), x))
            ),
        )
    for c in removeregex_cols:
        out = out.withColumn(
            c,
            F.when(_u(c).isNull(), F.col(c)).otherwise(
                F.filter(F.col(c), lambda x: ~F.regexp_like(x, _u(c)))
            ),
        )
    return out.drop(*[f"_u_{c}" for c in payload])


def export_sorted(df: DataFrame, sort_cols: list[Column], fl: list[str]) -> DataFrame:
    """/export handler (handler/export/ExportWriter.java:92-146): stream
    the ENTIRE result set fully sorted, projecting only requested fields
    (docValues-only in Solr → pure column pruning here). In Spark this is
    a sort + write — range-partitioned total sort, no driver collect."""
    return df.select(*fl).orderBy(*sort_cols)


def facet_heatmap(
    df: DataFrame, x: str, y: str,
    x_start: float, x_end: float, x_gap: float,
    y_start: float, y_end: float, y_gap: float,
) -> DataFrame:
    """facet.heatmap (search/facet/FacetHeatmap.java): 2-D binned counts
    over two numeric columns — one grid group-by (Solr grids geodetic
    space; ours is the generic numeric form)."""
    cx, cy = F.col(x), F.col(y)
    bx = (F.floor((cx - F.lit(x_start)) / F.lit(x_gap)) * F.lit(x_gap) + F.lit(x_start))
    by = (F.floor((cy - F.lit(y_start)) / F.lit(y_gap)) * F.lit(y_gap) + F.lit(y_start))
    return (
        df.where((cx >= x_start) & (cx < x_end) & (cy >= y_start) & (cy < y_end))
        .groupBy(bx.alias("x_bucket"), by.alias("y_bucket"))
        .agg(F.count("*").alias("count"))
        .orderBy("x_bucket", "y_bucket")
    )

def shortest_path(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    from_node: int,
    to_node: int,
    max_depth: int,
) -> DataFrame:
    """shortestPath stream (``solrj-streaming/.../io/graph/
    ShortestPathStream.java:60-120``): BFS from ``from_node`` carrying
    the path itself; returns the single shortest path to ``to_node``
    (ties broken to the lexicographically smallest node sequence, so
    the result is deterministic across engines and partitionings).

    Same iterative hash-join frontier as :func:`graph_traverse`; each
    frontier row carries its path as an ``array<long>`` and the
    per-node dedup is ``min(path)`` — a grouped aggregation, not a
    window — so a hop is one join + one shuffle. The reference runs the
    same level-synchronous join loop against shards
    (ShortestPathStream.java "joinBatchSize"); Spark's shuffle IS that
    join. Frontiers persist per level to keep lineage shallow.
    """
    spark = edges.sparkSession
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).dropDuplicates()
    visited = spark.createDataFrame(
        [(int(from_node), 0, [int(from_node)])],
        "node long, depth int, path array<long>",
    ).persist()
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.concat("path", F.array(F.col("dst"))).alias("path"),
            )
            .groupBy("node")
            .agg(F.min("path").alias("path"))
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(depth))
            .persist()
        )
        if nxt.where(F.col("node") == to_node).limit(1).count() > 0:
            return nxt.where(F.col("node") == to_node).select(
                F.lit(from_node).alias("from_node"),
                F.lit(to_node).alias("to_node"),
                "depth",
                "path",
            )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt.select("node", "depth", "path")).persist()
        frontier = nxt
    return spark.createDataFrame(
        [], "from_node long, to_node long, depth int, path array<long>"
    )


def gather_nodes(
    seeds: DataFrame,
    edges: DataFrame,
    seed_key: str,
    edge_from: str,
    gather_col: str,
    metrics: dict[str, Column] | None = None,
) -> DataFrame:
    """gatherNodes/nodes stream (``solrj-streaming/.../io/graph/
    GatherNodesStream.java``): one breadth-first traversal step — join
    the seed node set to the edge collection on the walk field and
    gather the target field, with the stream's optional per-node
    aggregations (count(*), sum(...)). The seed node set is the small
    side and broadcasts; the edge collection is never collected (the
    reference gathers into a driver-side HashMap — at 100 TB the
    distinct/groupBy shuffle here replaces it)."""
    seed_nodes = seeds.select(F.col(seed_key).alias(edge_from)).distinct()
    j = edges.join(F.broadcast(seed_nodes), edge_from)
    if metrics:
        return j.groupBy(F.col(gather_col).alias("node")).agg(
            *[m.alias(n) for n, m in metrics.items()]
        )
    return j.select(F.col(gather_col).alias("node")).distinct()


def score_nodes(
    nodes_cnt: DataFrame, edges: DataFrame, node_col: str, cnt_col: str = "cnt"
) -> DataFrame:
    """scoreNodes stream (``io/graph/ScoreNodesStream.java``): TF-IDF
    relevance for gathered nodes — traversal count x idf, where df is
    the node's frequency in the FULL edge collection (the stream asks
    the terms component for docFreq). Frozen cross-engine idf:
    ln(1 + N/df), N = collection size. One aggregation for df, a
    1-row broadcast for N, the rest pure JVM expressions."""
    df_tbl = edges.groupBy(F.col(node_col).alias("node")).agg(
        F.count("*").alias("df")
    )
    n_tot = edges.agg(F.count("*").alias("_n"))
    return (
        nodes_cnt.join(df_tbl, "node")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "node",
            cnt_col,
            "df",
            (
                F.col(cnt_col) * F.log(F.lit(1.0) + F.col("_n") / F.col("df"))
            ).alias("score"),
        )
    )


def stats_string(df: DataFrame, field: str) -> DataFrame:
    """StatsComponent over a string field (StatsValuesFactory.java —
    StringStatsValues: count/missing/min/max lexicographic +
    calcdistinct's exact distinctValues count). One aggregate pass."""
    c = F.col(field)
    return df.agg(
        F.count(c).cast("long").alias("count"),
        F.count(F.when(c.isNull(), 1)).cast("long").alias("missing"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.countDistinct(c).cast("long").alias("distinct_values"),
    )


def facet_by_group(
    df: DataFrame, facet_field: str, group_field: str, limit: int = 100
) -> DataFrame:
    """group.facet=true (Grouping.java / TermGroupFacetCollector):
    facet counts computed per distinct GROUP rather than per document —
    a value's count is how many groups contain at least one doc with it.
    One distinct-aggregate shuffle (partial per-partition distinct →
    count distinct group)."""
    return (
        df.where(F.col(facet_field).isNotNull())
        .groupBy(facet_field)
        .agg(F.countDistinct(group_field).cast("long").alias("count"))
        .orderBy(F.desc("count"), F.asc(facet_field))
        .limit(limit)
    )


def sessionize_counts(
    df: DataFrame, user_col: str, ts_col: str, gap: str = "6 hours"
) -> DataFrame:
    """Per-user sessionization — the standard large-scale event-pipeline
    op (beyond the reference; Solr's timeseries() buckets by fixed
    calendar units only). Events of one user belong to the same session
    while each arrives within ``gap`` of the previous one; an event at
    exactly ``prev + gap`` still JOINS the session (verified against
    Spark's merge rule — a new session needs a strictly larger gap). Returns ``(user, n_sessions, n_events)``.

    Uses ``F.session_window`` — Catalyst's native merging session
    aggregation (one shuffle keyed by user, windows merged inside the
    aggregation; no self-join, no per-user collect). The SQL oracle is
    the classic gaps-and-islands formulation over LAG.
    """
    sess = df.groupBy(
        F.col(user_col), F.session_window(F.col(ts_col), gap)
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        sess.groupBy(user_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n").cast("long").alias("n_events"),
        )
        .orderBy(user_col)
    )
