"""join / graph / cursor / atomic / export operators — invariant tests
(cross-engine goldens run in scripts/check_entry.py)."""

import pytest
from pyspark.sql import functions as F

from solr_spark.operators.relational import (
    atomic_update,
    cursor_page,
    export_sorted,
    frange_filter,
    graph_traverse,
    join_filter,
    realtime_get,
)


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [(i, f"p{i}", i % 5, float(i * 10)) for i in range(50)],
        "id long, name string, grp long, val double",
    )


def test_join_filter_semi_semantics(spark, people):
    other = spark.createDataFrame([(0,), (1,), (0,)], "g long")
    out = join_filter(people, other, "g", "grp").collect()
    assert {r["grp"] for r in out} == {0, 1}
    assert len(out) == 20  # no row duplication from duplicate keys (semi join)


def test_graph_traverse_bfs_depths(spark):
    # path graph 1→2→3→4 plus a shortcut 1→3: depth(3) must be 1 (min)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3)], "src long, dst long"
    )
    got = {r["node"]: r["depth"] for r in graph_traverse(edges, "src", "dst", [1], 3).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}


def test_graph_traverse_depth_cap(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(10)], "src long, dst long")
    got = graph_traverse(edges, "src", "dst", [0], 2).collect()
    assert {r["node"] for r in got} == {0, 1, 2}


def test_cursor_pages_partition_the_result(people):
    sort = [("val", "desc"), ("id", "asc")]
    seen, after = [], None
    for _ in range(5):
        page = cursor_page(people, sort, page_size=10, after=after).collect()
        seen.extend((r["id"]) for r in page)
        last = page[-1]
        after = (last["val"], last["id"])
    full = [r["id"] for r in people.orderBy(F.desc("val"), F.asc("id")).collect()]
    assert seen == full  # pages concatenate to the full sorted stream


def test_atomic_update_set_and_inc(spark, people):
    updates = spark.createDataFrame([(1, "X", 5.0), (3, "Y", -2.0)], "id long, name string, val double")
    out = {r["id"]: r for r in atomic_update(people, updates, "id", ["name"], ["val"]).collect()}
    assert out[1]["name"] == "X" and out[1]["val"] == 15.0
    assert out[3]["name"] == "Y" and out[3]["val"] == 28.0
    assert out[2]["name"] == "p2" and out[2]["val"] == 20.0  # untouched


def test_frange_and_realtime_get(people):
    fr = frange_filter(people, F.col("val") / 100.0, 0.1, 0.2).collect()
    assert {r["id"] for r in fr} == {1, 2}
    rg = realtime_get(people, "id", [7, 9]).collect()
    assert {r["id"] for r in rg} == {7, 9}


def test_export_sorted_is_total_order(people):
    rows = export_sorted(people, [F.desc("val"), F.asc("id")], ["id", "val"]).collect()
    vals = [r["val"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert len(rows) == 50
    assert rows[0].asDict().keys() == {"id", "val"}  # column pruning honored


def test_shortest_path_lex_min_and_depth(spark):
    from solr_spark.operators.relational import shortest_path

    # 1 -> {2,3} -> 4 ; two shortest paths, [1,2,4] < [1,3,4]
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)], "src long, dst long"
    )
    got = shortest_path(edges, "src", "dst", 1, 4, max_depth=4).collect()
    assert len(got) == 1
    assert got[0]["depth"] == 2
    assert got[0]["path"] == [1, 2, 4]


def test_shortest_path_unreachable_is_empty(spark):
    from solr_spark.operators.relational import shortest_path

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    assert shortest_path(edges, "src", "dst", 1, 99, max_depth=3).count() == 0


def test_facet_field_full_parameter_set(spark):
    from solr_spark.operators.relational import facet_field, json_facet_allbuckets
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("src1",), ("src1",), ("src10",), ("src12",), ("other",), (None,)],
        "source string",
    )
    # facet.prefix + facet.sort=index + facet.offset
    got = facet_field(df, "source", prefix="src1", sort_by_count=False, offset=1).collect()
    assert [(r["source"], r["count"]) for r in got] == [("src10", 1), ("src12", 1)]
    # facet.contains
    got = facet_field(df, "source", contains="2", sort_by_count=False).collect()
    assert [r["source"] for r in got] == ["src12"]
    # facet.missing: NULL bucket trails, exempt from limit
    got = facet_field(df, "source", limit=1, missing=True).collect()
    assert (got[0]["source"], got[0]["count"]) == ("src1", 2)
    assert got[-1]["source"] is None and got[-1]["count"] == 1
    # allBuckets/numBuckets: one row over every bucket regardless of limit
    ab = json_facet_allbuckets(df, "source", F.count("*").cast("long"), "m").collect()[0]
    assert (ab["num_buckets"], ab["all_count"], ab["m"]) == (4, 5, 5)


def test_facet_range_other_and_multiselect(spark):
    from pyspark.sql import functions as F

    from solr_spark.operators.relational import (
        facet_field_multiselect,
        facet_range_other,
    )

    df = spark.createDataFrame(
        [(50, "en", "a"), (150, "en", "a"), (300, "de", "b"), (500, "de", "a")],
        "n integer, lang string, src string",
    )
    r = facet_range_other(df, "n", 100.0, 400.0).collect()[0]
    assert (r["before"], r["between"], r["after"]) == (1, 2, 1)

    tagged = {"langtag": F.col("lang") == "en", "srctag": F.col("src") == "a"}
    # excluding the lang filter: facet over BOTH langs within src=a
    got = {r["lang"]: r["count"]
           for r in facet_field_multiselect(df, "lang", tagged, {"langtag"}).collect()}
    assert got == {"en": 2, "de": 1}
    # no exclusion: the lang filter collapses its own facet
    got = {r["lang"]: r["count"]
           for r in facet_field_multiselect(df, "lang", tagged).collect()}
    assert got == {"en": 2}


def test_child_transform_nested_arrays(spark):
    from pyspark.sql import functions as F

    from solr_spark.operators.relational import child_transform

    parents = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    children = spark.createDataFrame(
        [(1, 30, 10), (1, 20, 40), (2, 99, 5)], "fk long, v long, qty long"
    )
    out = {r["pk"]: r["children"]
           for r in child_transform(parents, children, "pk", "fk", "v").collect()}
    assert out == {1: [20, 30], 2: [99], 3: []}
    # childFilter drops non-matching children; parents keep [] not null
    out = {r["pk"]: r["children"]
           for r in child_transform(parents, children, "pk", "fk", "v",
                                    child_filter=F.col("qty") >= 10).collect()}
    assert out == {1: [20, 30], 2: [], 3: []}


def test_hash_partition_filter_covers_and_disjoint(spark):
    from solr_spark.operators.relational import (
        hash_partition_filter,
        random_hash_sample,
    )

    df = spark.range(0, 500).withColumnRenamed("id", "k")
    parts = [
        {r["k"] for r in hash_partition_filter(df, "k", 4, i).collect()}
        for i in range(4)
    ]
    # the 4 worker slices are disjoint and cover the whole collection
    assert sum(len(p) for p in parts) == 500
    assert set().union(*parts) == set(range(500))
    # deterministic: same slice on re-evaluation
    assert parts[1] == {r["k"] for r in hash_partition_filter(df, "k", 4, 1).collect()}
    # hash-threshold sampling: deterministic, roughly the asked fraction
    s = {r["k"] for r in random_hash_sample(df, "k", 0.2).collect()}
    assert s == {r["k"] for r in random_hash_sample(df, "k", 0.2).collect()}
    assert 0.1 <= len(s) / 500 <= 0.3
    # threshold rounds, not truncates: 0.29*10000 == 2899.999… in binary
    # floats, so 0.29 must behave exactly like the 2900-bucket cutoff
    from pyspark.sql import functions as F
    from solr_spark.functions.hashing import md5_long

    bucket = F.pmod(md5_long(F.col("k").cast("string")), F.lit(10000))
    exact = {r["k"] for r in df.where(bucket < 2900).collect()}
    assert {r["k"] for r in random_hash_sample(df, "k", 0.29).collect()} == exact


def test_stats_string_and_group_facet(spark):
    from solr_spark.operators.relational import facet_by_group, stats_string

    df = spark.createDataFrame(
        [(1, "en", "a"), (2, "en", "b"), (3, "fr", "a"), (4, None, "a")],
        "id long, lang string, grp string",
    )
    row = stats_string(df, "lang").collect()[0]
    assert (row["count"], row["missing"]) == (3, 1)
    assert (row["min"], row["max"], row["distinct_values"]) == ("en", "fr", 2)
    fac = {r["lang"]: r["count"] for r in facet_by_group(df, "lang", "grp").collect()}
    # 'en' appears in groups a+b -> 2; 'fr' only in a -> 1; NULL facet dropped
    assert fac == {"en": 2, "fr": 1}


def test_json_facet_sort_by_stat(spark):
    from pyspark.sql import functions as F

    from solr_spark.operators.relational import json_facet_sort_by_stat

    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 100), ("c", 15), ("c", 15), ("d", 100)],
        "k string, v long",
    )
    rows = json_facet_sort_by_stat(df, "k", "v", agg="avg", limit=3).collect()
    # b and d tie at avg 100 -> bucket asc tie-break; then a at 15
    assert [(r["bucket"], r["count"], r["avg_v"]) for r in rows] == [
        ("b", 1, 100.0), ("d", 1, 100.0), ("a", 2, 15.0),
    ]
    # mincount drops singleton buckets
    rows2 = json_facet_sort_by_stat(df, "k", "v", agg="sum", mincount=2, limit=5).collect()
    assert [r["bucket"] for r in rows2] == ["a", "c"]
    assert rows2[0]["sum_v"] == 30.0


def test_join_score_modes(spark, people):
    """ScoreJoinQParserPlugin ScoreMode semantics: per-key aggregate of
    the from-side scores carried onto the to side; none = constant 1.0;
    to-side rows without a from match drop (inner, like the filter)."""
    from solr_spark.operators.relational import join_score

    # from-side "query result": (g, score) rows, group 0 twice
    scored = spark.createDataFrame(
        [(0, 2.0), (0, 4.0), (1, 10.0)], "g long, score double"
    )
    to = people.where(F.col("id") < 10)  # grps 0-4, ids 0-9

    def got(mode):
        return {
            (r["id"], r["join_score"])
            for r in join_score(to, scored, "g", "grp", mode=mode).collect()
        }

    ids0 = {0, 5}  # grp 0
    ids1 = {1, 6}  # grp 1
    assert got("max") == {(i, 4.0) for i in ids0} | {(i, 10.0) for i in ids1}
    assert got("min") == {(i, 2.0) for i in ids0} | {(i, 10.0) for i in ids1}
    assert got("avg") == {(i, 3.0) for i in ids0} | {(i, 10.0) for i in ids1}
    assert got("total") == {(i, 6.0) for i in ids0} | {(i, 10.0) for i in ids1}
    assert got("none") == {(i, 1.0) for i in ids0 | ids1}

    with pytest.raises(ValueError, match="score mode"):
        join_score(to, scored, "g", "grp", mode="sum")


def test_sessionize_gap_boundary(spark):
    """Session semantics: within-gap events merge — INCLUDING an event
    at exactly prev + gap (Spark's merge rule, mirrored by the strict >
    in the SQL oracle); users are independent."""
    from solr_spark.operators.relational import sessionize_counts

    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),   # within 30m -> same session
        (1, "2024-01-01 00:40:00"),   # exactly prev+30m -> still merges
        (1, "2024-01-01 02:00:00"),   # far -> new session
        (2, "2024-01-01 00:00:00"),   # other user: own session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in sessionize_counts(df, "user_id", "ts", gap="30 minutes").collect()
    }
    assert got == {1: (2, 4), 2: (1, 1)}
