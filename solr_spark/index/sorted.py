"""Index-time sort + early-terminating sorted top-k.

Solr analog: ``segmentTerminateEarly=true`` — when the index is sorted
by the query's sort field at merge time (``SortingMergePolicy`` /
Lucene ``IndexSorter``; Solr surfaces it via
``solrconfig.xml <mergePolicyFactory>`` and the
``CommonParams.SEGMENT_TERMINATE_EARLY`` request param, used by
``SolrIndexSearcher`` + the ``/export`` handler's sort path), each
segment can stop collecting after the first ``k`` docs in sort order.

Spark-first form: a SORTED PROJECTION of the doc registry —
``repartitionByRange(key, tiebreak)`` (non-overlapping tuple ranges
across partitions) → ``sortWithinPartitions`` → parquet written
``partitionBy(_srange)`` so each range is a Hive partition directory.
A tiny JSON manifest records per-range (min, max, count). A sorted
top-k then prunes to the FIRST ranges whose cumulative count covers
``k`` via a partition-column filter: at 100 TB the scan reads one or
two range directories, not the table — the same I/O shape as Lucene's
early-terminated sorted segments, but enforced by partition pruning
rather than a collector.

The projection is sort-key-specific, exactly like the reference's
index-time sort (one sort per index); build one projection per hot
sort key.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "sorted_manifest.json"


def build_sorted_projection(
    df: DataFrame,
    out_dir: str,
    key: str,
    tiebreak: str,
    num_ranges: int = 8,
) -> "SortedProjection":
    """Write ``df`` range-partitioned + sorted by ``(key, tiebreak)``.

    ``tiebreak`` must be a unique column (doc id): it makes the sort
    tuple total, so range boundaries never interleave equal tuples and
    the first ranges contain exactly the global first rows.
    """
    ranged = (
        df.repartitionByRange(num_ranges, F.col(key), F.col(tiebreak))
        .withColumn("_srange", F.spark_partition_id())
        .sortWithinPartitions(key, tiebreak)
    )
    ranged.write.mode("overwrite").partitionBy("_srange").parquet(out_dir)
    # bounds manifest: one small grouped agg over the (pruned) key column
    spark = df.sparkSession
    stats = (
        spark.read.parquet(out_dir)
        .groupBy("_srange")
        .agg(
            F.min(key).alias("min_key"),
            F.max(key).alias("max_key"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("_srange")
        .collect()
    )
    manifest = [
        {"range": r["_srange"], "min": r["min_key"], "max": r["max_key"],
         "n": r["n"]}
        for r in stats
    ]
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump({"key": key, "tiebreak": tiebreak, "ranges": manifest}, f,
                  default=str)
    return SortedProjection(spark, out_dir)


class SortedProjection:
    """Handle to a sorted projection directory (data + bounds manifest)."""

    def __init__(self, spark: SparkSession, out_dir: str):
        self.spark = spark
        self.dir = out_dir
        with open(os.path.join(out_dir, _MANIFEST)) as f:
            m = json.load(f)
        self.key: str = m["key"]
        self.tiebreak: str = m["tiebreak"]
        self.ranges: list[dict] = m["ranges"]

    def _covering_ranges(self, k: int, desc: bool) -> list[int]:
        """The minimal leading (or trailing, for desc) range ids whose
        cumulative row count reaches ``k`` — driver-side over the tiny
        manifest, no Spark job."""
        order = sorted(self.ranges, key=lambda r: r["range"], reverse=desc)
        picked, cum = [], 0
        for r in order:
            if r["n"] == 0:
                continue
            picked.append(r["range"])
            cum += r["n"]
            if cum >= k:
                break
        return picked

    def topk(self, k: int, fl: list[str] | None = None,
             desc: bool = False) -> DataFrame:
        """Sorted top-k with early termination: a partition-column filter
        restricts the scan to the covering ranges (Hive partition pruning
        — unselected range directories are never listed into the scan),
        then an ordinary sort+limit over that small remainder."""
        picked = self._covering_ranges(k, desc)
        key_col = F.col(self.key).desc() if desc else F.col(self.key).asc()
        tie_col = F.col(self.tiebreak).desc() if desc else F.col(self.tiebreak).asc()
        out = (
            self.spark.read.parquet(self.dir)
            .where(F.col("_srange").isin(picked))
            .orderBy(key_col, tie_col)
            .limit(k)
        )
        cols = fl if fl is not None else [
            c for c in out.columns if c != "_srange"
        ]
        return out.select(*cols)
