"""Time-routed document partitions — the TimeRoutedAlias analog.

The reference routes incoming docs into time-windowed collections by a
route field and prunes alias queries to the covering windows
(``cloud/api/collections/TimeRoutedAlias.java`` — router.field /
router.interval, ``update/processor/TimeRoutedAliasUpdateProcessor.java``
routes each doc by its timestamp; tests
``update/processor/TimeRoutedAliasUpdateProcessorTest.java``). The
Spark-first restatement: the window IS a parquet partition column, so
routing is ``partitionBy`` on write and window pruning is Catalyst
partition pruning on read — no custom alias machinery, and the pruning
shows up in the scan's ``PartitionFilters`` (plan-asserted in pytest).

At 100 TB this is the difference between scanning every event ever
ingested and touching only the directories a time-ranged query covers;
writes append new windows without rewriting old ones (exactly why the
reference maintains one collection per window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROUTE_COL = "route_window"

_FMT = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "hour": "yyyy-MM-dd-HH"}


def write_time_routed(
    df: DataFrame, path: str, ts_col: str = "ts", interval: str = "day"
) -> None:
    """Route rows into time-window partition directories
    (``route_window=<window>/``), one per ``interval`` bucket of
    ``ts_col`` — TimeRoutedAliasUpdateProcessor's routing decision as a
    partitioned write. A NULL timestamp raises, like the reference (the
    processor throws when the route field is missing) — enforced
    distributedly via ``raise_error`` inside the routing expression, so
    the write fails on the first bad row with no extra corpus scan."""
    if interval not in _FMT:
        raise ValueError(f"interval must be one of {sorted(_FMT)}: {interval!r}")
    window = F.date_format(F.col(ts_col), _FMT[interval])
    routed = df.withColumn(
        ROUTE_COL,
        F.when(
            F.col(ts_col).isNull(),
            F.raise_error(
                F.lit(f"write_time_routed: NULL route field {ts_col!r} "
                      "(TimeRoutedAliasUpdateProcessor rejects docs missing "
                      "the router.field)")
            ).cast("string"),
        ).otherwise(window),
    )
    routed.write.mode("overwrite").partitionBy(ROUTE_COL).parquet(path)


def read_time_range(
    spark: SparkSession,
    path: str,
    lo: str,
    hi: str,
    ts_col: str = "ts",
    interval: str = "day",
) -> DataFrame:
    """Read only the windows covering ``[lo, hi)`` (ISO timestamps).

    Two filters compose: the ``route_window`` predicate is over the
    PARTITION column — Catalyst prunes non-covering directories before
    any file is opened — and the exact ``ts_col`` range trims the edge
    windows row-wise. String comparison on the window value is correct
    because every format in ``_FMT`` is big-endian (lexicographic ==
    chronological), the same property the reference's window names rely
    on."""
    if interval not in _FMT:
        raise ValueError(f"interval must be one of {sorted(_FMT)}: {interval!r}")
    fmt = _FMT[interval]
    lo_w = F.date_format(F.lit(lo).cast("timestamp"), fmt)
    hi_w = F.date_format(F.lit(hi).cast("timestamp"), fmt)
    return (
        spark.read.parquet(path)
        .where(F.col(ROUTE_COL).between(lo_w, hi_w))
        .where(
            (F.col(ts_col) >= F.lit(lo).cast("timestamp"))
            & (F.col(ts_col) < F.lit(hi).cast("timestamp"))
        )
    )
