"""Watermarked windowed aggregation — the streaming form of the
``timeseries()`` TupleStream (``solrj-streaming/.../io/stream/
TimeSeriesStream.java``) and the daemon+rollup composition
(``DaemonStream.java`` + ``RollupStream.java``).

Structured Streaming native: event-time windows + watermark for late
data. In append output mode a window is emitted exactly once, when the
watermark passes its end — rows later than the watermark are DROPPED
(the bounded-lateness contract that keeps state finite at 100 TB/day
stream rates; state size is O(open windows), not O(events)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    stream_df: DataFrame,
    ts_col: str,
    window: str,
    aggs: dict[str, Column],
    slide: str | None = None,
    watermark: str = "10 minutes",
    group_by: list[str] | None = None,
) -> DataFrame:
    """Event-time windowed aggregation with a lateness watermark.

    ``aggs``: output name → aggregate Column (as in ``operators.rollup``).
    ``slide`` turns the tumbling window into a sliding one. Works on
    both streaming and batch DataFrames (batch ignores the watermark) —
    the batch form is the correctness oracle in tests.
    Output: (window_start, window_end, *group_by, *aggs).
    """
    src = stream_df
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    keys = [win.alias("w")] + [F.col(c) for c in (group_by or [])]
    out = src.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(group_by or []),
        *aggs.keys(),
    )


def run_windowed_stream(
    spark,
    watch_dir: str,
    schema: str,
    ts_col: str,
    window: str,
    aggs: dict[str, Column],
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
    group_by: list[str] | None = None,
):
    """Drain a file-source stream through :func:`windowed_agg` into a
    parquet sink (append mode → each window materializes exactly once,
    on watermark passage). availableNow: processes the backlog and
    stops; re-running with the same checkpoint resumes the watermark
    state, so late files dropped into ``watch_dir`` are subject to the
    lateness bound."""
    stream = spark.readStream.schema(schema).parquet(watch_dir)
    agg = windowed_agg(
        stream, ts_col, window, aggs, watermark=watermark, group_by=group_by
    )
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start(out_dir)
    )
    q.awaitTermination()
    return q
