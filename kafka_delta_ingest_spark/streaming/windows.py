"""Event-time windowed aggregation with watermarks.

The reference is processing-time only (allowed_latency flushes,
/root/reference/src/lib.rs:1102-1145; no event-time semantics — SURVEY §2.C).
A training-data ingest pipeline at scale needs the event-time side too:
tumbling/sliding window rollups over the stream with bounded state via
watermarks, so late events beyond the horizon are dropped deterministically.

Built entirely on Structured Streaming primitives: ``withWatermark`` +
``window`` aggregation; output to our table via foreachBatch append
commits (same exactly-once txn path as micro_batch.py)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
    group_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time aggregation with a watermark.

    Works identically on a batch DataFrame (watermark is a no-op there),
    which is how the oracle/pytest verify the window arithmetic."""
    w = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    keys = [w.alias("win")] + [F.col(c) for c in (group_cols or [])]
    out_aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    return (
        df.groupBy(*keys)
        .agg(*out_aggs)
        .withColumn("window_start", F.col("win.start"))
        .withColumn("window_end", F.col("win.end"))
        .drop("win")
    )
