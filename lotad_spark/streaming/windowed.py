"""Windowed event aggregation — one definition for batch AND streaming.

The same transformation runs on a batch DataFrame (oracle-checkable
against DuckDB) and on a ``readStream`` DataFrame (with a watermark for
late-data eviction). Structured Streaming's incremental execution of the
identical logical plan is exactly the Spark-first way to express what a
custom streaming engine would hand-build.

The reference engine has no streaming surface (SURVEY §2.11); these
operators extend the engine for the pipeline workloads that need them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_agg(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts + exact decimal sums per key:
    (hour_start, <key>, n_events, sum_value).

    On a streaming input a watermark bounds state; on batch it is a no-op
    path. Decimal sum → deterministic across partitionings and engines.
    """
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("hour_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str] | None = None,
    *,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once event dedup by key: first occurrence wins.

    On a streaming input this is Spark's watermarked stateful dedup —
    state for a key is dropped once the watermark passes it, so memory is
    bounded by the watermark horizon, and a duplicate arriving inside the
    horizon is suppressed. On batch the same call degrades to a plain
    ``dropDuplicates`` over the keys.
    """
    keys = key_cols or ["event_id"]
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicates(keys)
    return events.dropDuplicates(keys)


def session_event_agg(
    events: DataFrame,
    *,
    gap: str = "5 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows (gap-based) per key: (user_id, session_start,
    n_events). A new session starts when the gap since the previous event
    reaches ``gap`` — Spark's built-in ``session_window`` handles the
    merge logic in both batch and streaming (with watermark-bounded
    state)."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("w.start").cast("string").alias("session_start"),
            "n_events",
        )
    )
