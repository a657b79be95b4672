"""Structured Streaming operators (batch-equivalent semantics)."""

from lotad_spark.streaming.windowed import (
    key_lifetime_stats,
    streaming_drift,
    session_event_agg,
    sliding_window_agg,
    stream_interval_join,
    streaming_dedup,
    value_histogram,
    windowed_event_agg,
)

__all__ = [
    "windowed_event_agg",
    "sliding_window_agg",
    "session_event_agg",
    "streaming_dedup",
    "key_lifetime_stats",
    "streaming_drift",
    "value_histogram",
    "stream_interval_join",
]
