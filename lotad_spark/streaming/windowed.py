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

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


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
    path. The sum is computed over exact DECIMAL(18,2) internally (so it is
    deterministic across partitionings and engines) and EMITTED as
    round(CAST(... AS DOUBLE), 2) — the repo-wide cross-engine output
    convention that renders identically in Spark and DuckDB digests.
    """
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("hour_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    *,
    window: str = "30 minutes",
    slide: str = "10 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Hopping (sliding) window counts + exact decimal sums per key:
    (win_start, <key>, n_events, sum_value). Each event lands in
    window/slide overlapping windows — smoothing that tumbling windows
    can't express (a spike straddling a boundary splits across buckets).

    Same one-definition batch+streaming contract as
    ``windowed_event_agg``: ``F.window(ts, window, slide)`` replicates
    each row into its covering windows BEFORE the aggregation (a
    map-side explode — no extra shuffle vs tumbling; the exchange still
    carries only (window, key) partials thanks to partial aggregation).
    On streaming input the watermark evicts a window's state once it
    closes. Windows are epoch-aligned (UTC session timezone), so the
    assignment is engine-reproducible arithmetic."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(
            F.window(ts_col, window, slide).alias("w"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("win_start"),
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


def key_lifetime_stats(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    state_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Per-key lifetime stats: (<key>, n_events, first_ts, last_ts).

    Batch: one aggregation (count / min / max — oracle-checkable SQL).

    Streaming: a CUSTOM stateful operator via ``applyInPandasWithState``
    — the pattern for state machines Spark's built-in aggregates can't
    express. Per-key state (count + first/last event time) is updated
    with each Arrow batch and re-emitted (update mode); an event-time
    timeout ``state_ttl_ms`` past the watermark evicts idle keys, so
    state size is bounded by the set of keys active inside the horizon —
    the same bounded-state contract as ``streaming_dedup``. At cluster
    scale the state store shards by the grouping key alongside the
    shuffle, so no single executor holds the full key space.
    """
    if not events.isStreaming:
        return events.groupBy(key_col).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )

    import pandas as pd

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            state.remove()
            return
        n, first_ts, last_ts = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            n += len(pdf)
            lo, hi = pdf[ts_col].min(), pdf[ts_col].max()
            first_ts = lo if first_ts is None else min(first_ts, lo)
            last_ts = hi if last_ts is None else max(last_ts, hi)
        state.update((n, first_ts, last_ts))
        # TTL anchored to max(own last event, watermark): the watermark is 0
        # during the FIRST micro-batch of a run, so anchoring to it alone
        # stamps an epoch-1970 timeout and the state is silently evicted on
        # the next restart from checkpoint (caught by
        # TestCheckpointRecovery). last_ts also keeps the timeout strictly
        # above the current watermark, which Spark requires.
        last_ms = int(pd.Timestamp(last_ts).timestamp() * 1000)
        anchor = max(state.getCurrentWatermarkMs(), last_ms)
        state.setTimeoutTimestamp(anchor + state_ttl_ms)
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "first_ts": [first_ts],
                "last_ts": [last_ts],
            }
        )

    key_type = {f.name: f.dataType.simpleString() for f in events.schema.fields}[
        key_col
    ]
    out_schema = (
        f"{key_col} {key_type}, n_events bigint, "
        "first_ts timestamp, last_ts timestamp"
    )
    state_schema = "n bigint, first_ts timestamp, last_ts timestamp"
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            out_schema,
            state_schema,
            "update",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


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


def streaming_drift(
    stream: DataFrame,
    reference: DataFrame,
    *,
    columns: list[str] | None = None,
) -> DataFrame:
    """Continuous drift detection: rows arriving on ``stream`` whose
    canonical row hash has no match in the static ``reference`` snapshot.

    The streaming face of the core diff operator (`diff_tables` J1): a
    stream-static LEFT ANTI join on ``hashed_row``. Spark broadcasts or
    re-reads the static side per micro-batch; the stream side carries no
    state (anti-join against a static frame needs no watermark), so this
    runs indefinitely with bounded memory. Works identically on a batch
    frame for testing — same hash, same join, same schema.

    At scale: keep the reference as a compact parquet/Delta table of
    hashes only (``with_row_hash(ref).select("hashed_row")`` materialized);
    the per-micro-batch cost is then one broadcast of the hash set or one
    hash-join against a pruned single-column scan.
    """
    from lotad_spark.hashing import HASH_COL, with_row_hash

    cols = columns or [c for c in stream.columns if c in set(reference.columns)]
    hashed_stream = with_row_hash(stream.select(*cols), cols)
    ref_hashes = with_row_hash(reference.select(*cols), cols).select(HASH_COL)
    return hashed_stream.join(ref_hashes, HASH_COL, "left_anti")


def value_histogram(
    events: DataFrame,
    *,
    lo: float,
    hi: float,
    n_bins: int = 10,
    window: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Tumbling-window equal-width histogram of a numeric column:
    (hour_start, bin_id, n) — the streaming face of distribution
    monitoring: run it on a readStream, land the counts, and feed each
    window's row against a reference with ``operators.profile.psi_drift``
    arithmetic to get online PSI. Batch and stream share this one
    definition (watermark only attaches on a streaming input).

    Out-of-range values clamp into the edge bins, NULLs are dropped, and
    per-(window, bin) state is bounded by windows-in-watermark × n_bins —
    constant per key, independent of event volume."""
    # The one shared binning definition — the quantiles_online oracle
    # depends on batch and stream binning staying bit-identical.
    from lotad_spark.operators.profile import bin_id_expr

    bin_id = bin_id_expr(val_col, lo, hi, n_bins)
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.filter(F.col(val_col).isNotNull())
        .groupBy(
            F.window(ts_col, window).alias("w"), bin_id.alias("bin_id")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("string").alias("hour_start"),
            "bin_id",
            "n",
        )
    )


def stream_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_key: str,
    interval_key: str,
    point_ts: str,
    interval_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream temporal join: every (point, interval-anchor) pair
    with equal keys and ``point_ts`` inside ``[interval_ts - max_delay,
    interval_ts)`` — "views in the hour before each purchase", live.

    The streaming face of ``operators.range_join``: the SAME pairing
    semantics, but over two unbounded streams. Both sides carry
    watermarks and the join condition carries the explicit time bound,
    which is what lets Spark size and EVICT join state — without the
    time range the state store would grow forever. State per key is
    bounded by (watermark + max_delay) of input, independent of stream
    length. On batch inputs the identical definition runs as an ordinary
    equi-join with a residual time filter (use ``range_join`` instead
    when the batch sides are large — it buckets the inequality away).

    Column names must be distinct across sides (alias before calling),
    as in ``range_join``."""
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"stream_interval_join: overlapping column names "
            f"{sorted(overlap)}; alias one side first"
        )
    if points.isStreaming:
        points = points.withWatermark(point_ts, watermark)
    if intervals.isStreaming:
        intervals = intervals.withWatermark(interval_ts, watermark)
    p_ts, i_ts = F.col(f"`{point_ts}`"), F.col(f"`{interval_ts}`")
    cond = (
        (F.col(f"`{point_key}`") == F.col(f"`{interval_key}`"))
        & (p_ts >= i_ts - F.expr(f"INTERVAL {max_delay}"))
        & (p_ts < i_ts)
    )
    return points.join(intervals, on=cond, how="inner")
