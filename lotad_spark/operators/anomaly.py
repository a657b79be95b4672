"""Rolling z-score anomaly detection over time-bucketed series.

Takes an already-aggregated bucket series (e.g. a rollup of counts per
(key, bucket) — operators/rollup.py output, or any groupBy result) and
scores each bucket against the trailing window of its OWN series:

    z = (x − mean_prev) / stddev_prev      over the last `window` buckets

A bucket is anomalous when |z| exceeds the threshold and the trailing
window holds at least `min_periods` observations (cold-start buckets
emit NULL z, never a spurious flag).

Cross-engine determinism: mean and sample variance are derived from
exact integer sums (sum, sum-of-squares, count over the frame) with one
fixed formula — var = (ss − s²/n)/(n−1) — evaluated in the same
operation order on both engines, so doubles agree bit-for-bit; z is
additionally rounded to 6 decimals in the oracle-facing surface.

100 TB design: input is the rollup relation (|keys| × |buckets| rows),
orders of magnitude smaller than raw events; the only exchange is one
hash partition by key for the window, whose frame state is `window`
rows regardless of volume. The raw event table is never touched.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_zscore(
    buckets: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    window: int = 24,
    min_periods: int = 8,
    threshold: float = 3.0,
) -> DataFrame:
    """(key_cols…, ts_col, value_col, z, is_anomaly) per bucket — other
    input columns are dropped (join back on the keys + ts to re-attach
    them). ``value_col`` must be integral (counts/sums from a rollup)
    so trailing sums are exact, and (key, ts) must be unique — the
    grouped-rollup shape — so the trailing ROWS frame is deterministic."""
    keys = list(key_cols)
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(-window, -1)
    )
    # Exact trailing sums in DECIMAL, not bigint: x*x overflows int64
    # silently above ~3.04e9 (plausible for rollup sums) in non-ANSI
    # Spark, while DuckDB promotes to int128 — garbage z on one side
    # only. decimal(19,0)² → decimal(38,0) holds x² for any bigint x.
    # The variance uses the rearranged EXACT-integer numerator
    # ss·n − s² (still decimal) and converts to double ONCE: the
    # textbook ss − s²/n form cancels catastrophically in doubles for
    # mean ≫ stddev (e.g. a tiny spread around 4e9 computes var = 0 and
    # silently never flags). Values up to ~4e17 keep ss·n inside
    # decimal(38,0); a genuinely unrepresentable series yields NULL →
    # NULL z → no spurious flag, never a wrapped value. The oracle
    # replays the identical algebra over DuckDB's int128 sums, so
    # cross-engine doubles agree bit-for-bit.
    xd = F.col(value_col).cast("decimal(19,0)")
    # x derives from xd (not a separate bigint cast): a fractional
    # value_col would otherwise HALF_UP-round into the sums but
    # truncate in the z numerator — one integerization everywhere.
    x = xd.cast("bigint")
    s = F.sum(xd).over(w)
    ss = F.sum(xd * xd).over(w)
    n = F.count(x).over(w)
    var = (ss * n - s * s).cast("double") / (n * (n - F.lit(1)))
    z = F.when(
        (n >= min_periods) & (var > 0),
        F.round((x - s.cast("double") / n) / F.sqrt(var), 6),
    )
    return buckets.select(
        *keys,
        F.col(ts_col),
        x.alias(value_col),
        z.alias("z"),
        (~F.isnull(z) & (F.abs(z) > threshold)).alias("is_anomaly"),
    )
