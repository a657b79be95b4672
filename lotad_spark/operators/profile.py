"""Column-profile drift: compare per-column statistical summaries.

Row-level diff answers "which rows changed"; profile drift answers the
cheaper monitoring question "did the SHAPE of the data move" — row
counts, null counts, numeric min/max per column — without shuffling a
single data row: each side is ONE full-scan aggregation (all columns'
aggregates computed in the same pass, map-side combined), the two
single-row results are melted to per-column rows driver-free (explode of
a literal struct array), and the comparison joins relations whose size
is the column count, not the data. At 100 TB this is the everything-
pushed-down shape: no exchange carries more than #columns rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lotad_spark.sources.memory import bounded_local_df
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(df: DataFrame) -> DataFrame:
    """Per-column profile: (column_name, n_nonnull, n_null, min_val,
    max_val) — min/max as doubles for numeric columns, NULL otherwise.
    One aggregation job regardless of column count."""
    fields = df.schema.fields
    aggs, structs = [], []
    for i, f in enumerate(fields):
        c = F.col(f"`{f.name}`")
        aggs.append(F.count(c).alias(f"_nn{i}"))
        aggs.append(F.count(F.lit(1)).alias(f"_n{i}"))
        numeric = isinstance(f.dataType, _NUMERIC)
        if numeric:
            aggs.append(F.min(c).cast("double").alias(f"_mn{i}"))
            aggs.append(F.max(c).cast("double").alias(f"_mx{i}"))
        null_d = F.lit(None).cast("double")
        structs.append(F.struct(
            F.lit(f.name).alias("column_name"),
            F.col(f"_nn{i}").alias("n_nonnull"),
            (F.col(f"_n{i}") - F.col(f"_nn{i}")).alias("n_null"),
            (F.col(f"_mn{i}") if numeric else null_d).alias("min_val"),
            (F.col(f"_mx{i}") if numeric else null_d).alias("max_val"),
        ))
    return (
        df.agg(*aggs)
        .select(F.explode(F.array(*structs)).alias("p"))
        .select("p.*")
    )


def profile_drift(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """Columns whose profile differs between the two sides:
    (column_name, metric-pairs for both sides). Columns present on one
    side only surface with NULLs on the missing side (full outer join on
    the #columns-sized relations)."""
    p1, p2 = profile_table(df1), profile_table(df2)
    lhs = p1.select(
        "column_name",
        *[F.col(m).alias(f"{m}_1")
          for m in ("n_nonnull", "n_null", "min_val", "max_val")],
    )
    rhs = p2.select(
        "column_name",
        *[F.col(m).alias(f"{m}_2")
          for m in ("n_nonnull", "n_null", "min_val", "max_val")],
    )
    joined = lhs.join(rhs, "column_name", "full_outer")
    differs = [
        ~F.col(f"{m}_1").eqNullSafe(F.col(f"{m}_2"))
        for m in ("n_nonnull", "n_null", "min_val", "max_val")
    ]
    pred = differs[0]
    for d in differs[1:]:
        pred = pred | d
    return joined.filter(pred)


def psi_drift(
    df1: DataFrame,
    df2: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between the two sides' distributions of
    ``col`` over ``n_bins`` equal-width bins on [lo, hi): one row per bin
    (bin_id, lo_edge, hi_edge, n_1, n_2, psi_term); the column's PSI is
    the sum of psi_term (< 0.1 stable, 0.1–0.25 shifting, > 0.25 moved —
    the standard monitoring thresholds). Out-of-range values clamp into
    the edge bins; NULLs are excluded.

    Determinism: proportions are Laplace-smoothed ((c+1)/(N+bins) — all
    integer inputs, so the doubles agree in any engine), and each bin's
    term is rounded to 6 decimals, so the metric is reproducible
    bit-for-bit cross-engine and under any partitioning (the per-bin sum
    is over rounded values a reader adds up in bin order).

    Scale: each side is one scan + one aggregation keyed on ≤ n_bins
    values; the bin spine (spark.range) keeps empty bins present. No
    exchange carries more than n_bins rows."""
    if not lo < hi:
        raise ValueError(f"psi_drift: need lo < hi, got [{lo}, {hi})")
    width = (hi - lo) / n_bins
    spark = df1.sparkSession

    def binned(df: DataFrame, out: str) -> DataFrame:
        b = F.floor((F.col(f"`{col}`").cast("double") - F.lit(lo)) / F.lit(width))
        clamped = F.least(
            F.greatest(b, F.lit(0)), F.lit(n_bins - 1)
        ).cast("bigint")
        return (
            df.filter(F.col(f"`{col}`").isNotNull())
            .select(clamped.alias("bin_id"))
            .groupBy("bin_id")
            .agg(F.count(F.lit(1)).alias(out))
        )
    spine = spark.range(n_bins).withColumnRenamed("id", "bin_id")
    # ``counts`` (bounded at n_bins rows) feeds BOTH the totals and the
    # final projection; unshared, each side's full scan + aggregation
    # runs twice (the r18-before plan read 8 scans / 20 exchanges). The
    # lazy localCheckpoint computes the histogram once.
    counts = (
        spine.join(binned(df1, "_c1"), "bin_id", "left")
        .join(binned(df2, "_c2"), "bin_id", "left")
        .select(
            "bin_id",
            F.coalesce("_c1", F.lit(0)).alias("n_1"),
            F.coalesce("_c2", F.lit(0)).alias("n_2"),
        )
        .localCheckpoint(eager=False)
    )
    tot = counts.agg(
        F.sum("n_1").alias("_t1"), F.sum("n_2").alias("_t2")
    )
    p = (F.col("n_1") + 1) / (F.col("_t1") + n_bins)
    q = (F.col("n_2") + 1) / (F.col("_t2") + n_bins)
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bin_id",
            (F.lit(lo) + F.col("bin_id") * width).alias("lo_edge"),
            (F.lit(lo) + (F.col("bin_id") + 1) * width).alias("hi_edge"),
            "n_1",
            "n_2",
            F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
    )


def psi_from_counts(
    current: DataFrame,
    reference: DataFrame,
    *,
    bin_col: str = "bin_id",
    count_col: str = "n",
    group_cols: Sequence[str] = ("hour_start",),
) -> DataFrame:
    """Online PSI: score landed histogram counts (e.g. the output of
    ``streaming.value_histogram`` written per window) against a
    reference histogram — (group…, psi). The arithmetic and smoothing
    match :func:`psi_drift` (per-bin terms rounded to 6 decimals, summed
    as DECIMAL so the total is order-independent and engine-exact).

    Scale: the inputs are already n_bins-sized per group; the reference
    (n_bins rows total) broadcasts, and everything here is arithmetic on
    count relations — the raw stream is never touched."""
    gcols = list(group_cols)
    # ``ref`` and ``cur`` are n_bins-sized count relations that each
    # feed TWO consumers (their own total and the join); the spine below
    # additionally pays an eager count() before its join use. Lazy
    # localCheckpoints compute each once instead of re-aggregating the
    # histogram inputs per consumer.
    ref = (
        reference.groupBy(bin_col)
        .agg(F.sum(count_col).alias("_rc"))
        .localCheckpoint(eager=False)
    )
    ref_tot = ref.agg(F.sum("_rc").alias("_rt"))
    cur = (
        current.groupBy(*gcols, bin_col)
        .agg(F.sum(count_col).alias("_cc"))
        .localCheckpoint(eager=False)
    )
    cur_tot = cur.groupBy(*gcols).agg(F.sum("_cc").alias("_ct"))
    # The spine is the UNION of reference and current bin ids: a bin that
    # appears only in the current window (a new mode — exactly the case
    # drift detection exists for) still gets a Laplace-smoothed term with
    # zero reference mass, instead of being silently excluded while its
    # counts inflate _ct.
    spine = (
        reference.select(bin_col)
        .union(current.select(bin_col))
        .distinct()
        .localCheckpoint(eager=False)
    )
    spine_n = spine.count()
    joined = (
        cur_tot.crossJoin(F.broadcast(spine))
        .join(cur, [*gcols, bin_col], "left")
        .join(F.broadcast(ref), bin_col, "left")
        .crossJoin(F.broadcast(ref_tot))
        .select(
            *gcols,
            F.col(bin_col),
            F.coalesce("_cc", F.lit(0)).alias("_cc"),
            "_ct",
            F.coalesce("_rc", F.lit(0)).alias("_rc"),
            "_rt",
        )
    )
    p = (F.col("_cc") + 1) / (F.col("_ct") + spine_n)
    q = (F.col("_rc") + 1) / (F.col("_rt") + spine_n)
    term = F.round((p - q) * F.log(p / q), 6).cast("decimal(18,6)")
    return (
        joined.select(*gcols, term.alias("_t"))
        .groupBy(*gcols)
        .agg(F.round(F.sum("_t").cast("double"), 6).alias("psi"))
    )


def json_key_stats(
    df: DataFrame,
    json_col: str,
) -> DataFrame:
    """Profile a semi-structured JSON-string column: one row per
    top-level object key — (key, n_rows, n_nulls, n_distinct_values).
    The schema-on-read reality check for event ``props``-style columns:
    which keys exist, how often, how wide their value space is.

    Values are compared in their string coercion (``map<string,string>``
    parse), so a JSON string ``"1"`` and number ``1`` collide in the
    distinct count — fine for profiling, not for typed extraction.
    Invalid-JSON and non-object rows contribute nothing.

    Scale: one scan, one explode of (row × keys), one groupBy on the
    key — output is bounded by the distinct key vocabulary. The
    distinct count is exact; at pathological cardinalities swap for
    ``approx_count_distinct``."""
    kv = df.select(
        F.explode(
            F.from_json(F.col(f"`{json_col}`"), "map<string,string>")
        ).alias("key", "_v")
    )
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_if(F.isnull("_v")).cast("bigint").alias("n_nulls"),
        F.count_distinct("_v").cast("bigint").alias("n_distinct_values"),
    )


_JSON_KEY_STATS_COLS = ("n_rows", "n_nulls", "n_distinct_values")


def json_schema_drift(
    df1: DataFrame,
    df2: DataFrame,
    json_col: str,
) -> DataFrame:
    """Schema-on-read drift between two sides of a semi-structured JSON
    column: the reference's schema set-ops (SO3) stop at the relational
    information schema — this extends them to the keys INSIDE a JSON
    column, where producer changes actually land first. One row per key
    whose presence or shape moved between the sides:
    (key, n_rows_1, n_nulls_1, n_distinct_values_1, …_2); a key absent
    from a side reports zeros. Keys whose three stats all match are
    filtered out — no drift, no row.

    Scale: one :func:`json_key_stats` pass per side (each a single scan
    + key-vocabulary-bounded groupBy), then a full outer join of two
    |keys|-row relations — the join input is negligible regardless of
    data volume, and the raw JSON is never shuffled."""

    def side(df: DataFrame, suf: str) -> DataFrame:
        return json_key_stats(df, json_col).select(
            "key",
            *[F.col(c).alias(f"{c}_{suf}") for c in _JSON_KEY_STATS_COLS],
        )

    j = side(df1, "1").join(side(df2, "2"), "key", "full_outer").select(
        "key",
        *[
            F.coalesce(F.col(f"{c}_{s}"), F.lit(0))
            .cast("bigint")
            .alias(f"{c}_{s}")
            for s in ("1", "2")
            for c in _JSON_KEY_STATS_COLS
        ],
    )
    drifted = [
        F.col(f"{c}_1") != F.col(f"{c}_2") for c in _JSON_KEY_STATS_COLS
    ]
    cond = drifted[0]
    for d in drifted[1:]:
        cond = cond | d
    return j.filter(cond)


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_buckets: int = 10,
    n_bins: int = 100,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Input columns + a quantile ``bucket`` (0 .. n_buckets−1) for
    ``value_col`` — the adaptive-threshold curation step ("drop the
    bottom quality decile", "stratify by length decile") that fixed
    cutoffs can't express.

    Boundaries come from the mergeable histogram quantile machinery
    (``column_histogram`` + ``quantiles_from_counts`` at
    i/n_buckets), so they are deterministic arithmetic both engines
    reproduce; assignment is a pure expression counting boundaries
    below the value (bucket = #{b_i < v}, clamped to n_buckets−1;
    NULL values get NULL). Boundary estimates are rounded to 6
    decimals before comparing — identical literals on any engine.

    Scale: one histogram aggregation over the data, n_buckets−1
    boundary scalars collected (bounded), then a stateless projection —
    no second shuffle, no sort. Accuracy is bin-width-bounded: size
    ``n_bins`` to the resolution the buckets need."""
    if n_buckets < 2:
        raise ValueError(
            f"quantile_buckets: need n_buckets >= 2, got {n_buckets}"
        )
    hist = column_histogram(df, col=value_col, lo=lo, hi=hi, n_bins=n_bins)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(
        (float(r.q), float(r.est))
        for r in quantiles_from_counts(
            hist, lo=lo, hi=hi, n_bins=n_bins, qs=qs
        ).collect()
    )
    v = F.col(value_col)
    bucket = F.lit(0)
    for _, b in bounds:
        bucket = bucket + F.when(v > F.lit(b), 1).otherwise(0)
    return df.withColumn(
        bucket_col,
        F.when(
            v.isNotNull(),
            F.least(bucket, F.lit(n_buckets - 1)).cast("bigint"),
        ),
    )


def bin_id_expr(col: str, lo: float, hi: float, n_bins: int):
    """THE equal-width binning contract: floor((v - lo)/width), clamped
    into the edge bins. One definition shared by batch histograms here
    and the streaming ``value_histogram`` — the quantiles_online oracle
    depends on both staying bit-identical, so neither reimplements it."""
    if not lo < hi:
        raise ValueError(f"bin_id_expr: need lo < hi, got [{lo}, {hi})")
    if n_bins <= 0:
        raise ValueError(f"bin_id_expr: need n_bins > 0, got {n_bins}")
    width = (hi - lo) / n_bins
    b = F.floor((F.col(f"`{col}`").cast("double") - F.lit(lo)) / F.lit(width))
    return F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1)).cast("bigint")


def column_histogram(
    df: DataFrame,
    *,
    col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Global equal-width histogram of a numeric column: (bin_id, n).
    Out-of-range values clamp into the edge bins, NULLs drop — the same
    binning contract as ``streaming.value_histogram`` (both call
    :func:`bin_id_expr`), without windows. One map-side-combined
    aggregation; output is n_bins rows, so the counts are a mergeable
    partial (bin counts ADD across batches)."""
    return (
        df.filter(F.col(f"`{col}`").isNotNull())
        .groupBy(bin_id_expr(col, lo, hi, n_bins).alias("bin_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def quantiles_from_counts(
    counts: DataFrame,
    *,
    lo: float,
    hi: float,
    n_bins: int,
    qs: Sequence[float],
    bin_col: str = "bin_id",
    count_col: str = "n",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Quantile estimates (*group_cols, q, est) from binned counts — the
    mergeable alternative to a t-digest: histogram counts add across
    batches, windows, and resolutions, and the estimate is deterministic
    arithmetic (linear interpolation inside the crossing bin), so two
    engines computing from the same counts agree bit-for-bit — which is
    exactly what the driver oracle checks.

    With ``group_cols`` (e.g. the window column ``streaming.
    value_histogram`` emits) every group gets its own estimates — the
    online-quantile face: land windowed counts from a stream, run this
    over them. Everything here runs on groups × n_bins rows: the
    zero-filled spine, one cumulative window partitioned by group (n_bins
    rows per partition — metadata, not data), and a qs × n_bins-per-group
    probe. The only data-sized work is whatever produced ``counts``."""
    if not qs:
        raise ValueError("quantiles_from_counts: need at least one q")
    if any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError("quantiles_from_counts: each q must be in (0, 1]")
    if not lo < hi:
        raise ValueError(
            f"quantiles_from_counts: need lo < hi, got [{lo}, {hi})"
        )
    if n_bins <= 0:
        raise ValueError(
            f"quantiles_from_counts: need n_bins > 0, got {n_bins}"
        )
    spark = counts.sparkSession
    gcols = list(group_cols)
    width = (hi - lo) / n_bins
    from pyspark.sql import Window

    bins = spark.range(n_bins).select(F.col("id").alias(bin_col))
    # The aggregated counts are bounded at groups × n_bins rows but feed
    # TWO consumers (the group spine and the cumulative join); unshared,
    # whatever produced ``counts`` (typically a full-scan histogram)
    # runs once per consumer. The lazy localCheckpoint computes it once;
    # the spine's distinct group set is derived from the SAME aggregated
    # relation (identical set by construction — aggregation preserves
    # the group values).
    agg_counts = (
        counts.groupBy(*gcols, bin_col)
        .agg(F.sum(count_col).cast("bigint").alias("_n"))
        .localCheckpoint(eager=False)
    )
    if gcols:
        spine = (
            agg_counts.select(*[F.col(f"`{c}`") for c in gcols])
            .distinct()
            .crossJoin(F.broadcast(bins))
        )
    else:
        spine = bins
    cum = (
        spine.join(
            agg_counts,
            [*gcols, bin_col],
            "left",
        )
        .select(*gcols, bin_col, F.coalesce("_n", F.lit(0)).alias("_n"))
        # n_bins rows per group: a single partition per group is the
        # point, not an accident — never put data-sized relations here.
        .withColumn(
            "_cum",
            F.sum("_n").over(
                Window.partitionBy(*gcols)
                .orderBy(bin_col)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        # ``cum`` (still groups × n_bins rows) feeds the total AND the
        # probe join — share it the same way.
        .localCheckpoint(eager=False)
    )
    total = cum.groupBy(*gcols).agg(F.max("_cum").alias("_total"))
    qdf = bounded_local_df(spark, [(float(q),) for q in qs], "q double")
    joined = total.crossJoin(F.broadcast(qdf))
    probe = joined.join(cum, gcols) if gcols else joined.crossJoin(
        F.broadcast(cum)
    )
    probe = probe.filter(
        (F.col("_n") > 0)
        & (F.col("_cum") >= F.col("q") * F.col("_total"))
    )
    pick = probe.groupBy(*gcols, "q", "_total").agg(
        F.min_by(
            F.struct(F.col(bin_col).alias("_b"), "_n", "_cum"), F.col(bin_col)
        ).alias("_hit")
    )
    target = F.col("q") * F.col("_total")
    est = (
        F.lit(lo)
        + F.col("_hit._b") * F.lit(width)
        + (
            (target - (F.col("_hit._cum") - F.col("_hit._n")))
            / F.col("_hit._n")
        )
        * F.lit(width)
    )
    return pick.select(*gcols, "q", F.round(est, 6).alias("est"))
