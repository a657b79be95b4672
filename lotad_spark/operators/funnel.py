"""Ordered funnel analysis over an event stream.

How many users reach each step of a multi-step journey IN ORDER
(view → click → purchase): the standard product-analytics query, and a
shape worth doing right at scale — the naive per-user
``collect_list(sorted events) + subsequence scan`` hauls every event of
hot users into one aggregation buffer; this implementation never builds
a per-user event array.

Plan shape: one aggregation per step, each over the (already reduced)
previous step's output joined to the per-(user, type) first-occurrence
relation — min/max aggregates and equi-joins only, all keyed on
``user_id``. Shuffle volume is per-user rows (steps × users), not
events; every join after the first aggregation is between step-sized
relations, which AQE broadcasts as the funnel narrows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """(step_index, step, n_users) — users whose events contain the step
    sequence in timestamp order (strictly increasing between steps).

    Unbounded (``within_seconds=None``): a user reaches step i when some
    step-i event is strictly AFTER the earliest time they reached step
    i-1; the earliest such time becomes their step-i reach time. Greedy
    earliest-match is optimal (matching any later step-i event only
    shrinks the room for step i+1), so this computes exact subsequence
    containment without per-user arrays.

    Windowed (``within_seconds=w``): each transition must land within w
    seconds of SOME reachable previous-step event — the product-
    analytics conversion window, multi-attempt semantics (a user whose
    first attempt stalls but whose second attempt converts counts).
    Greedy-from-the-earliest is WRONG here (the earliest step-1 event
    may close its window before a later attempt would have converted),
    so each round keeps the full reachable event set — but never joins
    it against candidates: a candidate converts iff the LATEST reachable
    previous event before it is within w, which one asof-style
    union + running-max window per step computes with zero fan-out.
    Shuffles stay keyed on user; per-user window state is one running
    timestamp."""
    if not steps:
        raise ValueError("funnel_counts: need at least one step")
    if within_seconds is not None:
        return _windowed_funnel(
            events, list(steps), user_col, type_col, ts_col, within_seconds
        )
    reached = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_reach_ts"))
    )
    out_rows = [reached.agg(
        F.lit(0).alias("step_index"),
        F.lit(steps[0]).alias("step"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )]
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(reached, user_col)
            .filter(F.col(ts_col) > F.col("_reach_ts"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("_reach_ts"))
        )
        reached = nxt
        out_rows.append(reached.agg(
            F.lit(i).alias("step_index"),
            F.lit(step).alias("step"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        ))
    # A global agg over an empty relation still yields one row (count 0),
    # so steps nobody reached stay as explicit zero rows and the funnel
    # always has len(steps) rows.
    out = out_rows[0]
    for frame in out_rows[1:]:
        out = out.unionByName(frame)
    return out


def _windowed_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str,
    type_col: str,
    ts_col: str,
    within_seconds: int,
) -> DataFrame:
    """Conversion-window funnel: reachable step-i events are step-i
    events within ``within_seconds`` after the latest reachable step-
    (i-1) event before them (strictly after — the running max excludes
    equal timestamps by sorting candidates before predecessors on
    ties). DP over event sets, one user-keyed window per step."""
    reach = (
        events.filter(F.col(type_col) == steps[0])
        .select(F.col(user_col).alias("_u"), F.col(ts_col).alias("_t"))
        .distinct()
    )
    counts = [reach.agg(
        F.lit(0).alias("step_index"),
        F.lit(steps[0]).alias("step"),
        F.count_distinct(F.col("_u")).cast("bigint").alias("n_users"),
    )]
    w = (
        Window.partitionBy("_u")
        .orderBy("_t", "_isp")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    for i, step in enumerate(steps[1:], start=1):
        cand = (
            events.filter(F.col(type_col) == step)
            .select(F.col(user_col).alias("_u"), F.col(ts_col).alias("_t"))
            .distinct()
        )
        u = reach.withColumn("_isp", F.lit(1)).unionByName(
            cand.withColumn("_isp", F.lit(0))
        )
        prev_ts = F.max(F.when(F.col("_isp") == 1, F.col("_t"))).over(w)
        reach = (
            u.withColumn("_pts", prev_ts)
            .filter(
                (F.col("_isp") == 0)
                & F.col("_pts").isNotNull()
                & (
                    F.col("_t")
                    <= F.col("_pts")
                    + F.make_interval(secs=F.lit(float(within_seconds)))
                )
            )
            .select("_u", "_t")
        )
        counts.append(reach.agg(
            F.lit(i).alias("step_index"),
            F.lit(step).alias("step"),
            F.count_distinct(F.col("_u")).cast("bigint").alias("n_users"),
        ))
    out = counts[0]
    for frame in counts[1:]:
        out = out.unionByName(frame)
    return out


def rolling_active_users(
    events: DataFrame,
    *,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(day, n_active): EXACT distinct users active in the trailing
    ``window_days`` ending at each day — rolling WAU/MAU. Distinct-over-
    a-sliding-frame has no direct window-function form; the exact
    distributed shape is contribution explosion: each (user, day)
    activity row covers the ``window_days`` window-ends it counts
    toward, then one distinct + one count.

    Scale: the explode fans out the per-user-DAY relation (already
    collapsed from raw events by the first distinct), not events — 7×
    or 30× of a relation bounded by users × days. Days after the data's
    last day are clipped so the tail doesn't report phantom windows.
    For approximate-at-huge-scale, swap the final distinct count for
    HLL sketches per day (operators/rollup.py machinery)."""
    if window_days < 1:
        raise ValueError(
            f"rolling_active_users: need window_days >= 1, got {window_days}"
        )
    d = F.to_date(F.col(ts_col))
    ud = events.select(F.col(user_col).alias("_u"), d.alias("_d")).distinct()
    mx = ud.agg(F.max("_d").alias("_mx"))
    cov = (
        ud.select(
            "_u",
            F.explode(
                F.sequence(F.lit(0), F.lit(window_days - 1))
            ).alias("_k"),
            "_d",
        )
        .select("_u", F.date_add(F.col("_d"), F.col("_k")).alias("_day"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("_day") <= F.col("_mx"))
        .select("_u", "_day")
        .distinct()
    )
    return cov.groupBy(
        F.col("_day").cast("string").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))


def rolling_active_users_approx(
    events: DataFrame,
    *,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    lg_config_k: int = 12,
) -> DataFrame:
    """(day, n_active_est): APPROXIMATE trailing-window active users via
    HLL sketches — the 100 TB face of :func:`rolling_active_users`.
    One sketch per day (2^lg_config_k registers, independent of
    volume), each day's sketch contributes to the ``window_days``
    window-ends it covers, and per-day sketch UNIONS (lossless register
    max-combine) replace the exact distinct — so the explode fans out
    |days| sketch rows instead of the users × days relation, and no
    distinct shuffle of user ids ever happens past the first per-day
    aggregation. Standard HLL error (~1.6% at lgK=12)."""
    if window_days < 1:
        raise ValueError(
            "rolling_active_users_approx: need window_days >= 1, "
            f"got {window_days}"
        )
    d = F.to_date(F.col(ts_col))
    daily = events.groupBy(d.alias("_d")).agg(
        F.hll_sketch_agg(F.col(f"`{user_col}`"), F.lit(lg_config_k)).alias(
            "_sk"
        )
    )
    mx = daily.agg(F.max("_d").alias("_mx"))
    contrib = (
        daily.select(
            "_sk",
            F.explode(
                F.sequence(F.lit(0), F.lit(window_days - 1))
            ).alias("_k"),
            "_d",
        )
        .select("_sk", F.date_add(F.col("_d"), F.col("_k")).alias("_day"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("_day") <= F.col("_mx"))
    )
    return contrib.groupBy(
        F.col("_day").cast("string").alias("day")
    ).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("_sk")))
        .cast("bigint")
        .alias("n_active_est")
    )


def retention_cohorts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily cohort retention: (cohort_day, offset_days, n_active,
    cohort_size) — of the users whose FIRST activity fell on cohort_day,
    how many were active again offset_days later. The companion
    analytics query to :func:`funnel_counts`.

    One data shuffle: a single groupBy(user) computes the cohort day
    (min) and the distinct active-day set (collect_set — bounded by the
    observation window in days, never by event volume, and deduped
    map-side). Everything after runs on per-user rows: explode the day
    set, offset against the cohort, count. Cohort sizes reuse the same
    per-user relation."""
    d = F.to_date(F.col(ts_col))
    per_user = (
        events.select(F.col(user_col).alias("_u"), d.alias("_d"))
        .groupBy("_u")
        .agg(
            F.min("_d").alias("_cohort"),
            F.collect_set("_d").alias("_days"),
        )
    )
    ret = (
        per_user.select("_cohort", F.explode("_days").alias("_d"))
        .groupBy(
            "_cohort",
            F.datediff(F.col("_d"), F.col("_cohort"))
            .cast("bigint")
            .alias("offset_days"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    sizes = per_user.groupBy("_cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    return (
        ret.join(sizes, "_cohort")
        .select(
            F.col("_cohort").cast("string").alias("cohort_day"),
            "offset_days",
            "n_active",
            "cohort_size",
        )
    )
