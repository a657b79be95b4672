"""Ordered funnel analysis."""

from datetime import datetime

import pytest

from lotad_spark.operators.funnel import funnel_counts


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, datetime(2024, 1, 1, 0, 0, s)) for u, t, s in rows],
        "user_id bigint, event_type string, ts timestamp",
    )


class TestFunnel:
    def test_order_matters(self, spark):
        ev = _ev(spark, [
            (1, "view", 1), (1, "click", 2), (1, "purchase", 3),  # full
            (2, "click", 1), (2, "view", 2), (2, "purchase", 3),  # click precedes view
            (3, "view", 1), (3, "purchase", 2),                   # skipped click
            (4, "purchase", 1), (4, "click", 2), (4, "view", 3),  # reversed
        ])
        got = {
            r.step: r.n_users
            for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()
        }
        # user 2's click is BEFORE their first view — ordered funnels
        # must not count it, and their purchase can't skip the click step
        assert got == {"view": 4, "click": 1, "purchase": 1}

    def test_strictly_after_previous_step(self, spark):
        # click at the SAME instant as view must not count as progression
        ev = _ev(spark, [(1, "view", 1), (1, "click", 1)])
        got = {
            r.step: r.n_users
            for r in funnel_counts(ev, ["view", "click"]).collect()
        }
        assert got == {"view": 1, "click": 0}

    def test_greedy_earliest_match_is_not_lossy(self, spark):
        # view@1, click@2, view@5: greedy anchors at view@1 and still
        # finds click@2 — a later re-anchor must never lose completions
        ev = _ev(spark, [(1, "view", 1), (1, "click", 2), (1, "view", 5)])
        got = {
            r.step: r.n_users
            for r in funnel_counts(ev, ["view", "click"]).collect()
        }
        assert got == {"view": 1, "click": 1}

    def test_empty_steps_rejected(self, spark):
        with pytest.raises(ValueError):
            funnel_counts(_ev(spark, [(1, "view", 1)]), [])


class TestRetention:
    def test_cohort_math(self, spark):
        from lotad_spark.operators import retention_cohorts

        ev = _ev(spark, [
            (1, "view", 1), (2, "view", 2),        # day 0 cohort: users 1,2
        ])
        ev2 = spark.createDataFrame(
            [
                (1, "click", datetime(2024, 1, 2)),   # user 1 back day+1
                (2, "click", datetime(2024, 1, 3)),   # user 2 back day+2
                (3, "view", datetime(2024, 1, 2)),    # new cohort day 2
            ],
            "user_id bigint, event_type string, ts timestamp",
        )
        got = {
            (r.cohort_day, r.offset_days): (r.n_active, r.cohort_size)
            for r in retention_cohorts(ev.unionByName(ev2)).collect()
        }
        assert got[("2024-01-01", 0)] == (2, 2)
        assert got[("2024-01-01", 1)] == (1, 2)
        assert got[("2024-01-01", 2)] == (1, 2)
        assert got[("2024-01-02", 0)] == (1, 1)
        assert len(got) == 4

    def test_day0_always_full_cohort(self, spark, sf_dir):
        from lotad_spark.operators import retention_cohorts
        from lotad_spark.sources.parquet import ParquetDatabase

        ev = ParquetDatabase(spark, sf_dir, "db").table("events")
        rows = retention_cohorts(ev).collect()
        day0 = {r.cohort_day: r for r in rows if r.offset_days == 0}
        for r in day0.values():
            assert r.n_active == r.cohort_size  # everyone active on day 0
        assert sum(r.cohort_size for r in day0.values()) == (
            ev.select("user_id").distinct().count()
        )


class TestWindowedFunnel:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id bigint, event_type string, ts timestamp"
        )

    def test_window_excludes_slow_transitions(self, spark):
        from datetime import datetime, timedelta

        from lotad_spark.operators.funnel import funnel_counts

        t0 = datetime(2024, 1, 1)
        ev = self._ev(spark, [
            (1, "view", t0),
            (1, "click", t0 + timedelta(minutes=10)),   # inside 30 min
            (2, "view", t0),
            (2, "click", t0 + timedelta(hours=2)),      # outside
        ])
        got = {
            r.step_index: r.n_users
            for r in funnel_counts(
                ev, ["view", "click"], within_seconds=1800
            ).collect()
        }
        assert got == {0: 2, 1: 1}

    def test_multi_attempt_converts(self, spark):
        """Greedy-from-earliest would return 0 converters here: the
        first view's window closes, but the second attempt lands."""
        from datetime import datetime, timedelta

        from lotad_spark.operators.funnel import funnel_counts

        t0 = datetime(2024, 1, 1)
        ev = self._ev(spark, [
            (1, "view", t0),
            (1, "view", t0 + timedelta(hours=2)),
            (1, "click", t0 + timedelta(hours=2, minutes=10)),
        ])
        got = {
            r.step_index: r.n_users
            for r in funnel_counts(
                ev, ["view", "click"], within_seconds=1800
            ).collect()
        }
        assert got == {0: 1, 1: 1}

    def test_equal_timestamp_not_a_transition(self, spark):
        from datetime import datetime

        from lotad_spark.operators.funnel import funnel_counts

        t0 = datetime(2024, 1, 1)
        ev = self._ev(spark, [(1, "view", t0), (1, "click", t0)])
        got = {
            r.step_index: r.n_users
            for r in funnel_counts(
                ev, ["view", "click"], within_seconds=1800
            ).collect()
        }
        assert got == {0: 1, 1: 0}

    def test_unbounded_equals_huge_window_on_real_data(self, spark, sf_dir):
        """With a window wider than the whole observation span, the
        windowed DP and the unbounded greedy must agree (both compute
        exact subsequence containment)."""
        from lotad_spark.operators.funnel import funnel_counts
        from lotad_spark.sources.parquet import ParquetDatabase

        ev = ParquetDatabase(spark, sf_dir, "db").table("events")
        steps = ["view", "click", "purchase"]
        unbounded = {
            r.step_index: r.n_users for r in funnel_counts(ev, steps).collect()
        }
        huge = {
            r.step_index: r.n_users
            for r in funnel_counts(
                ev, steps, within_seconds=10**9
            ).collect()
        }
        assert huge == unbounded


class TestRollingActiveUsers:
    def test_trailing_window_counts(self, spark):
        from datetime import datetime

        from lotad_spark.operators.funnel import rolling_active_users

        rows = [
            (1, datetime(2024, 1, 1)),
            (2, datetime(2024, 1, 1)),
            (1, datetime(2024, 1, 5)),
            (3, datetime(2024, 1, 9)),
        ]
        ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            r.day: r.n_active
            for r in rolling_active_users(ev, window_days=7).collect()
        }
        # day 1: users 1,2; day 5: 1,2 (still in window) +1's new activity
        assert got["2024-01-01"] == 2
        assert got["2024-01-05"] == 2
        # day 8: jan-1 activity aged out (window = day 2..8), user 1's
        # jan-5 remains
        assert got["2024-01-08"] == 1
        # day 9: user 3 joins user 1
        assert got["2024-01-09"] == 2
        # no phantom days past the data's last day
        assert max(got) == "2024-01-09"

    def test_window_one_is_daily_active(self, spark, sf_dir):
        from lotad_spark.operators.funnel import rolling_active_users
        from lotad_spark.sources.parquet import ParquetDatabase

        ev = ParquetDatabase(spark, sf_dir, "db").table("events")
        dau = {
            r.day: r.n_active
            for r in rolling_active_users(ev, window_days=1).collect()
        }
        from pyspark.sql import functions as F

        direct = {
            str(r.d): r.n
            for r in ev.selectExpr("to_date(ts) AS d", "user_id")
            .distinct()
            .groupBy("d")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert dau == direct


class TestWindowedFunnelRandomized:
    def test_random_event_sets_match_bruteforce(self, spark):
        """Seeded random event streams vs an O(n²) reference DP: the
        reachable-set semantics (EXISTS some previous reachable event
        strictly before, within w) must agree — ties, repeats, and
        multi-attempt chains included."""
        import random
        from datetime import datetime, timedelta

        rng = random.Random(7)
        steps = ["a", "b", "c"]
        w = 600  # seconds
        rows = []
        t0 = datetime(2024, 1, 1)
        for uid in range(60):
            for _ in range(rng.randint(0, 12)):
                rows.append((
                    uid,
                    rng.choice(steps + ["x"]),
                    t0 + timedelta(seconds=rng.randint(0, 3000)),
                ))
        if not rows:
            rows = [(0, "a", t0)]

        # reference: per-user reachable event sets, brute force
        by_user = {}
        for uid, et, ts in rows:
            by_user.setdefault(uid, []).append((et, ts))
        expected = []
        reach = {
            uid: {ts for et, ts in evs if et == steps[0]}
            for uid, evs in by_user.items()
        }
        expected.append(sum(1 for s in reach.values() if s))
        for step in steps[1:]:
            nxt = {}
            for uid, evs in by_user.items():
                prev = reach.get(uid, set())
                nxt[uid] = {
                    ts
                    for et, ts in evs
                    if et == step
                    and any(
                        p < ts and (ts - p).total_seconds() <= w
                        for p in prev
                    )
                }
            reach = nxt
            expected.append(sum(1 for s in reach.values() if s))

        ev = spark.createDataFrame(
            [(i, u, e, t) for i, (u, e, t) in enumerate(rows)],
            "event_id long, user_id long, event_type string, ts timestamp",
        )
        got = [
            r.n_users
            for r in funnel_counts(ev, steps, within_seconds=w)
            .orderBy("step_index")
            .collect()
        ]
        assert got == expected


class TestRollingActiveRandomized:
    def test_random_activity_matches_bruteforce(self, spark):
        import random
        from datetime import date, datetime, timedelta

        from lotad_spark.operators.funnel import rolling_active_users

        rng = random.Random(11)
        w = 5
        rows = []
        for uid in range(30):
            for _ in range(rng.randint(0, 8)):
                rows.append(
                    (uid, datetime(2024, 1, 1 + rng.randint(0, 25)))
                )
        ev = spark.createDataFrame(rows, "user_id long, ts timestamp")

        days = {(u, t.date()) for u, t in rows}
        mx = max(d for _, d in days)
        expected = {}
        d0 = min(d for _, d in days)
        cur = d0
        while cur <= mx:
            n = len({
                u
                for u, d in days
                if cur - timedelta(days=w - 1) <= d <= cur
            })
            if n:
                expected[str(cur)] = n
            cur += timedelta(days=1)

        got = {
            r.day: r.n_active
            for r in rolling_active_users(ev, window_days=w).collect()
        }
        assert got == expected


class TestRollingActiveApprox:
    def test_tracks_exact_within_hll_error(self, spark, sf_dir):
        from lotad_spark.operators.funnel import (
            rolling_active_users,
            rolling_active_users_approx,
        )
        from lotad_spark.sources.parquet import ParquetDatabase

        ev = ParquetDatabase(spark, sf_dir, "db").table("events")
        exact = {
            r.day: r.n_active
            for r in rolling_active_users(ev, window_days=7).collect()
        }
        approx = {
            r.day: r.n_active_est
            for r in rolling_active_users_approx(ev, window_days=7).collect()
        }
        assert set(approx) == set(exact)  # same day spine
        for day, n in exact.items():
            assert abs(approx[day] - n) <= max(3, 0.05 * n), (day, n, approx[day])

    def test_sketch_union_never_underestimates_a_single_day(self, spark):
        """A window's estimate must be >= (approximately) the max of the
        single days it unions — sketch union is monotone."""
        from datetime import datetime

        from lotad_spark.operators.funnel import rolling_active_users_approx

        rows = [(u, datetime(2024, 1, 1 + (u % 3))) for u in range(300)]
        ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
        out = {
            r.day: r.n_active_est
            for r in rolling_active_users_approx(ev, window_days=3).collect()
        }
        # day 3 unions all three activity days -> roughly all 300 users
        assert abs(out["2024-01-03"] - 300) <= 15
