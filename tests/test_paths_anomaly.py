"""User-journey paths (operators/paths.py) and rolling z-score anomaly
detection (operators/anomaly.py)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from lotad_spark.operators.anomaly import rolling_zscore
from lotad_spark.operators.paths import event_transitions, path_signatures


@pytest.fixture(scope="module")
def events(spark):
    t0 = datetime(2024, 1, 1)
    rows = []
    # user 1: a -> b -> c ; user 2: a -> b ; user 3: a alone
    for uid, types in ((1, "abc"), (2, "ab"), (3, "a")):
        for i, t in enumerate(types):
            rows.append((len(rows), t0 + timedelta(minutes=i), uid, t))
    # user 4: same-timestamp tie broken by event_id
    rows.append((100, t0, 4, "x"))
    rows.append((101, t0, 4, "y"))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


class TestEventTransitions:
    def test_counts(self, events):
        got = {
            (r.from_type, r.to_type): r.n_transitions
            for r in event_transitions(events).collect()
        }
        assert got == {("a", "b"): 2, ("b", "c"): 1, ("x", "y"): 1}

    def test_tie_broken_by_event_id(self, events):
        got = {
            (r.from_type, r.to_type)
            for r in event_transitions(events).collect()
        }
        assert ("x", "y") in got and ("y", "x") not in got


class TestPathSignatures:
    def test_full_and_short_paths(self, events):
        got = {r.path: r.n_users for r in path_signatures(events, k=5).collect()}
        assert got == {"a>b>c": 1, "a>b": 1, "a": 1, "x>y": 1}

    def test_k_truncates(self, events):
        got = {r.path: r.n_users for r in path_signatures(events, k=2).collect()}
        assert got == {"a>b": 2, "a": 1, "x>y": 1}


class TestRollingZscore:
    @pytest.fixture(scope="class")
    def series(self, spark):
        t0 = datetime(2024, 1, 1)
        rows = [("k", t0 + timedelta(hours=i), 10) for i in range(12)]
        rows.append(("k", t0 + timedelta(hours=12), 100))  # spike
        # constant series: variance 0, never scored
        rows += [("flat", t0 + timedelta(hours=i), 5) for i in range(12)]
        return spark.createDataFrame(rows, "key string, ts timestamp, n long")

    def test_spike_flagged_cold_start_not(self, series):
        out = rolling_zscore(
            series, ["key"], "ts", "n", window=24, min_periods=8, threshold=3.0
        ).collect()
        by = {(r.key, r.ts.hour): r for r in out}
        # cold start: first 8 buckets unscored
        for h in range(8):
            assert by[("k", h)].z is None
            assert by[("k", h)].is_anomaly is False
        # the spike at hour 12: all 12 trailing values are 10 -> var 0
        # before the spike... values constant -> z null until variance>0.
        # inject variance via the spike itself: spike sees trailing
        # constant-10 window (var 0) -> z is None by the var>0 guard.
        assert by[("k", 12)].z is None

    def test_variance_guard_and_scoring(self, spark):
        t0 = datetime(2024, 1, 1)
        # alternating series 9,11 -> mean 10, sample var ~1.09
        rows = [
            ("k", t0 + timedelta(hours=i), 9 + 2 * (i % 2)) for i in range(12)
        ]
        rows.append(("k", t0 + timedelta(hours=12), 30))
        df = spark.createDataFrame(rows, "key string, ts timestamp, n long")
        out = {
            r.ts.hour: r
            for r in rolling_zscore(
                df, ["key"], "ts", "n", window=24, min_periods=8, threshold=3.0
            ).collect()
        }
        assert out[12].is_anomaly is True
        assert out[12].z > 3
        # hour 9 (value 11, trailing mean ~10) is unremarkable
        assert out[9].is_anomaly is False

    def test_large_magnitudes_no_int64_overflow(self, spark):
        # x*x for x ~ 4e9 overflows int64 (~9.2e18); the sums must route
        # through decimal so the score stays exact, not wrapped garbage.
        t0 = datetime(2024, 1, 1)
        base = 4_000_000_000  # base^2 = 1.6e19 > int64 max
        rows = [
            ("k", t0 + timedelta(hours=i), base + (i % 2)) for i in range(12)
        ]
        rows.append(("k", t0 + timedelta(hours=12), base + 1000))
        df = spark.createDataFrame(rows, "key string, ts timestamp, n long")
        out = {
            r.ts.hour: r
            for r in rolling_zscore(
                df, ["key"], "ts", "n", window=24, min_periods=8, threshold=3.0
            ).collect()
        }
        # trailing window alternates base, base+1 -> mean base+0.5,
        # sample stddev ~0.522; the +1000 spike is a huge z.
        assert out[12].is_anomaly is True
        assert out[12].z > 100
        # an in-distribution bucket scores small and FINITE (a wrapped
        # int64 sum would produce a wild or null z here)
        assert out[11].z is not None
        assert abs(out[11].z) < 2

    def test_window_is_keyed_not_global(self, series):
        plan = (
            rolling_zscore(series, ["key"], "ts", "n")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "windowspecdefinition(key" in plan
