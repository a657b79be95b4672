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
