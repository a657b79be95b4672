"""Column-profile drift."""

import pyspark.sql.functions as F
import pytest

from lotad_spark.operators import profile_drift, profile_table
from lotad_spark.sources.parquet import ParquetDatabase


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return ParquetDatabase(spark, sf_dir, "db").table("customer")


class TestProfile:
    def test_profile_one_row_per_column(self, customer):
        p = {r.column_name: r for r in profile_table(customer).collect()}
        assert set(p) == set(customer.columns)
        n = customer.count()
        for r in p.values():
            assert r.n_nonnull + r.n_null == n
        true_min = customer.agg(F.min("c_custkey")).collect()[0][0]
        assert p["c_custkey"].min_val == float(true_min)
        assert p["c_name"].min_val is None  # non-numeric: counts only

    def test_identical_sides_no_drift(self, customer):
        assert profile_drift(customer, customer).isEmpty()

    def test_detects_shape_changes(self, customer):
        mutated = customer.withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey") == 1, None).otherwise(
                F.col("c_acctbal")
            ),
        )
        rows = {r.column_name: r for r in profile_drift(customer, mutated).collect()}
        assert set(rows) == {"c_acctbal"}
        assert rows["c_acctbal"].n_null_2 == rows["c_acctbal"].n_null_1 + 1

    def test_column_only_on_one_side(self, customer):
        rows = {
            r.column_name: r
            for r in profile_drift(
                customer, customer.drop("c_mktsegment")
            ).collect()
        }
        assert "c_mktsegment" in rows
        assert rows["c_mktsegment"].n_nonnull_2 is None

    def test_single_aggregation_no_data_shuffle(self, customer):
        plan = (
            profile_table(customer)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the only exchange is the single-row partial-agg gather
        assert plan.count("Exchange") <= 1
        assert "SinglePartition" in plan or "Exchange" not in plan


class TestPsiDrift:
    def test_identical_distributions_zero_psi(self, customer):
        from lotad_spark.operators import psi_drift

        rows = psi_drift(
            customer, customer, "c_acctbal", lo=0.0, hi=10000.0
        ).collect()
        assert len(rows) == 10
        assert all(r.psi_term == 0.0 for r in rows)
        assert sum(r.n_1 for r in rows) == customer.count()

    def test_shift_detected_and_localized(self, customer):
        from lotad_spark.operators import psi_drift
        import pyspark.sql.functions as F

        shifted = customer.withColumn(
            "c_acctbal", F.col("c_acctbal") + 3000.0
        )
        rows = psi_drift(
            customer, shifted, "c_acctbal", lo=0.0, hi=10000.0
        ).collect()
        psi = sum(r.psi_term for r in rows)
        assert psi > 0.25  # a 3-bin shift is a "moved" distribution
        # clamping keeps every row binned on both sides
        assert sum(r.n_2 for r in rows) == customer.count()

    def test_empty_bins_present_with_zero_counts(self, spark):
        from lotad_spark.operators import psi_drift

        df = spark.createDataFrame([(5.0,)], "v double")
        rows = {r.bin_id: r for r in psi_drift(df, df, "v", lo=0.0, hi=10.0, n_bins=5).collect()}
        assert set(rows) == {0, 1, 2, 3, 4}
        assert rows[4].n_1 == 0 and rows[2].n_1 == 1

    def test_bad_range_rejected(self, customer):
        from lotad_spark.operators import psi_drift

        with pytest.raises(ValueError):
            psi_drift(customer, customer, "c_acctbal", lo=5.0, hi=5.0)


class TestPsiFromCounts:
    def test_matches_psi_drift_on_same_data(self, spark, customer):
        """The online arithmetic must agree with the batch psi_drift on
        identical inputs: bin both sides, feed counts through
        psi_from_counts, compare against sum(psi_term)."""
        import pyspark.sql.functions as F

        from lotad_spark.operators import psi_drift, psi_from_counts

        shifted = customer.withColumn("c_acctbal", F.col("c_acctbal") + 2000.0)
        per_bin = psi_drift(customer, shifted, "c_acctbal", lo=0.0, hi=10000.0)
        expect = round(sum(r.psi_term for r in per_bin.collect()), 6)

        ref = per_bin.select("bin_id", F.col("n_1").alias("n"))
        cur = per_bin.select(
            F.lit("w0").alias("hour_start"), "bin_id", F.col("n_2").alias("n")
        )
        got = psi_from_counts(cur, ref).collect()
        assert len(got) == 1
        assert abs(got[0].psi - expect) < 2e-6  # per-term rounding slack

    def test_hourly_monitoring_composition(self, spark, sf_dir):
        """value_histogram → psi_from_counts (the q_psi_online shape):
        one non-negative psi per observed hour."""
        import pyspark.sql.functions as F

        from lotad_spark.operators import psi_from_counts
        from lotad_spark.sources import ParquetDatabase
        from lotad_spark.streaming import value_histogram

        ev = ParquetDatabase(spark, sf_dir, "db").table("events")
        hist = value_histogram(ev, lo=0.0, hi=250.0, n_bins=5)
        ref = hist.groupBy("bin_id").agg(F.sum("n").alias("n"))
        rows = psi_from_counts(hist, ref).collect()
        n_hours = hist.select("hour_start").distinct().count()
        assert len(rows) == n_hours > 0
        assert all(r.psi >= 0.0 for r in rows)

    def test_zero_for_identical_counts(self, spark):
        from lotad_spark.operators import psi_from_counts

        ref = spark.createDataFrame(
            [(i, 100) for i in range(5)], "bin_id bigint, n bigint"
        )
        cur = spark.createDataFrame(
            [("w0", i, 100) for i in range(5)],
            "hour_start string, bin_id bigint, n bigint",
        )
        rows = psi_from_counts(cur, ref).collect()
        assert rows[0].psi == 0.0

    def test_new_mode_bin_contributes(self, spark):
        """A bin present only in the current window (a brand-new mode)
        must join the spine with zero reference mass and contribute a
        smoothed term — not be silently dropped while inflating the
        current total."""
        from lotad_spark.operators import psi_from_counts

        ref = spark.createDataFrame(
            [(0, 100), (1, 100)], "bin_id bigint, n bigint"
        )
        # Half the current mass lands in bin 2, unseen in the reference.
        cur = spark.createDataFrame(
            [("w0", 0, 100), ("w0", 1, 100), ("w0", 2, 200)],
            "hour_start string, bin_id bigint, n bigint",
        )
        rows = psi_from_counts(cur, ref).collect()
        assert len(rows) == 1
        # With the bin dropped the score would be ~0.27 (only the two
        # shared bins' shrunken shares); counting it pushes PSI well past
        # 1 — the "distribution changed" regime a new mode belongs in.
        assert rows[0].psi > 1.0

    def test_per_window_scores(self, spark):
        from lotad_spark.operators import psi_from_counts

        ref = spark.createDataFrame(
            [(0, 100), (1, 100)], "bin_id bigint, n bigint"
        )
        cur = spark.createDataFrame(
            [("w0", 0, 100), ("w0", 1, 100), ("w1", 0, 200), ("w1", 1, 0)],
            "hour_start string, bin_id bigint, n bigint",
        )
        got = {r.hour_start: r.psi for r in psi_from_counts(cur, ref).collect()}
        assert got["w0"] == 0.0 and got["w1"] > 0.25


class TestHistogramQuantiles:
    def test_known_counts(self, spark):
        from lotad_spark.operators import quantiles_from_counts

        # 10 values in [0,10): bins 0..9 each n=1 → q-th quantile at 10q
        counts = spark.createDataFrame(
            [(i, 1) for i in range(10)], "bin_id bigint, n bigint"
        )
        got = {
            r["q"]: r["est"]
            for r in quantiles_from_counts(
                counts, lo=0.0, hi=10.0, n_bins=10, qs=[0.1, 0.5, 1.0]
            ).collect()
        }
        assert got == {0.1: 1.0, 0.5: 5.0, 1.0: 10.0}

    def test_zero_bins_skipped_and_interpolated(self, spark):
        from lotad_spark.operators import quantiles_from_counts

        # mass only in bins 2 (n=3) and 7 (n=1); bin width 1
        counts = spark.createDataFrame(
            [(2, 3), (7, 1)], "bin_id bigint, n bigint"
        )
        got = {
            r["q"]: r["est"]
            for r in quantiles_from_counts(
                counts, lo=0.0, hi=10.0, n_bins=10, qs=[0.5, 0.8, 1.0]
            ).collect()
        }
        # q=.5 → target 2 inside bin 2 at offset 2/3; q=.8 → target 3.2
        # crosses into bin 7 at offset .2; q=1 → end of bin 7
        assert got[0.5] == round(2 + 2 / 3, 6)
        assert got[0.8] == round(7 + 0.2, 6)
        assert got[1.0] == 8.0

    def test_counts_merge_like_partials(self, spark, sf_dir):
        """Histogram counts from two disjoint halves, summed, must give
        the same quantiles as one pass over everything — the mergeable-
        partial property that makes this the t-digest alternative."""
        from pyspark.sql import functions as F

        from lotad_spark.operators import (
            column_histogram,
            quantiles_from_counts,
        )
        from lotad_spark.sources import read_table

        ev = read_table(spark, f"{sf_dir}/events.parquet")
        args = dict(lo=0.0, hi=250.0, n_bins=25)
        whole = column_histogram(ev, col="value", **args)
        halves = (
            column_histogram(
                ev.filter("user_id % 2 = 0"), col="value", **args
            )
            .unionByName(
                column_histogram(
                    ev.filter("user_id % 2 = 1"), col="value", **args
                )
            )
            .groupBy("bin_id")
            .agg(F.sum("n").cast("bigint").alias("n"))
        )
        qs = [0.25, 0.5, 0.9]
        a = sorted(
            map(
                tuple,
                quantiles_from_counts(whole, qs=qs, **args).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                quantiles_from_counts(halves, qs=qs, **args).collect(),
            )
        )
        assert a == b and len(a) == 3

    def test_estimate_within_bin_width_of_exact(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from lotad_spark.operators import (
            column_histogram,
            quantiles_from_counts,
        )
        from lotad_spark.sources import read_table

        ev = read_table(spark, f"{sf_dir}/events.parquet")
        n_bins, lo, hi = 50, 0.0, 250.0
        width = (hi - lo) / n_bins
        h = column_histogram(ev, col="value", lo=lo, hi=hi, n_bins=n_bins)
        est = {
            r["q"]: r["est"]
            for r in quantiles_from_counts(
                h, lo=lo, hi=hi, n_bins=n_bins, qs=[0.25, 0.5, 0.75]
            ).collect()
        }
        exact = ev.agg(
            *[
                F.expr(f"percentile(value, {p})").alias(str(p))
                for p in (0.25, 0.5, 0.75)
            ]
        ).collect()[0]
        for p in (0.25, 0.5, 0.75):
            assert abs(est[p] - exact[str(p)]) <= width

    def test_rejects_bad_inputs(self, spark):
        from lotad_spark.operators import (
            column_histogram,
            quantiles_from_counts,
        )

        df = spark.createDataFrame([(1.0,)], "value double")
        with pytest.raises(ValueError):
            column_histogram(df, col="value", lo=5.0, hi=5.0, n_bins=3)
        counts = spark.createDataFrame([(0, 1)], "bin_id bigint, n bigint")
        with pytest.raises(ValueError):
            quantiles_from_counts(counts, lo=0.0, hi=1.0, n_bins=1, qs=[])
        with pytest.raises(ValueError):
            quantiles_from_counts(
                counts, lo=0.0, hi=1.0, n_bins=1, qs=[0.0]
            )

    def test_grouped_quantiles_match_per_group_runs(self, spark):
        from lotad_spark.operators import quantiles_from_counts

        counts = spark.createDataFrame(
            [("a", 0, 2), ("a", 3, 2), ("b", 9, 4)],
            "g string, bin_id bigint, n bigint",
        )
        args = dict(lo=0.0, hi=10.0, n_bins=10, qs=[0.5, 1.0])
        grouped = {
            (r["g"], r["q"]): r["est"]
            for r in quantiles_from_counts(
                counts, group_cols=["g"], **args
            ).collect()
        }
        for g in ("a", "b"):
            solo = {
                r["q"]: r["est"]
                for r in quantiles_from_counts(
                    counts.filter(F.col("g") == g).drop("g"), **args
                ).collect()
            }
            for q, est in solo.items():
                assert grouped[(g, q)] == est
        assert len(grouped) == 4


class TestQuantileBuckets:
    def test_uniform_values_bucket_evenly(self, spark):
        from lotad_spark.operators.profile import quantile_buckets

        df = spark.range(1000).select(
            F.col("id"), (F.col("id") + 0.5).cast("double").alias("v")
        )
        out = quantile_buckets(
            df, "v", lo=0.0, hi=1000.0, n_buckets=10, n_bins=100
        )
        sizes = {
            r.bucket: r.n
            for r in out.groupBy("bucket").agg(F.count("*").alias("n")).collect()
        }
        assert set(sizes) == set(range(10))
        # uniform data: each decile holds ~100 of 1000 (bin-width slack)
        for b, n in sizes.items():
            assert 80 <= n <= 120, (b, n)
        # buckets are monotone in the value
        rows = out.orderBy("v").collect()
        assert all(
            a.bucket <= b.bucket for a, b in zip(rows, rows[1:])
        )

    def test_null_and_bounds(self, spark):
        from lotad_spark.operators.profile import quantile_buckets

        import pytest as _pytest

        df = spark.createDataFrame(
            [(1, 5.0), (2, None), (3, 9999.0), (4, -50.0)],
            "id long, v double",
        )
        out = {
            r.id: r.bucket
            for r in quantile_buckets(
                df, "v", lo=0.0, hi=100.0, n_buckets=4, n_bins=10
            ).collect()
        }
        assert out[2] is None          # NULL stays NULL
        assert out[3] == 3             # above range -> top bucket
        assert out[4] == 0             # below range -> bottom bucket
        with _pytest.raises(ValueError):
            quantile_buckets(df, "v", lo=0.0, hi=1.0, n_buckets=1)


class TestJsonKeyStats:
    def test_key_vocabulary_and_counts(self, spark):
        from lotad_spark.operators.profile import json_key_stats

        rows = [
            (1, '{"a": 1, "b": "x"}'),
            (2, '{"a": 2, "b": "x", "c": null}'),
            (3, '{"a": 1}'),
            (4, 'not json at all'),
            (5, None),
            (6, '[1, 2, 3]'),  # non-object: contributes nothing
        ]
        df = spark.createDataFrame(rows, "id long, props string")
        got = {
            r.key: (r.n_rows, r.n_nulls, r.n_distinct_values)
            for r in json_key_stats(df, "props").collect()
        }
        assert got == {
            "a": (3, 0, 2),   # values 1, 2, 1
            "b": (2, 0, 1),   # "x" twice
            "c": (1, 1, 0),   # json null -> counted null, no distinct
        }

    def test_real_events_props(self, spark, sf_dir):
        from lotad_spark.operators.profile import json_key_stats
        from lotad_spark.sources.parquet import ParquetDatabase

        ev = ParquetDatabase(spark, sf_dir, "db").table("events")
        rows = json_key_stats(ev, "props").collect()
        assert len(rows) >= 1
        total = ev.filter("props IS NOT NULL").count()
        assert all(r.n_rows <= total for r in rows)


class TestJsonSchemaDrift:
    def test_key_add_drop_and_value_shift(self, spark):
        from lotad_spark.operators.profile import json_schema_drift

        s1 = spark.createDataFrame(
            [(1, '{"a": 1, "b": "x"}'), (2, '{"a": 2, "b": "x"}'),
             (3, '{"a": 1}')],
            "id long, props string",
        )
        # key b dropped from one row, key c introduced, a's values shift
        s2 = spark.createDataFrame(
            [(1, '{"a": 1, "b": "x"}'), (2, '{"a": 3, "c": null}'),
             (3, '{"a": 1}')],
            "id long, props string",
        )
        got = {
            r.key: (
                r.n_rows_1, r.n_nulls_1, r.n_distinct_values_1,
                r.n_rows_2, r.n_nulls_2, r.n_distinct_values_2,
            )
            for r in json_schema_drift(s1, s2, "props").collect()
        }
        assert got == {
            "b": (2, 0, 1, 1, 0, 1),
            "c": (0, 0, 0, 1, 1, 0),
        }
        # a: n_rows 3==3, n_nulls 0==0, distinct {1,2} vs {1,3} -> 2==2
        # => identical stats, filtered out (value drift below the stat
        # granularity is keyed_diff's job, not schema drift's)
        assert "a" not in got

    def test_identical_sides_emit_nothing(self, spark):
        from lotad_spark.operators.profile import json_schema_drift

        s = spark.createDataFrame(
            [(1, '{"a": 1}'), (2, "bad json"), (3, None)],
            "id long, props string",
        )
        assert json_schema_drift(s, s, "props").isEmpty()

    def test_random_sides_match_reference(self, spark):
        """Seeded random JSON sides vs an independent in-memory
        reference computing the same per-key stats and drift filter."""
        import json as jsonlib
        import random
        from collections import defaultdict

        from lotad_spark.operators.profile import json_schema_drift

        rng = random.Random(20260814)
        keys = ["a", "b", "c", "d"]

        def mk_side(mutate):
            rows = []
            for i in range(120):
                if rng.random() < 0.05:
                    rows.append((i, None))
                    continue
                obj = {
                    k: rng.choice([1, 2, "x", None])
                    for k in keys
                    if rng.random() < 0.6
                }
                if mutate and rng.random() < 0.2:
                    obj["extra"] = i % 3
                rows.append((i, jsonlib.dumps(obj)))
            return rows

        s1_rows, s2_rows = mk_side(False), mk_side(True)

        def stats(rows):
            st = defaultdict(lambda: [0, 0, set()])
            for _, props in rows:
                if props is None:
                    continue
                obj = jsonlib.loads(props)
                for k, v in obj.items():
                    st[k][0] += 1
                    if v is None:
                        st[k][1] += 1
                    else:
                        # map<string,string> coercion: numbers land as
                        # their JSON text
                        st[k][2].add(str(v))
            return {
                k: (n, nn, len(vals)) for k, (n, nn, vals) in st.items()
            }

        st1, st2 = stats(s1_rows), stats(s2_rows)
        expected = {}
        for k in set(st1) | set(st2):
            a = st1.get(k, (0, 0, 0))
            b = st2.get(k, (0, 0, 0))
            if a != b:
                expected[k] = a + b

        d1 = spark.createDataFrame(s1_rows, "id long, props string")
        d2 = spark.createDataFrame(s2_rows, "id long, props string")
        got = {
            r.key: (
                r.n_rows_1, r.n_nulls_1, r.n_distinct_values_1,
                r.n_rows_2, r.n_nulls_2, r.n_distinct_values_2,
            )
            for r in json_schema_drift(d1, d2, "props").collect()
        }
        assert got == expected
