"""Salted-join / two-phase-agg parity with their unsalted equivalents."""

import pyspark.sql.functions as F
import pytest

from lotad_spark.operators.skew import salted_join, two_phase_agg


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (k=1, 5000 rows) + a long tail
    hot = spark.range(5000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    tail = spark.range(100).select((F.col("id") + 2).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(tail)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(50).select(
        (F.col("id") + 1).alias("k"), (F.col("id") * 10).alias("w")
    )


class TestSaltedJoin:
    def test_inner_matches_plain_join(self, skewed, dim):
        plain = skewed.join(dim, "k").groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
        )
        salted = salted_join(skewed, dim, "k", buckets=8).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        )

    def test_left_keeps_unmatched(self, skewed, dim):
        unmatched_keys = skewed.join(dim, "k", "left_anti").count()
        out = salted_join(skewed, dim, "k", how="left")
        assert out.filter(F.col("w").isNull()).count() == unmatched_keys

    def test_hot_key_spread_across_buckets(self, spark, skewed, dim):
        # the hot key's rows must land in >1 salt bucket pre-join
        from lotad_spark.operators.skew import _salt_col

        n = (
            skewed.filter(F.col("k") == 1)
            .withColumn("_salt", _salt_col(skewed, 8))
            .select("_salt")
            .distinct()
            .count()
        )
        assert n > 1

    def test_rejects_right_join(self, skewed, dim):
        with pytest.raises(ValueError):
            salted_join(skewed, dim, "k", how="right")


class TestTwoPhaseAgg:
    def test_matches_direct_aggregate(self, skewed):
        direct = skewed.groupBy("k").agg(
            F.sum("v").alias("sv"),
            F.count("v").alias("nv"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        two = two_phase_agg(
            skewed,
            ["k"],
            {"sv": ("sum", "v"), "nv": ("count", "v"),
             "mn": ("min", "v"), "mx": ("max", "v")},
        )
        assert sorted(map(tuple, direct.collect())) == sorted(
            map(tuple, two.select("k", "sv", "nv", "mn", "mx").collect())
        )

    def test_rejects_non_algebraic(self, skewed):
        with pytest.raises(ValueError):
            two_phase_agg(skewed, ["k"], {"a": ("avg", "v")})
