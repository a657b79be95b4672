"""Bucketed tables: the join between two same-bucketed tables must plan
with NO Exchange (the shuffle happened at write time)."""

import pyspark.sql.functions as F

from lotad_spark.sources.bucketed import read_bucketed, write_bucketed


def _executed_plan(df):
    # Execute first: AQE's pre-execution plan omits the exchanges it has
    # not planned yet — only the final plan proves shuffle absence.
    df.count()
    return df._jdf.queryExecution().executedPlan().toString()


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, sf_dir):
        from lotad_spark.sources.parquet import ParquetDatabase

        orders = ParquetDatabase(spark, sf_dir, "db").table("orders")
        write_bucketed(orders, "b_orders_a", "o_orderkey", buckets=8)
        write_bucketed(
            orders.withColumn("o_totalprice", F.col("o_totalprice") + 1),
            "b_orders_b",
            "o_orderkey",
            buckets=8,
        )
        a, b = read_bucketed(spark, "b_orders_a"), read_bucketed(spark, "b_orders_b")
        joined = a.join(b.select("o_orderkey"), "o_orderkey")
        # Force the shuffle-join path: broadcast would hide whether the
        # bucket spec removed the exchanges.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _executed_plan(joined)
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan
            assert joined.count() == orders.count()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_mismatched_buckets_reintroduce_shuffle(self, spark, sf_dir):
        from lotad_spark.sources.parquet import ParquetDatabase

        orders = ParquetDatabase(spark, sf_dir, "db").table("orders")
        write_bucketed(orders, "b_orders_c", "o_orderkey", buckets=4)
        a, c = read_bucketed(spark, "b_orders_a"), read_bucketed(spark, "b_orders_c")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _executed_plan(a.join(c.select("o_orderkey"), "o_orderkey"))
            assert "Exchange" in plan  # same-count requirement
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
