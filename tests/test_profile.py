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
