"""Custom-query path (Q1-Q3) + config surface, ported from the reference
suite (test/custom_query_test.py:26-141)."""

import pyspark.sql.functions as F
import pytest

from lotad_spark.compare import compare_all
from lotad_spark.config import Config, TableConfig, TableRule
from lotad_spark.operators.custom_query import (
    custom_query_frame,
    extract_tables,
    qualify_tables,
)
from lotad_spark.sources.memory import DictDatabase


class TestQueryRewrite:
    def test_simple_select(self):
        q = " SELECT a, b FROM customer ;"
        assert qualify_tables(q, "db1") == " SELECT a, b FROM db1.customer ;"

    def test_join_rewrite(self):
        q = " SELECT c.a, o.b FROM customer c JOIN orders o ON c.id = o.cid ;"
        got = qualify_tables(q, "db1")
        assert "db1.customer c" in got and "db1.orders o" in got

    def test_subquery_rewrite(self):
        q = " SELECT * FROM (SELECT a FROM customer) t ;"
        got = qualify_tables(q, "db2")
        assert "FROM db2.customer)" in got

    def test_where_clause_untouched(self):
        q = " SELECT a FROM customer WHERE a > 10 ;"
        got = qualify_tables(q, "db1")
        assert got.endswith("WHERE a > 10 ;")

    def test_extract_tables(self):
        assert extract_tables("SELECT * FROM a JOIN b ON a.x = b.x") == ["a", "b"]
        assert extract_tables("not sql at all") == []


class TestTableConfigValidation:
    def test_cte_rejected(self):
        with pytest.raises(ValueError, match="CTEs are not currently supported"):
            TableConfig("t", query="WITH x AS (SELECT 1) SELECT * FROM x")

    def test_unparseable_rejected(self):
        with pytest.raises(ValueError, match="Unable to parse query"):
            TableConfig("t", query="garbage text")

    def test_whitespace_normalized_and_semicolon(self):
        tc = TableConfig("t", query="  SELECT a\n   FROM customer  ")
        assert tc.query == "SELECT a\nFROM customer;"

    def test_ignore_columns_from_rules(self):
        tc = TableConfig(
            "t",
            rules=[
                {"rule_type": "ignore_column", "rule_value": "b"},
                {"rule_type": "ignore_column", "rule_value": "a"},
            ],
        )
        assert tc.ignore_columns == ["a", "b"]


class TestConfigRoundTrip:
    def test_yaml_round_trip(self, tmp_path):
        cfg = Config(
            db1_path="/x/db1",
            db2_path="/x/db2",
            ignore_tables=["tmp_.*"],
            table_configs=[
                {
                    "table_name": "customer",
                    "rules": [{"rule_type": "ignore_column", "rule_value": "id"}],
                    "query": "SELECT a FROM customer",
                }
            ],
            ignore_dates=True,
        )
        p = tmp_path / "cfg.yaml"
        cfg.write(str(p))
        loaded = Config.load(str(p))
        assert loaded.db1_path == "/x/db1"
        assert loaded.ignore_tables == ["tmp_.*"]
        assert loaded.ignore_dates is True
        tc = loaded.get_table_config("customer")
        assert tc.ignore_columns == ["id"]
        assert tc.query == "SELECT a FROM customer;"

    def test_update_table_config(self):
        cfg = Config(db1_path="a", db2_path="b")
        cfg.update_table_config(
            "t", table_rule=TableRule("ignore_column", "uuid_col")
        )
        assert cfg.get_table_config("t").ignore_columns == ["uuid_col"]


class TestJdbcCredentials:
    """Secrets-out-of-YAML contract: ${ENV_VAR} references resolve only at
    connect time and survive serialization as references."""

    _SPEC = {
        "url": "jdbc:postgresql://db.example/prod",
        "properties": {
            "driver": "org.postgresql.Driver",
            "user": "svc",
            "password": "${LOTAD_TEST_DB_PASSWORD}",
        },
        "tables": ["customer"],
    }

    def test_password_never_lands_in_yaml(self, tmp_path, monkeypatch):
        monkeypatch.setenv("LOTAD_TEST_DB_PASSWORD", "s3cret-hunter2")
        cfg = Config(db1_path="/x/db1", db2_jdbc=dict(self._SPEC))
        p = tmp_path / "cfg.yaml"
        cfg.write(str(p))
        text = p.read_text()
        assert "s3cret-hunter2" not in text
        assert "${LOTAD_TEST_DB_PASSWORD}" in text
        loaded = Config.load(str(p))
        assert (
            loaded.db2_jdbc["properties"]["password"]
            == "${LOTAD_TEST_DB_PASSWORD}"
        )

    def test_literal_password_rejected(self):
        spec = {
            "url": "jdbc:postgresql://db.example/prod",
            "properties": {"password": "hunter2"},
        }
        with pytest.raises(ValueError, match="literal password"):
            Config(db1_path="/x/db1", db2_jdbc=spec)

    def test_resolution_at_connect_time(self, spark, monkeypatch):
        from lotad_spark.config import database_from_config

        monkeypatch.setenv("LOTAD_TEST_DB_PASSWORD", "s3cret-hunter2")
        cfg = Config(db1_path="/x/db1", db2_jdbc=dict(self._SPEC))
        db2 = database_from_config(spark, cfg, "db2")
        assert db2.properties["password"] == "s3cret-hunter2"
        assert db2.properties["user"] == "svc"
        assert db2.list_tables() == ["customer"]
        # the Config object itself still holds only the reference
        assert cfg.dict()["db2_jdbc"]["properties"]["password"] == (
            "${LOTAD_TEST_DB_PASSWORD}"
        )

    def test_unset_env_var_is_loud(self, spark, monkeypatch):
        from lotad_spark.config import database_from_config

        monkeypatch.delenv("LOTAD_TEST_DB_PASSWORD", raising=False)
        cfg = Config(db1_path="/x/db1", db2_jdbc=dict(self._SPEC))
        with pytest.raises(KeyError, match="LOTAD_TEST_DB_PASSWORD"):
            database_from_config(spark, cfg, "db2")

    def test_exactly_one_source_per_side(self):
        with pytest.raises(ValueError, match="exactly one"):
            Config(db1_path="a", db1_jdbc=self._SPEC, db2_path="b")
        with pytest.raises(ValueError, match="exactly one"):
            Config(db2_path="b")


class TestCustomQueryExecution:
    def test_frame_runs_against_side(self, spark, sf_dir):
        from lotad_spark.sources.parquet import ParquetDatabase

        db = ParquetDatabase(spark, sf_dir, "db1")
        df = custom_query_frame(
            spark,
            db,
            "SELECT c_custkey, c_name FROM customer WHERE c_custkey < 10;",
            view_prefix="_t_db1",
        )
        assert df.columns == ["c_custkey", "c_name"]
        assert df.count() > 0

    def test_custom_query_diff_e2e(self, spark, sf_dir, tmp_path):
        from lotad_spark.sources.parquet import ParquetDatabase

        base = ParquetDatabase(spark, sf_dir, "db").table("customer")
        mutated = base.withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey") == 7, F.col("c_acctbal") + 5).otherwise(
                F.col("c_acctbal")
            ),
        )
        db1 = DictDatabase({"customer": base}, "db1")
        db2 = DictDatabase({"customer": mutated}, "db2")
        # Custom query projects AWAY the mutated column → no drift.
        res = compare_all(
            spark,
            db1,
            db2,
            output_path=str(tmp_path / "out"),
            table_queries={
                "customer": "SELECT c_custkey, c_name FROM customer;"
            },
        )
        assert res.analysis.get_data_drift_summary() == []
        # And a query that KEEPS it → drift on both sides.
        res2 = compare_all(
            spark,
            db1,
            db2,
            output_path=str(tmp_path / "out2"),
            table_queries={
                "customer": "SELECT c_custkey, c_acctbal FROM customer;"
            },
        )
        summary = res2.analysis.get_data_drift_summary()
        assert summary[0]["rows_only_in_db1"] == 1
        assert summary[0]["rows_only_in_db2"] == 1
