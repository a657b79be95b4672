"""JDBC source surface (plan-level — no driver jars in this container)
and CLI argument handling."""

import pytest
from click.testing import CliRunner

from lotad_spark.cli import cli
from lotad_spark.sources.jdbc import JdbcDatabase, PostgresDatabase, SqliteDatabase


class TestJdbcSource:
    def test_injected_table_list_sorted(self, spark):
        db = JdbcDatabase(spark, "jdbc:postgresql://h/db", tables=["b", "a"])
        assert db.list_tables() == ["a", "b"]

    def test_requires_table_list_or_subclass(self, spark):
        with pytest.raises(NotImplementedError):
            JdbcDatabase(spark, "jdbc:x://h/db").list_tables()

    def test_postgres_url_and_driver(self, spark):
        db = PostgresDatabase(
            spark, "h", "mydb", user="u", password="p", port=5433, tables=["t"]
        )
        assert db.url == "jdbc:postgresql://h:5433/mydb"
        assert db.properties["driver"] == "org.postgresql.Driver"
        assert db.db_id == "mydb"

    def test_sqlite_url(self, spark):
        db = SqliteDatabase(spark, "/tmp/x.db", tables=["t"])
        assert db.url == "jdbc:sqlite:/tmp/x.db"


class TestCli:
    def test_help(self):
        result = CliRunner().invoke(cli, ["--help"])
        assert result.exit_code == 0
        assert "run" in result.output
        assert "suggest-ignore-columns" in result.output

    def test_run_requires_inputs(self):
        result = CliRunner().invoke(cli, ["run"])
        assert result.exit_code != 0
        assert "provide --config or both --db1 and --db2" in result.output
