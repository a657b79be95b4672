"""Native stdlib-sqlite3 source: catalog, schema affinity mapping,
partitioned rowid scan, pushdown, and full diff parity with parquet."""

import sqlite3

import pandas as pd
import pytest

from lotad_spark.operators.diff import diff_tables
from lotad_spark.sources import ParquetDatabase, SqliteNativeDatabase, write_sqlite


@pytest.fixture(scope="module")
def sqlite_db(spark, sf_dir, tmp_path_factory):
    """customer + nation landed in one .sqlite file, with one deleted row
    and one value change in the sqlite copy of customer (the same fixture
    shape test_file_sources uses, so diff expectations match)."""
    path = str(tmp_path_factory.mktemp("sqlite_db") / "export.sqlite")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")[
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    ]
    cust = cust[cust.c_custkey != 13].copy()
    cust["c_acctbal"] = cust.c_acctbal.astype(float)
    cust.loc[cust.c_custkey == 7, "c_acctbal"] += 1
    write_sqlite(cust, path, "customer")
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    write_sqlite(nation, path, "nation")
    return path


class TestSqliteNative:
    def test_catalog_and_schema(self, spark, sqlite_db):
        db = SqliteNativeDatabase(spark, sqlite_db)
        assert db.list_tables() == ["customer", "nation"]
        schema = db.get_schema("customer")
        assert schema["c_custkey"] == "BIGINT"
        assert schema["c_acctbal"] == "DOUBLE"
        assert schema["c_name"] == "VARCHAR"

    def test_scan_matches_file(self, spark, sqlite_db):
        db = SqliteNativeDatabase(spark, sqlite_db, num_partitions=4)
        df = db.table("customer")
        # sharded over 4 rowid ranges, no rows lost or duplicated
        assert df.rdd.getNumPartitions() == 4
        with sqlite3.connect(sqlite_db) as con:
            n, s = con.execute(
                "SELECT count(*), sum(c_custkey) FROM customer"
            ).fetchone()
        got = df.groupBy().agg({"c_custkey": "sum", "*": "count"}).collect()[0]
        assert got["count(1)"] == n
        assert got["sum(c_custkey)"] == s

    def test_pushdown_and_pruning(self, spark, sqlite_db):
        db = SqliteNativeDatabase(spark, sqlite_db, num_partitions=2)
        df = db.table(
            "customer", columns=["c_custkey"], predicate="c_custkey <= 10"
        )
        assert df.columns == ["c_custkey"]
        keys = sorted(r.c_custkey for r in df.collect())
        with sqlite3.connect(sqlite_db) as con:
            want = sorted(
                r[0] for r in con.execute(
                    "SELECT c_custkey FROM customer WHERE c_custkey <= 10"
                )
            )
        assert keys == want and want and max(keys) <= 10

    def test_empty_and_missing_table(self, spark, tmp_path):
        path = str(tmp_path / "empty.sqlite")
        with sqlite3.connect(path) as con:
            con.execute("CREATE TABLE t (a INTEGER, b TEXT)")
        db = SqliteNativeDatabase(spark, path)
        assert db.table("t").count() == 0
        assert db.table("t").columns == ["a", "b"]
        with pytest.raises(ValueError, match="no such sqlite table"):
            db.table("nope")

    def test_without_rowid_fallback(self, spark, tmp_path):
        path = str(tmp_path / "worid.sqlite")
        with sqlite3.connect(path) as con:
            con.execute(
                "CREATE TABLE kv (k INTEGER PRIMARY KEY, v TEXT) WITHOUT ROWID"
            )
            con.executemany("INSERT INTO kv VALUES (?, ?)",
                            [(i, f"v{i}") for i in range(20)])
        df = SqliteNativeDatabase(spark, path).table("kv")
        assert df.count() == 20
        assert sorted(r.k for r in df.collect()) == list(range(20))

    def test_null_reals_become_null_not_nan(self, spark, tmp_path):
        path = str(tmp_path / "realnull.sqlite")
        with sqlite3.connect(path) as con:
            con.execute("CREATE TABLE t (a REAL)")
            con.executemany("INSERT INTO t VALUES (?)", [(1.5,), (None,)])
        rows = SqliteNativeDatabase(spark, path).table("t").collect()
        vals = sorted((r.a for r in rows), key=lambda x: (x is None, x or 0))
        assert vals == [1.5, None]  # SQL NULL, not NaN

    def test_null_ints_stay_integral(self, spark, tmp_path):
        path = str(tmp_path / "nulls.sqlite")
        with sqlite3.connect(path) as con:
            con.execute("CREATE TABLE t (a INTEGER)")
            con.executemany("INSERT INTO t VALUES (?)", [(1,), (None,), (3,)])
        rows = SqliteNativeDatabase(spark, path).table("t").collect()
        assert sorted((r.a for r in rows), key=lambda x: (x is None, x)) == [1, 3, None]

    def test_config_routes_sqlite_file_by_magic(self, spark, sqlite_db, sf_dir):
        """A *_path pointing at a SQLite file (sniffed by the 16-byte
        magic header) builds the native source; a directory still builds
        ParquetDatabase — so the CLI works on .sqlite inputs unchanged."""
        from lotad_spark.config import Config, database_from_config
        from lotad_spark.sources import ParquetDatabase

        cfg = Config(db1_path=sf_dir, db2_path=sqlite_db, output_path="x")
        assert isinstance(
            database_from_config(spark, cfg, "db1"), ParquetDatabase
        )
        assert isinstance(
            database_from_config(spark, cfg, "db2"), SqliteNativeDatabase
        )

    def test_compare_all_with_sqlite_side(
        self, spark, sf_dir, sqlite_db, tmp_path
    ):
        """The full orchestrator treats a live sqlite file as a first-class
        side: catalog intersection, per-table drift counts, and the summary
        sink all work unchanged through the duck-typed database surface."""
        from lotad_spark.compare import compare_all
        from lotad_spark.sources import ParquetDatabase

        res = compare_all(
            spark,
            ParquetDatabase(spark, sf_dir, "truth"),
            SqliteNativeDatabase(spark, sqlite_db, "export"),
            output_path=str(tmp_path / "out"),
        )
        assert sorted(res.compared_tables) == ["customer", "nation"]
        drifted = {d.table_name: d for d in res.data_drift}
        # nation round-trips identically → no drift entry materialized
        assert set(drifted) == {"customer"}
        # deleted key 13 + changed key 7 → truth-only rows on both counts
        assert drifted["customer"].rows_only_in_db1 == 2
        assert drifted["customer"].rows_only_in_db2 == 1
        assert "customer" in res.report()

    def test_diff_against_parquet_side(self, spark, sf_dir, sqlite_db):
        sdb = SqliteNativeDatabase(spark, sqlite_db, db_id="export")
        pdb = ParquetDatabase(spark, sf_dir, "truth")
        res = diff_tables(
            pdb.table("customer").select(
                "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
            ),
            sdb.table("customer"),
            db1_id="truth",
            db2_id="export",
        )
        by_key = {}
        for r in res.diff.collect():
            by_key.setdefault(int(r.c_custkey), set()).add(r.observed_in)
        assert by_key[13] == {"truth"}          # deleted in export
        assert by_key[7] == {"truth", "export"}  # value change → both sides
        assert set(by_key) == {7, 13}
        # nation round-tripped unchanged → zero drift across engines
        sdb2 = SqliteNativeDatabase(spark, sqlite_db)
        assert diff_tables(
            pdb.table("nation"), sdb2.table("nation")
        ).diff.isEmpty()
