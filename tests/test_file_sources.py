"""CSV / JSON-lines database sources: catalog surface + full diff parity
with the parquet-backed equivalent."""

import duckdb
import pytest

from lotad_spark.operators.diff import diff_tables
from lotad_spark.sources import (
    CsvDatabase,
    JsonlDatabase,
    OrcDatabase,
    ParquetDatabase,
)


@pytest.fixture(scope="module")
def exports(spark, sf_dir, tmp_path_factory):
    """customer + nation exported to csv and jsonl, with one deleted row
    and one value change in the csv/jsonl copy of customer."""
    root = tmp_path_factory.mktemp("file_dbs")
    con = duckdb.connect()
    for fmt in ("csv", "jsonl"):
        d = root / fmt
        d.mkdir()
        for t in ("customer", "nation"):
            mutate = (
                "SELECT c_custkey, c_name, c_nationkey, "
                "CASE WHEN c_custkey = 7 THEN c_acctbal + 1 ELSE c_acctbal "
                "END AS c_acctbal, c_mktsegment "
                f"FROM '{sf_dir}/customer.parquet' WHERE c_custkey <> 13"
                if t == "customer"
                else f"SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
            out = d / f"{t}.{fmt}"
            if fmt == "csv":
                con.execute(
                    f"COPY ({mutate}) TO '{out}' (FORMAT CSV, HEADER)"
                )
            else:
                con.execute(f"COPY ({mutate}) TO '{out}' (FORMAT JSON)")
    return root


class TestFileDatabases:
    def test_catalog_lists_tables(self, spark, exports):
        assert CsvDatabase(spark, str(exports / "csv")).list_tables() == [
            "customer",
            "nation",
        ]
        assert JsonlDatabase(spark, str(exports / "jsonl")).list_tables() == [
            "customer",
            "nation",
        ]

    @pytest.mark.parametrize("fmt", ["csv", "jsonl"])
    def test_diff_against_parquet_side(self, spark, sf_dir, exports, fmt):
        cls = CsvDatabase if fmt == "csv" else JsonlDatabase
        fdb = cls(spark, str(exports / fmt), "export")
        pdb = ParquetDatabase(spark, sf_dir, "truth")
        # customer: deleted key 13 (truth-only) + changed key 7 (both sides)
        res = diff_tables(
            pdb.table("customer").select(
                "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
            ),
            fdb.table("customer"),
            db1_id="truth",
            db2_id="export",
        )
        rows = res.diff.collect()
        by_key = {}
        for r in rows:
            by_key.setdefault(int(r.c_custkey), []).append(r.observed_in)
        assert by_key[13] == ["truth"]
        assert sorted(by_key[7]) == ["export", "truth"]
        assert set(by_key) == {7, 13}
        # nation: identical content → no drift despite the format change
        assert diff_tables(
            pdb.table("nation"), fdb.table("nation")
        ).diff.isEmpty()

    def test_explicit_schema_skips_inference(self, spark, exports):
        db = CsvDatabase(
            spark,
            str(exports / "csv"),
            schemas={
                "nation": "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"
            },
        )
        assert [f.dataType.simpleString() for f in db.table("nation").schema] == [
            "bigint",
            "string",
            "bigint",
        ]


@pytest.fixture(scope="module")
def orc_exports(spark, sf_dir, tmp_path_factory):
    """customer + nation written as ORC (Spark-side export: DuckDB can't
    COPY TO orc), with the same delete/value-change mutations the text
    fixtures use."""
    from pyspark.sql import functions as F

    root = tmp_path_factory.mktemp("orc_db")
    pdb = ParquetDatabase(spark, sf_dir, "truth")
    cust = (
        pdb.table("customer")
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                "c_mktsegment")
        .filter("c_custkey <> 13")
        .withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey") == 7, F.col("c_acctbal") + 1)
            .otherwise(F.col("c_acctbal")),
        )
    )
    cust.write.mode("overwrite").orc(str(root / "customer.orc"))
    pdb.table("nation").write.mode("overwrite").orc(str(root / "nation.orc"))
    return root


class TestOrcDatabase:
    def test_catalog_strips_extension_from_dir_tables(self, spark, orc_exports):
        assert OrcDatabase(spark, str(orc_exports)).list_tables() == [
            "customer",
            "nation",
        ]

    def test_diff_against_parquet_side(self, spark, sf_dir, orc_exports):
        odb = OrcDatabase(spark, str(orc_exports), "export")
        pdb = ParquetDatabase(spark, sf_dir, "truth")
        res = diff_tables(
            pdb.table("customer").select(
                "c_custkey", "c_name", "c_nationkey", "c_acctbal",
                "c_mktsegment"
            ),
            odb.table("customer"),
            db1_id="truth",
            db2_id="export",
        )
        by_key = {}
        for r in res.diff.collect():
            by_key.setdefault(int(r.c_custkey), []).append(r.observed_in)
        assert by_key[13] == ["truth"]
        assert sorted(by_key[7]) == ["export", "truth"]
        assert set(by_key) == {7, 13}
        assert diff_tables(
            pdb.table("nation"), odb.table("nation")
        ).diff.isEmpty()

    def test_no_inference_and_pushdown_reaches_orc_scan(
        self, spark, orc_exports
    ):
        # self-describing footer: schema available without any job, typed
        db = OrcDatabase(spark, str(orc_exports))
        t = db.table("customer")
        assert t.schema["c_custkey"].dataType.simpleString() == "bigint"
        # predicate pushdown + column pruning reach the ORC scan
        plan = (
            t.filter("c_custkey = 7")
            .select("c_custkey", "c_acctbal")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        scan = [l for l in plan.splitlines() if "FileScan orc" in l]
        assert scan, plan
        assert "PushedFilters: [" in plan and "c_custkey" in plan.split(
            "PushedFilters:"
        )[1]
