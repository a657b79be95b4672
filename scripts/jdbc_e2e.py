"""Live-JDBC end-to-end drive: DuckDB files behind the JdbcDatabase path.

Builds two DuckDB database FILES (db1, db2-with-known-mutations), opens
both through Spark's JDBC reader with the public ``org.duckdb:duckdb_jdbc``
driver, and runs the full diff through the same public API a Postgres or
SQLite user would hit — driver registration, catalog listing
(``list_tables``), schema introspection, the min/max bounds probe, and a
partitioned scan. This is the e2e the plan-level JDBC unit tests can't
give (no network DBs in the container; a DuckDB *file* needs only a jar).

Run:  PYTHONPATH=/root/repo python scripts/jdbc_e2e.py <path-to-duckdb-jdbc-jar>
Prints one line per check; exits non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    jar = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    import duckdb
    from pyspark.sql import SparkSession

    work = tempfile.mkdtemp(prefix="jdbc_e2e_")
    db1_path = os.path.join(work, "db1.duckdb")
    db2_path = os.path.join(work, "db2.duckdb")

    for path, mutate in ((db1_path, False), (db2_path, True)):
        con = duckdb.connect(path)
        con.execute(
            f"CREATE TABLE customer AS SELECT * FROM '{sf_dir}/customer.parquet'"
        )
        con.execute(
            f"CREATE TABLE nation AS SELECT * FROM '{sf_dir}/nation.parquet'"
        )
        if mutate:
            con.execute("DELETE FROM customer WHERE c_custkey = 7")
            con.execute(
                "UPDATE customer SET c_acctbal = c_acctbal + 99 WHERE c_custkey = 3"
            )
        con.close()

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("jdbc_e2e")
        .config("spark.jars", jar)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    from lotad_spark.operators.diff import diff_tables
    from lotad_spark.sources.jdbc import DuckDbDatabase

    d1 = DuckDbDatabase(
        spark, db1_path, "db1", partition_columns={"customer": "c_custkey"}
    )
    d2 = DuckDbDatabase(spark, db2_path, "db2")

    failures = []

    tables = d1.list_tables()
    print(f"list_tables: {tables}")
    if tables != ["customer", "nation"]:
        failures.append(f"catalog scan wrong: {tables}")

    schema = d1.get_schema("customer")
    print(f"schema cols: {sorted(schema)}")
    if "c_custkey" not in schema:
        failures.append(f"schema introspection wrong: {schema}")

    # Partitioned scan really shards: the bounds probe ran and the scan
    # carries numPartitions range partitions.
    n_parts = d1.table("customer").rdd.getNumPartitions()
    print(f"partitioned scan partitions: {n_parts}")
    if n_parts < 2:
        failures.append(f"partitioned JDBC scan not sharded: {n_parts}")

    r = diff_tables(d1.table("customer"), d2.table("customer"),
                    db1_id="db1", db2_id="db2")
    counts = r.counts()
    print(f"diff counts: {counts}")
    # deleted row (only db1) + both versions of the value change
    if counts != {"db1": 2, "db2": 1}:
        failures.append(f"diff counts wrong: {counts}")

    r2 = diff_tables(d1.table("nation"), d2.table("nation"),
                     db1_id="db1", db2_id="db2")
    if not r2.is_empty():
        failures.append("identical nation tables drifted")
    print("nation identical: ok")

    # Config→credentials path, live: a YAML-shaped config with a
    # ${ENV_VAR}-referenced property builds a working JdbcDatabase (the
    # dummy 'sessioninit' property is resolved from env and accepted by
    # the DuckDB driver; a password would flow the same way).
    from lotad_spark.config import Config, database_from_config

    os.environ["JDBC_E2E_DUMMY"] = "true"
    cfg = Config(
        db1_path=sf_dir,
        db2_jdbc={
            "url": f"jdbc:duckdb:{db1_path}",
            "properties": {
                "driver": "org.duckdb.DuckDBDriver",
                "duckdb.read_only": "${JDBC_E2E_DUMMY}",
            },
            "tables": ["customer", "nation"],
        },
    )
    via_cfg = database_from_config(spark, cfg, "db2")
    n = via_cfg.table("customer").count()
    print(f"config-built JDBC scan rows: {n}")
    if n == 0:
        failures.append("config-built JDBC database returned no rows")
    if via_cfg.properties["duckdb.read_only"] != "true":
        failures.append(
            f"env ref not resolved: {via_cfg.properties['duckdb.read_only']}"
        )
    if "true" in str(cfg.dict()["db2_jdbc"]["properties"]["duckdb.read_only"]):
        failures.append("resolved value leaked back into config dict")

    if failures:
        print(f"FAILURES: {failures}")
        return 1
    print("JDBC_E2E_ALL_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
