"""Measure the reference-algorithm DuckDB baseline at a given scale factor.

BASELINE.md requires the baseline to be measured, not cited: build db1/db2
database variants from the driver testdata (deterministic mutations), then
run the reference's per-table diff pipeline — canonical row hash as a
scalar Python UDF over ``TO_JSON(t)::VARCHAR`` feeding a symmetric hash
ANTI JOIN + UNION (semantics per reference
lotad/queries/duckdb/db_compare_create_tmp_table_merge.sql:1-45 and
lotad/utils.py:19-77) — and record sec/table + total wall clock.

One documented substitution: the reference digests nested structures with
xxh64 (``xxhash`` package, unavailable here); we use the same canonical
recursion with blake2b-64 (lotad_spark.hashing.canonical_value_hash). The
per-row cost is dominated by the scalar-UDF boundary + orjson recursion,
which is identical.

Usage: PYTHONPATH=/root/repo python scripts/measure_baseline.py [sf_dir]
Writes JSON to stdout.
"""

from __future__ import annotations

import json
import shutil
import os
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lotad_spark.hashing import canonical_value_hash  # noqa: E402
from lotad_spark.benchmarks.fixtures import (  # noqa: E402
    MUTATIONS,
    RELATIONAL_TABLES,
)


def build_dbs(sf_dir: str, work: Path) -> tuple[Path, Path]:
    db1_path, db2_path = work / "db1.duckdb", work / "db2.duckdb"
    for p in (db1_path, db2_path):
        p.unlink(missing_ok=True)
    for path, mutate in ((db1_path, False), (db2_path, True)):
        con = duckdb.connect(str(path))
        for t in RELATIONAL_TABLES:
            src = f"'{sf_dir}/{t}.parquet'"
            sql = (
                MUTATIONS[t].format(src=src)
                if mutate and t in MUTATIONS
                else f"SELECT * FROM {src}"
            )
            con.execute(f"CREATE TABLE {t} AS {sql}")
        con.close()
    return db1_path, db2_path


def run_reference_diff(db1_path: Path, db2_path: Path) -> dict:
    con = duckdb.connect()
    con.execute(f"ATTACH '{db1_path}' AS db1 (READ_ONLY)")
    con.execute(f"ATTACH '{db2_path}' AS db2 (READ_ONLY)")
    con.create_function("get_row_hash", lambda s: canonical_value_hash(s), ["VARCHAR"], "VARCHAR")

    per_table: dict[str, float] = {}
    drift_rows: dict[str, int] = {}
    total0 = time.perf_counter()
    for t in RELATIONAL_TABLES:
        cols = [
            r[0]
            for r in con.execute(
                "SELECT column_name FROM information_schema.columns "
                f"WHERE table_catalog = 'db1' AND table_name = '{t}' "
                "ORDER BY column_name"
            ).fetchall()
        ]
        col_list = ", ".join(f'"{c}"' for c in cols)
        t0 = time.perf_counter()
        # Reference 5-stage shape: project → tag+hash → symmetric ANTI JOIN
        # → UNION (db_compare_create_tmp_table_merge.sql:1-45).
        con.execute(
            f"CREATE OR REPLACE TEMP TABLE t1 AS "
            f"SELECT 'db1' AS observed_in, t.*, "
            f"get_row_hash(TO_JSON(t)::VARCHAR) AS hashed_row "
            f"FROM (SELECT {col_list} FROM db1.{t}) t"
        )
        con.execute(
            f"CREATE OR REPLACE TEMP TABLE t2 AS "
            f"SELECT 'db2' AS observed_in, t.*, "
            f"get_row_hash(TO_JSON(t)::VARCHAR) AS hashed_row "
            f"FROM (SELECT {col_list} FROM db2.{t}) t"
        )
        n = con.execute(
            "SELECT count(*) FROM ("
            "SELECT * FROM t1 ANTI JOIN t2 USING (hashed_row) "
            "UNION "
            "SELECT * FROM t2 ANTI JOIN t1 USING (hashed_row))"
        ).fetchone()[0]
        per_table[t] = round(time.perf_counter() - t0, 3)
        drift_rows[t] = n
    total = round(time.perf_counter() - total0, 3)
    con.close()
    return {"per_table_sec": per_table, "total_sec": total, "drift_rows": drift_rows}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf = sf_dir.rstrip("/").split("sf")[-1]
    work = Path(f"/tmp/lotad_baseline_sf{sf}")
    work.mkdir(parents=True, exist_ok=True)
    setup0 = time.perf_counter()
    db1_path, db2_path = build_dbs(sf_dir, work)
    setup_sec = round(time.perf_counter() - setup0, 3)
    result = run_reference_diff(db1_path, db2_path)
    result.update({"sf": float(sf), "setup_sec": setup_sec, "engine": "duckdb-reference"})
    print(json.dumps(result))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
