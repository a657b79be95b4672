"""Deterministic db1/db2 bench fixtures.

db1 = the driver testdata as-is; db2 = the same tables with fixed
mutations (row deletions, value shifts, JSON reformatting). Both the
DuckDB baseline (scripts/measure_baseline.py) and the Spark bench
(bench.py) build their inputs from these definitions, so the two engines
run the *same* drift-diff workload.
"""

from __future__ import annotations

from pathlib import Path

import duckdb

RELATIONAL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events",
]

# Every l_orderkey divisible by this gets a quantity shift in db2;
# bench.py's skew fixture must duplicate a row NOT in this set so the
# copies cancel without masking one side of a drift pair.
LINEITEM_MUTATION_MOD = 211

# db2 = SELECT applied to the db1 table ({src} is the parquet path).
MUTATIONS = {
    "customer": (
        "SELECT c_custkey, c_name, c_nationkey, "
        "CASE WHEN c_custkey % 101 = 0 THEN c_acctbal + 100 ELSE c_acctbal END "
        "AS c_acctbal, c_mktsegment FROM {src} WHERE c_custkey % 97 != 0"
    ),
    "orders": "SELECT * FROM {src} WHERE o_orderkey % 89 != 0",
    "lineitem": (
        "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, "
        f"CASE WHEN l_orderkey % {LINEITEM_MUTATION_MOD} = 0 "
        "THEN l_quantity + 1 ELSE l_quantity END "
        "AS l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
        "l_linestatus, l_shipdate FROM {src}"
    ),
    # JSON reformat: identical values, different raw strings → full
    # canonical-hash comparison with zero expected drift.
    "events": (
        "SELECT event_id, ts, user_id, event_type, value, "
        "'{{ \"k\": ' || json_extract(props, '$.k') || ' }}' AS props FROM {src}"
    ),
}

# Expected drifted-row counts per table at sf0.1 (cross-checked against the
# measured DuckDB reference run — scripts/measure_baseline.py output).
EXPECTED_DRIFT_SF01 = {
    "region": 0, "nation": 0, "customer": 449, "supplier": 0,
    "part": 0, "orders": 1686, "lineitem": 5642, "events": 0,
}


def build_parquet_variants(sf_dir: str, work_dir: str) -> tuple[str, str]:
    """Materialize db1/db2 parquet directories for ``sf_dir``. Idempotent —
    reuses existing output (fixtures are deterministic)."""
    work = Path(work_dir)
    db1, db2 = work / "db1", work / "db2"
    marker = work / ".complete"
    if marker.exists():
        return str(db1), str(db2)
    db1.mkdir(parents=True, exist_ok=True)
    db2.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in RELATIONAL_TABLES:
        src = f"'{sf_dir}/{t}.parquet'"
        con.execute(
            f"COPY (SELECT * FROM {src}) TO '{db1 / t}.parquet' (FORMAT PARQUET)"
        )
        sql = MUTATIONS.get(t, "SELECT * FROM {src}").format(src=src)
        con.execute(f"COPY ({sql}) TO '{db2 / t}.parquet' (FORMAT PARQUET)")
    con.close()
    marker.touch()
    return str(db1), str(db2)
