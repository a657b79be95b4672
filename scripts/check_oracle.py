"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 side-by-side with
its ``oracle_sql()`` DuckDB query and compares row count, column names, and
the order-insensitive multiset of stringified values. Run before every
commit that touches the entry module:

    PYTHONPATH=/root/repo python scripts/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import decimal
import math

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    return str(v)


def _rowset(rows) -> list[tuple]:
    return sorted(tuple(_norm(v) for v in r) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from lotad_spark.session import get_spark

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    n_ok = n_skip = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            cols = sorted(sdf.columns)
            srows = [[r[c] for c in cols] for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            n_skip += 1
            print(f"skip  {name}: no oracle (rows-only check, n={len(srows)})")
            continue
        try:
            res = con.execute(oracles[name])
            ocols_raw = [d[0] for d in res.description]
            orows_raw = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"oracle error: {e}"))
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
        ocols = [ocols_raw[i] for i in order]
        orows = [[r[i] for i in order] for r in orows_raw]

        problems = []
        if cols != ocols:
            problems.append(f"columns {cols} != {ocols}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if not problems:
            s, o = _rowset(srows), _rowset(orows)
            if s != o:
                diff_s = [r for r in s if r not in o][:3]
                diff_o = [r for r in o if r not in s][:3]
                problems.append(f"values: spark-only={diff_s} oracle-only={diff_o}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            n_ok += 1
            print(f"ok    {name} ({len(srows)} rows)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[n for n, _ in failures]}")
        return 1
    # The skip count is part of the verdict: a query silently losing its
    # oracle entry must be impossible to misread as verified.
    print(f"ALL OK ({n_ok} value-checked, {n_skip} rows-only)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
