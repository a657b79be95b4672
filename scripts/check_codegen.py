"""Registry-wide whole-stage-codegen fallback sweep.

Spark silently falls back to interpreted execution when janino cannot
compile a generated ``processNext()`` (the r17 ``script_profile``
defect: values stayed correct, but the row lost whole-stage codegen —
a constant-factor perf bug invisible to the correctness gate). With
``spark.sql.codegen.fallback=false`` the compile error becomes a hard
failure instead, so this sweep turns every silent fallback in the
registry into a named FAIL.

Every query is fully evaluated via a noop-format write (count() would
let column pruning skip the very projections we're auditing).

    PYTHONPATH=/root/repo python scripts/check_codegen.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from lotad_spark.session import get_spark

    spark = get_spark("check_codegen")
    spark.conf.set("spark.sql.codegen.fallback", "false")

    failures = []
    n_ok = 0
    for name, fn in sorted(entry_mod.queries().items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            n_ok += 1
            print(f"  ok   {name}")
        except Exception:
            failures.append(name)
            print(f"  FAIL {name}")
            traceback.print_exc(limit=3)
    print(
        f"codegen sweep: {n_ok} ok, {len(failures)} failed"
        + (f" — {failures}" if failures else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
