"""Isolated per-row profiler for optimization work (guide §1).

Times one or more registry rows with the noop sink (computes every
column, no Python row serialization — guide §1.4), min-of-N after one
untimed warm rep, and optionally dumps .explain("formatted") to a file.

    PYTHONPATH=/root/repo python scripts/profile_row.py \
        [--sf /root/testdata/sf0.1] [--reps 4] [--plans plans/r18] \
        [--suffix before] row [row ...]

Also accepts the action to time via --action {noop,foreach} so the
bench's historical foreach methodology can be A/B'd against the noop
sink on identical plans.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("rows", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--plans", default=None, help="dir for explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--action", choices=("noop", "foreach"), default="noop")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from lotad_spark.session import get_spark

    spark = get_spark("profile_row")
    queries = entry_mod.queries()

    def run(df):
        if args.action == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.foreach(lambda _: None)

    results = {}
    for name in args.rows:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # one untimed warm rep (JIT/codegen; bench.py warms similarly)
        run(fn(spark, args.sf))
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run(fn(spark, args.sf))
            times.append(time.perf_counter() - t0)
        results[name] = min(times)
        print(
            f"{name}: min={min(times):.3f}s  all="
            f"{[round(t, 3) for t in times]}",
            flush=True,
        )
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        spark.sparkContext.setJobDescription(None)

    print("== summary ==")
    for name, t in results.items():
        print(f"{t:8.3f}  {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
