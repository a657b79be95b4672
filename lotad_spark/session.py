"""SparkSession factory tuned for the drift-diff workload.

Local-mode defaults mirror what we would set fleet-wide on a real cluster:
AQE on (runtime coalescing + skew-join handling), Arrow on (the canonical
hash UDF is Arrow-vectorized), shuffle partitions sized to cores instead of
the 200 default, UTC session timezone so timestamp comparisons against
external engines (DuckDB oracle) are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def _default_driver_mem() -> str:
    """Driver-heap default derived from the machine, not a constant.

    Local mode puts every executor thread inside the driver JVM, so the
    heap must scale with the box: half of MemAvailable, clamped to
    [2g, 16g]. A flat 16g would let the JVM grow into a memory-cgroup
    limit and get OOM-killed mid-job on constrained containers (where
    the old 1g default at least failed fast); 1g GC-thrashes a 32-thread
    local run at sf1. ``SPARK_GRAFT_DRIVER_MEM`` overrides outright."""
    avail_gb = None
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    avail_gb = int(line.split()[1]) // (1024 * 1024)
                    break
    except OSError:
        pass
    # /proc/meminfo reports the HOST inside a memory-cgroup-limited
    # container; sizing to the host would let the JVM grow past the
    # cgroup and get OOM-killed mid-job. Cap by the cgroup limit (v2
    # memory.max, v1 limit_in_bytes; "max"/huge sentinel = unlimited).
    for cg in ("/sys/fs/cgroup/memory.max",
               "/sys/fs/cgroup/memory/memory.limit_in_bytes"):
        try:
            with open(cg) as fh:
                raw = fh.read().strip()
            if raw != "max":
                limit_gb = int(raw) // (1024 ** 3)
                if limit_gb < 1 << 20:  # ignore the v1 "unlimited" sentinel
                    avail_gb = (
                        limit_gb if avail_gb is None
                        else min(avail_gb, limit_gb)
                    )
            break
        except (OSError, ValueError):
            continue
    if avail_gb is None:
        return "4g"
    return f"{max(2, min(16, avail_gb // 2))}g"


def get_spark(
    app_name: str = "lotad_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    On a real cluster ``master``/memory come from spark-submit; everything
    set here is safe to carry over unchanged.
    """
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cores}]")
        # Local mode puts every executor thread inside the driver JVM, so
        # the 1g spark.driver.memory default is the binding constraint on
        # a many-core box (observed: GCLocker thrash → job death at ~6M-row
        # diffs with 32 threads). Size the heap to the box (see
        # _default_driver_mem); on a cluster this conf is owned by
        # spark-submit and the env override keeps CI/driver boxes in
        # control. Takes effect only at JVM launch — a pre-existing
        # session keeps its heap.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cores, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Read TIMESTAMP(NANOS) parquet as BIGINT (sources/parquet.py
        # rebuilds µs timestamps with floor division). Set once here so the
        # behavior never depends on table read order.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Inter-table concurrency: compare_all submits one job per table from
        # a driver thread pool; FAIR scheduling keeps small tables from
        # starving behind a big one.
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.ui.enabled", os.environ.get("LOTAD_SPARK_UI", "false"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # SQL-callable canonical hash, mirroring the reference's per-connection
    # UDF registration (lotad/connection.py:133,247) so custom queries can
    # call get_row_hash(to_json(struct(*))).
    from lotad_spark.hashing import register_sql_functions

    register_sql_functions(spark)
    return spark
