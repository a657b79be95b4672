"""Benchmark fixtures + workload definitions shared by bench.py and
scripts/measure_baseline.py."""

from lotad_spark.benchmarks.fixtures import (
    MUTATIONS,
    RELATIONAL_TABLES,
    build_parquet_variants,
)

__all__ = ["MUTATIONS", "RELATIONAL_TABLES", "build_parquet_variants"]
