"""Bucketed-table helpers: pre-shuffled storage for co-located joins.

A repeated big-big equi-join (e.g. the drift anti-join between two
snapshots of the same 100 TB table, or the candidate-pair joins in the
dedup pipeline) pays its shuffle every run. Writing both sides bucketed by
the join key moves that shuffle to write time, once: Spark's scan then
reports the bucket spec as its output partitioning and the join planner
skips the Exchange on both sides entirely (verified by
``tests/test_bucketed.py`` — the joined plan contains no Exchange).

Bucket count guidance at scale: ``buckets ≈ table_size / 256 MB`` rounded
to a power of two, and the SAME count on both sides (mismatched counts
re-introduce one side's shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    *,
    buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and sorted) by ``key``.

    Uses the session catalog (``saveAsTable`` — bucket metadata lives in
    the catalog, not the files, so plain ``read.parquet`` of the same
    directory would NOT see the bucketing)."""
    keys = [key] if isinstance(key, str) else list(key)
    if mode == "overwrite":
        # A managed-table location can survive a crashed run without a
        # catalog entry; saveAsTable then fails LOCATION_ALREADY_EXISTS.
        # Drop both the entry and any orphaned location first.
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS `{table}`")
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        jvm = spark.sparkContext._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(warehouse, table.lower())
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(jpath, True)
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact."""
    return spark.table(table)
