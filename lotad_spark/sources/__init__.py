"""Sources: Parquet table directories (primary), JDBC (optional)."""

from lotad_spark.sources.parquet import ParquetDatabase, read_table

__all__ = ["ParquetDatabase", "read_table"]
