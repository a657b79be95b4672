"""CSV and JSON-lines database sources.

Same catalog surface as :class:`ParquetDatabase` (one ``<table>.csv`` /
``<table>.jsonl`` file or directory per table), so every operator — diff,
drift, compare_all, pipeline — works on raw text exports unchanged.

Scale notes:

* Schema inference reads the data once BEFORE the real query (Spark's
  csv/json inference is a full pass at the default samplingRatio).
  Acceptable for ad-hoc diffs of exports; at scale pass explicit DDL
  strings via ``schemas={"table": "a INT, b STRING"}`` and the inference
  scan disappears — the reader then streams straight into the plan with
  predicate pushdown on the parsed columns.
* Inferred frames are cached per table NAME (the DataFrame, i.e. the
  plan + inferred schema — not the data), so repeated ``table()`` calls
  during one compare don't re-infer.
* CSV carries no type fidelity (everything is text until parsed) —
  pair these sources with the diff's type-mismatch string-cast
  normalization (P4), which already reconciles a CSV side against a
  typed side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lotad_spark.sources.parquet import ParquetDatabase


class _TextFormatDatabase(ParquetDatabase):
    FORMAT = ""  # subclass responsibility

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        db_id: str | None = None,
        *,
        schemas: dict[str, str] | None = None,
        **reader_options: str,
    ):
        super().__init__(spark, path, db_id)
        self.schemas = schemas or {}
        self.reader_options = reader_options
        self._cache: dict[str, DataFrame] = {}

    def table(self, table_name: str) -> DataFrame:
        if table_name not in self._cache:
            reader = self.spark.read.options(**self.reader_options)
            ddl = self.schemas.get(table_name)
            if ddl is not None:
                reader = reader.schema(ddl)
            self._cache[table_name] = reader.format(self.FORMAT).load(
                self.table_path(table_name)
            )
        return self._cache[table_name]


class CsvDatabase(_TextFormatDatabase):
    """Directory of ``<table>.csv`` files as a database. Defaults:
    ``header=true`` and (absent an explicit schema) ``inferSchema=true``."""

    EXT = ".csv"
    FORMAT = "csv"

    def __init__(self, spark, path, db_id=None, *, schemas=None, **opts):
        opts.setdefault("header", "true")
        super().__init__(spark, path, db_id, schemas=schemas, **opts)

    def table(self, table_name: str) -> DataFrame:
        if (
            table_name not in self._cache
            and table_name not in self.schemas
            and "inferSchema" not in self.reader_options
        ):
            self.reader_options = {**self.reader_options, "inferSchema": "true"}
        return super().table(table_name)


class JsonlDatabase(_TextFormatDatabase):
    """Directory of ``<table>.jsonl`` files (one JSON object per line)."""

    EXT = ".jsonl"
    FORMAT = "json"


class OrcDatabase(_TextFormatDatabase):
    """Directory of ``<table>.orc`` files (or ``<table>``/``<table>.orc``
    directories of part files) as a database.

    Unlike the text formats above, ORC is self-describing and columnar:
    there is NO inference pass (the reader takes the schema from the file
    footer), and predicate pushdown + column pruning reach the ORC scan
    natively — so this source carries full type fidelity at scale, the
    interchange path when the other side of a diff isn't parquet.
    ``schemas=`` stays available to override footers (e.g. widening a
    column to match the compare side)."""

    EXT = ".orc"
    FORMAT = "orc"
