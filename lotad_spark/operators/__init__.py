"""Relational + pipeline operators of the lotad_spark engine."""

from lotad_spark.operators.diff import DiffResult, diff_tables, normalize_for_diff

__all__ = ["DiffResult", "diff_tables", "normalize_for_diff"]
