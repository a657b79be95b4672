"""Custom-query diff support (Q1-Q3).

A per-table custom SQL query replaces the default projected scan on BOTH
sides of the diff; hashing and the symmetric anti-join proceed identically
(reference lotad/db_compare.py:223-264, asserted by
test/custom_query_test.py:26-141).

Table references inside the query are qualified per side with the
reference's exact regex (standalone occurrences bounded by
space/newline/paren/comma — db_compare.py:241-255). The reference rewrites
to ``db1.<table>`` and runs inside DuckDB with attached databases; Spark
temp views cannot contain dots, so execution rewrites to
``<prefix>_<table>`` views instead — same relation, different spelling.
``qualify_tables`` with the default separator reproduces the reference
spelling for parity tests.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

try:  # the reference uses sql_metadata; fall back to a regex extractor
    from sql_metadata import Parser as _SQLParser
except ImportError:
    _SQLParser = None

_FROM_JOIN_RE = re.compile(
    r"\b(?:from|join)\s+([A-Za-z_][A-Za-z0-9_.]*)", re.IGNORECASE
)


def extract_tables(query: str) -> list[str]:
    """Table names referenced by the query (deduplicated, first-seen order)."""
    if _SQLParser is not None:
        try:
            return list(dict.fromkeys(_SQLParser(query).tables))
        except Exception:  # noqa: BLE001 — fall through to the regex
            pass
    if not re.search(r"\bselect\b", query, re.IGNORECASE):
        return []
    seen: dict[str, None] = {}
    for m in _FROM_JOIN_RE.finditer(query):
        name = m.group(1)
        if name.lower() != "select":  # FROM (SELECT ... never captures '('
            seen.setdefault(name, None)
    return list(seen)


def qualify_tables(query: str, db_name: str, *, separator: str = ".") -> str:
    """Qualify standalone table references with ``db_name`` using the
    reference's boundary regex (lotad/db_compare.py:247-253)."""
    for table in extract_tables(query):
        query = re.sub(
            rf"(?<=[\s\n(,])({re.escape(table)})(?=[\s\n),;])",
            rf"{db_name}{separator}\1",
            query,
        )
    return query


def custom_query_frame(
    spark: SparkSession, db, query: str, *, view_prefix: str
) -> DataFrame:
    """Run a custom query against one database side.

    Registers each referenced table of ``db`` as a temp view
    ``<view_prefix>_<table>`` and executes the query with references
    rewritten to those views. The result is the side's diff input.
    """
    if not query.rstrip().endswith(";"):
        query = query.rstrip() + ";"
    # Pad so boundary lookarounds also match at the string edges.
    padded = f" {query} "
    for t in extract_tables(query):
        db.table(t).createOrReplaceTempView(f"{view_prefix}_{t}")
    rewritten = qualify_tables(padded, view_prefix, separator="_")
    return spark.sql(rewritten.strip().rstrip(";"))
