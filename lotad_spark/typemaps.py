"""Cross-engine generic type normalization (F6).

The reference ships four static JSON maps translating engine type names
between DuckDB/Postgres/SQLite so that schema drift is only reported when
types differ *after* normalization ("least precise type wins" —
lotad/data/README.md:1-7, applied at lotad/connection.py:184-211).

Our primary sources are Spark-typed (one vocabulary), but JDBC sides can
surface engine-native names. ``generic_type`` collapses the engine
vocabularies from SURVEY §1.2 into one generic form; pass it as the
``generic_type`` hook of ``generate_table_schema_drift`` when comparing
across engines.
"""

from __future__ import annotations

import re

# Engine-specific name → generic name. Everything not listed maps to
# itself. Parametrized types are matched on their base name.
_TO_GENERIC: dict[str, str] = {
    # integers — widest named integer family member wins
    "TINYINT": "TINYINT", "INT1": "TINYINT",
    "SMALLINT": "SMALLINT", "INT2": "SMALLINT",
    "INTEGER": "INTEGER", "INT": "INTEGER", "INT4": "INTEGER",
    "MEDIUMINT": "INTEGER", "SERIAL": "INTEGER",
    "BIGINT": "BIGINT", "INT8": "BIGINT", "LONG": "BIGINT",
    "BIGSERIAL": "BIGINT", "HUGEINT": "BIGINT",
    "UTINYINT": "TINYINT", "USMALLINT": "SMALLINT",
    "UINTEGER": "INTEGER", "UBIGINT": "BIGINT",
    # floats / decimals
    "REAL": "FLOAT", "FLOAT": "FLOAT", "FLOAT4": "FLOAT",
    "DOUBLE": "DOUBLE", "FLOAT8": "DOUBLE", "DOUBLE PRECISION": "DOUBLE",
    "DECIMAL": "DECIMAL", "NUMERIC": "DECIMAL", "MONEY": "DECIMAL",
    # strings
    "VARCHAR": "VARCHAR", "CHARACTER VARYING": "VARCHAR", "CHAR": "VARCHAR",
    "BPCHAR": "VARCHAR", "CHARACTER": "VARCHAR", "TEXT": "VARCHAR",
    "STRING": "VARCHAR", "NAME": "VARCHAR", "CLOB": "VARCHAR",
    # binary
    "BLOB": "BLOB", "BYTEA": "BLOB", "BINARY": "BLOB", "VARBINARY": "BLOB",
    # boolean
    "BOOLEAN": "BOOLEAN", "BOOL": "BOOLEAN", "LOGICAL": "BOOLEAN",
    # temporal
    "DATE": "DATE",
    "TIME": "TIME", "TIME WITHOUT TIME ZONE": "TIME",
    "TIMESTAMP": "TIMESTAMP", "DATETIME": "TIMESTAMP",
    "TIMESTAMP WITHOUT TIME ZONE": "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE": "TIMESTAMPTZ", "TIMESTAMPTZ": "TIMESTAMPTZ",
    "INTERVAL": "INTERVAL",
    # structured / json
    "JSON": "JSON", "JSONB": "JSON", "STRUCT": "JSON", "MAP": "JSON",
    "HSTORE": "JSON",
    # id-ish / fallback-to-string families (reference collapses these to
    # the generic string form)
    "UUID": "VARCHAR", "ENUM": "VARCHAR", "BIT": "VARCHAR",
    "XML": "VARCHAR", "CIDR": "VARCHAR", "INET": "VARCHAR",
    "MACADDR": "VARCHAR",
}

_PARAM_RE = re.compile(r"^([A-Z ]+?)\s*\(.*\)$")
_ARRAY_RE = re.compile(r"^(.*?)(\[\])+$")


def generic_type(type_name: str) -> str:
    """Normalize one engine type name to its generic form.

    ``DECIMAL(18,2)`` → ``DECIMAL``; ``TEXT[]`` → ``VARCHAR[]``; unknown
    names pass through upper-cased (same fallback the reference uses for
    unmapped types).
    """
    if type_name is None:
        return type_name
    name = type_name.strip().upper()
    arr = _ARRAY_RE.match(name)
    if arr:
        return generic_type(arr.group(1)) + "[]"
    param = _PARAM_RE.match(name)
    if param:
        name = param.group(1).strip()
    return _TO_GENERIC.get(name, name)
