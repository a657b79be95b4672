"""Keyed column-level diff: for primary-keyed tables, WHICH columns
changed per key.

The row-hash diff (operators/diff.py) answers "which rows differ" with
set semantics and no key assumption; when the table HAS a primary key,
the follow-up question is per-key: which columns moved, old vs new. One
full-outer join on the key, then a melt of per-column comparison structs
— the per-row work is a projection, the only shuffle is the join
(broadcast when one side is small, AQE's call).

Values are emitted as strings so heterogeneous column types share one
schema; NULL renders as SQL NULL (not 'None') and is compared
null-safely, so NULL→value and value→NULL transitions surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROW_MARKER = "__row__"


def keyed_diff(
    df1: DataFrame,
    df2: DataFrame,
    keys: Sequence[str],
    *,
    db1_id: str = "db1",
    db2_id: str = "db2",
) -> DataFrame:
    """(keys…, column_name, db1_value, db2_value), one row per changed
    column of a key present on both sides — plus a ``__row__`` marker row
    for keys present on one side only (db value = the side's id). Keys
    are assumed unique per side (a duplicated key fans out through the
    join, as in any keyed comparison)."""
    keys = list(keys)
    if not keys:
        raise ValueError("keyed_diff: need at least one key column")
    shared = sorted(
        (set(df1.columns) & set(df2.columns)) - set(keys)
    )
    a = df1.select(
        *[F.col(f"`{k}`").alias(k) for k in keys],
        F.lit(True).alias("_in1"),
        *[F.col(f"`{c}`").cast("string").alias(f"_a_{c}") for c in shared],
    )
    b = df2.select(
        *[F.col(f"`{k}`").alias(k) for k in keys],
        F.lit(True).alias("_in2"),
        *[F.col(f"`{c}`").cast("string").alias(f"_b_{c}") for c in shared],
    )
    j = a.join(b, keys, "full_outer")

    changed = F.array(*[
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"_a_{c}").alias("db1_value"),
            F.col(f"_b_{c}").alias("db2_value"),
        )
        for c in shared
    ])
    both = (
        j.filter(F.col("_in1") & F.col("_in2"))
        .select(
            *keys,
            F.explode(
                F.filter(
                    changed,
                    lambda s: ~s["db1_value"].eqNullSafe(s["db2_value"]),
                )
            ).alias("_m"),
        )
        .select(*keys, "_m.column_name", "_m.db1_value", "_m.db2_value")
    )
    only = (
        j.filter(F.col("_in1").isNull() | F.col("_in2").isNull())
        .select(
            *keys,
            F.lit(ROW_MARKER).alias("column_name"),
            F.when(F.col("_in1"), F.lit(db1_id)).alias("db1_value"),
            F.when(F.col("_in2"), F.lit(db2_id)).alias("db2_value"),
        )
    )
    return both.unionByName(only)
