"""Column-profile drift: compare per-column statistical summaries.

Row-level diff answers "which rows changed"; profile drift answers the
cheaper monitoring question "did the SHAPE of the data move" — row
counts, null counts, numeric min/max per column — without shuffling a
single data row: each side is ONE full-scan aggregation (all columns'
aggregates computed in the same pass, map-side combined), the two
single-row results are melted to per-column rows driver-free (explode of
a literal struct array), and the comparison joins relations whose size
is the column count, not the data. At 100 TB this is the everything-
pushed-down shape: no exchange carries more than #columns rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(df: DataFrame) -> DataFrame:
    """Per-column profile: (column_name, n_nonnull, n_null, min_val,
    max_val) — min/max as doubles for numeric columns, NULL otherwise.
    One aggregation job regardless of column count."""
    fields = df.schema.fields
    aggs, structs = [], []
    for i, f in enumerate(fields):
        c = F.col(f"`{f.name}`")
        aggs.append(F.count(c).alias(f"_nn{i}"))
        aggs.append(F.count(F.lit(1)).alias(f"_n{i}"))
        numeric = isinstance(f.dataType, _NUMERIC)
        if numeric:
            aggs.append(F.min(c).cast("double").alias(f"_mn{i}"))
            aggs.append(F.max(c).cast("double").alias(f"_mx{i}"))
        null_d = F.lit(None).cast("double")
        structs.append(F.struct(
            F.lit(f.name).alias("column_name"),
            F.col(f"_nn{i}").alias("n_nonnull"),
            (F.col(f"_n{i}") - F.col(f"_nn{i}")).alias("n_null"),
            (F.col(f"_mn{i}") if numeric else null_d).alias("min_val"),
            (F.col(f"_mx{i}") if numeric else null_d).alias("max_val"),
        ))
    return (
        df.agg(*aggs)
        .select(F.explode(F.array(*structs)).alias("p"))
        .select("p.*")
    )


def profile_drift(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """Columns whose profile differs between the two sides:
    (column_name, metric-pairs for both sides). Columns present on one
    side only surface with NULLs on the missing side (full outer join on
    the #columns-sized relations)."""
    p1, p2 = profile_table(df1), profile_table(df2)
    lhs = p1.select(
        "column_name",
        *[F.col(m).alias(f"{m}_1")
          for m in ("n_nonnull", "n_null", "min_val", "max_val")],
    )
    rhs = p2.select(
        "column_name",
        *[F.col(m).alias(f"{m}_2")
          for m in ("n_nonnull", "n_null", "min_val", "max_val")],
    )
    joined = lhs.join(rhs, "column_name", "full_outer")
    differs = [
        ~F.col(f"{m}_1").eqNullSafe(F.col(f"{m}_2"))
        for m in ("n_nonnull", "n_null", "min_val", "max_val")
    ]
    pred = differs[0]
    for d in differs[1:]:
        pred = pred | d
    return joined.filter(pred)
