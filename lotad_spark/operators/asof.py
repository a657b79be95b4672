"""As-of (nearest-timestamp) join — the temporal join Spark's DataFrame
API lacks.

For every left row, attach the single right row with the same key and the
latest timestamp at or before the left row's timestamp (``backward``; the
``forward`` direction mirrors it). The standard way to stitch events to
the most recent snapshot/quote/config that preceded them.

Plan shape — the 100 TB question: the naive formulation is an inequality
join (``l.key = r.key AND r.ts <= l.ts`` + a max-per-left aggregation),
which Spark can only execute as a broadcast-nested-loop or a
sort-merge-join that replays every earlier right row for every left row
(O(L×R) per key for hot keys). This implementation instead UNIONs the two
tagged sides and resolves every match with ONE running
``last(struct, ignoreNulls)`` window over ``(key, ts)`` order — a single
hash exchange on the key and one sort, O((L+R) log (L+R)) per partition,
no pair blow-up, no broadcast requirement on either side. Skewed keys
cost their own sort but never a cross product. The match rides as one
STRUCT payload (timestamp + all value columns together), so every output
column comes from the same right row even when some of its values are
NULL — per-column ``last(ignoreNulls)`` would silently substitute older
rows' values.

Tie semantics match DuckDB's ``ASOF JOIN`` (inequality ``>=``): a right
row exactly at the left timestamp matches (the union sorts right rows
before left rows at equal timestamps). Rows with NULL key or NULL
timestamp on the right can never match; left rows with NULL timestamp
stay unmatched — same as the SQL inequality, where NULL comparisons are
never true.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PFX = "_asof_"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    right_key: str | None = None,
    left_ts: str,
    right_ts: str | None = None,
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the ``value_cols`` of the
    matching ``right`` row (NULL when no right row qualifies).

    ``key``/``left_ts`` name the left side's columns; ``right_key``/
    ``right_ts`` default to the same names on the right side.
    ``direction='backward'`` matches the latest right row with
    ``right_ts <= left_ts``; ``'forward'`` the earliest with
    ``right_ts >= left_ts``. ``tolerance_seconds`` additionally bounds
    ``|left_ts - right_ts|``; a match outside it is nulled out.

    When several right rows share the same ``(key, ts)`` the winner is
    nondeterministic (exactly as in SQL ASOF joins) — pre-aggregate the
    right side to one row per (key, ts) for deterministic output.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    rkey = right_key or key
    rts = right_ts or left_ts
    vals = (
        list(value_cols)
        if value_cols is not None
        else [c for c in right.columns if c not in (rkey, rts)]
    )
    clash = {c + suffix for c in vals} & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: output columns {sorted(clash)} collide with left "
            "columns; pass a suffix or rename"
        )
    internal = [c for c in left.columns if c.startswith(_PFX)]
    if internal:
        raise ValueError(
            f"asof_join: left columns {internal} collide with the "
            f"internal '{_PFX}' prefix; rename them first"
        )

    # The match payload: the right timestamp plus ALL value columns in one
    # struct. The struct is non-NULL exactly for right rows (rts is
    # filtered non-NULL below), so last(payload, ignoreNulls) skips left
    # rows but keeps right rows whose individual values are NULL — and
    # timestamp + values always come from the SAME matched row. Fields
    # get positional internal names (rts, v0, v1, …) so duplicate or
    # exotically named value columns (including rts itself among
    # value_cols) can never collide or break DDL parsing.
    from pyspark.sql import types as T

    payload_type = T.StructType(
        [T.StructField("rts", right.schema[rts].dataType)]
        + [
            T.StructField(f"v{i}", right.schema[c].dataType)
            for i, c in enumerate(vals)
        ]
    )
    lhs = left.select(
        F.col(key).alias(_PFX + "k"),
        F.col(left_ts).alias(_PFX + "t"),
        F.lit(1).alias(_PFX + "side"),
        *[F.col(f"`{c}`") for c in left.columns],
        F.lit(None).cast(payload_type).alias(_PFX + "payload"),
    )
    rhs = right.filter(
        F.col(rkey).isNotNull() & F.col(rts).isNotNull()
    ).select(
        F.col(rkey).alias(_PFX + "k"),
        F.col(rts).alias(_PFX + "t"),
        F.lit(0).alias(_PFX + "side"),
        *[
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in left.schema.fields
        ],
        F.struct(
            F.col(f"`{rts}`").alias("rts"),
            *[
                F.col(f"`{c}`").alias(f"v{i}")
                for i, c in enumerate(vals)
            ],
        ).alias(_PFX + "payload"),
    )

    # Right rows sort before left rows at equal timestamps, so an exact-
    # timestamp right row is visible to the running last() — inclusive
    # match, the ASOF JOIN convention.
    t = F.col(_PFX + "t")
    order = [
        t.asc() if direction == "backward" else t.desc(),
        F.col(_PFX + "side").asc(),
    ]
    w = (
        Window.partitionBy(_PFX + "k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(_PFX + "payload", ignorenulls=True).over(w)
    matched_ts = matched["rts"]

    def _gate(expr: Column) -> Column:
        ok = matched_ts.isNotNull() & F.col(left_ts).isNotNull()
        if tolerance_seconds is not None:
            # Date columns don't cast to double directly — go through
            # timestamp so a date-typed side still gets epoch seconds.
            gap = (
                F.col(left_ts).cast("timestamp").cast("double")
                - matched_ts.cast("timestamp").cast("double")
            )
            gap = gap if direction == "backward" else -gap
            ok = ok & (gap <= F.lit(float(tolerance_seconds)))
        return F.when(ok, expr)

    out_vals = [
        _gate(matched[f"v{i}"]).alias(c + suffix)
        for i, c in enumerate(vals)
    ]
    return (
        lhs.unionByName(rhs)
        .select(
            F.col(_PFX + "side").alias(_PFX + "side"),
            *[F.col(f"`{c}`") for c in left.columns],
            *out_vals,
        )
        .filter(F.col(_PFX + "side") == 1)
        .drop(_PFX + "side")
    )
