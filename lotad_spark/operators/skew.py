"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
default in `lotad_spark.session.get_spark`) splits oversized shuffle
partitions at runtime and is the first line of defense. These operators are
for the cases AQE can't fix:

* a *single key* so hot that one reducer still drowns (AQE splits
  partitions, not keys) → ``salted_join``;
* a high-cardinality aggregation whose hot keys bottleneck the final
  exchange → ``two_phase_agg``.

Both are deterministic: the salt is derived by hashing, never ``rand()``,
so replays and retries reproduce identical partitioning (a requirement for
speculative execution and for the DuckDB oracle gate).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Aggregates that decompose into (partial, merge) pairs for two_phase_agg.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _salt_col(df: DataFrame, buckets: int) -> Column:
    """Deterministic per-row salt in [0, buckets): hash of every column.

    Hashing the full row (not rand()) keeps retries/replays stable; the
    salt only needs to *spread* a hot key's rows, not be unpredictable.
    """
    return F.pmod(F.xxhash64(*[F.col(f"`{c}`") for c in df.columns]), F.lit(buckets))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | Sequence[str],
    *,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` carries hot keys: salt the skewed side
    into ``buckets`` sub-keys and replicate ``other`` once per bucket, so
    one hot key occupies ``buckets`` reducers instead of one.

    Shuffle cost: ``other`` is duplicated ``buckets``× — use when ``other``
    is much smaller than the hot key's row count but too big to broadcast
    (broadcast needs no salting at all). Join type is restricted to the
    shapes where per-bucket results compose exactly (inner / left outer
    with skewed on the left): each skewed row lands in exactly one bucket
    and meets the full replicated ``other`` there.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins of the skewed side, got {how!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salted = skewed.withColumn("_salt", _salt_col(skewed, buckets))
    replicated = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = salted.join(replicated, [*keys, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    keys: Iterable[str],
    aggs: dict[str, tuple[str, str]],
    *,
    buckets: int = 8,
) -> DataFrame:
    """Aggregation with a salted pre-shuffle for hot grouping keys:
    groupBy(keys + salt) computes partials, groupBy(keys) merges them.

    ``aggs`` maps output column → (function, input column) with function in
    {sum, count, min, max} (the algebraic set — avg must be derived as
    sum/count by the caller). Spark's hash aggregate already does map-side
    partial aggregation within a task; the salted phase adds a *reduce*
    level so a key with billions of rows is merged by ``buckets`` reducers
    before the final single-reducer touch. Cost: one extra (tiny) shuffle
    of ``buckets``× pre-aggregated rows.
    """
    keys = list(keys)
    unknown = {fn for fn, _ in aggs.values()} - set(_ALGEBRAIC)
    if unknown:
        raise ValueError(f"two_phase_agg: non-algebraic functions {sorted(unknown)}")
    partials = [
        _ALGEBRAIC[fn][0](F.col(f"`{src}`")).alias(f"_p_{out}")
        for out, (fn, src) in aggs.items()
    ]
    finals = [
        _ALGEBRAIC[fn][1](F.col(f"_p_{out}")).alias(out)
        for out, (fn, _) in aggs.items()
    ]
    salted = df.withColumn("_salt", _salt_col(df, buckets))
    return (
        salted.groupBy(*keys, "_salt")
        .agg(*partials)
        .groupBy(*keys)
        .agg(*finals)
    )
