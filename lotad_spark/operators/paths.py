"""User-journey path analysis over event streams.

Two faces of the same question — "what do users do, in what order":

* ``event_transitions`` — the first-order Markov view: counts of each
  (from_type, to_type) adjacent pair in per-user time order. One
  window pass partitioned by user (state bounded by a user's events,
  never the corpus) plus one groupBy over the tiny type×type relation.
* ``path_signatures`` — the journey view: each user's first ``k``
  event types joined into one path string, counted across users. The
  per-user prefix is taken with a rank-filter window (WindowGroupLimit
  pushes the limit into the sort at plan level), so state per user is
  k rows, never the full history.

Ordering ties on the timestamp are broken by an explicit tiebreak
column so results are deterministic and reproducible across engines —
a requirement for the cross-engine oracle, and good hygiene anyway.

100 TB design: both operators shuffle by user once; no per-user event
arrays are collected (transitions never materialize a user's history,
signatures cap it at k). The output relations are bounded by
|types|² and |distinct paths| respectively, not by event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(from_type, to_type, n_transitions): adjacent-pair counts in
    per-user time order, over all users."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    seq = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    )
    return (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    )


def path_signatures(
    events: DataFrame,
    k: int = 5,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    sep: str = ">",
) -> DataFrame:
    """(path, n_users): each user's first ``k`` event types joined with
    ``sep``, counted across users. Users with fewer than k events
    contribute their full (shorter) path."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    prefix = (
        events.select(
            F.col(user_col),
            F.col(type_col),
            F.row_number().over(w).alias("_rn"),
        )
        .filter(F.col("_rn") <= k)
    )
    # concat in rank order: groupBy keeps no ordering guarantee, so
    # aggregate the (rank, type) structs and sort the bounded k-array.
    paths = prefix.groupBy(user_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_rn"), F.col(type_col)))
                ),
                lambda s: s[type_col],
            ),
            sep,
        ).alias("path")
    )
    return paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
