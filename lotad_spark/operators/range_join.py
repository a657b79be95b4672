"""Bin-bucketed range (interval) join.

Joins a POINTS relation (one timestamp/number per row) to an INTERVALS
relation (``[start, end)`` per row) on point-in-interval containment,
optionally under an equi-key. The query shape behind "events within the
session window", "reading inside the maintenance window", "value inside
the band".

Plan shape — the 100 TB question: expressed directly, the predicate
``p.key = i.key AND p.x >= i.start AND p.x < i.end`` gives Spark a
sort-merge join on the key alone with the two inequalities as post-join
filters — every point meets every interval of its key (quadratic on hot
keys), and with no equi-key at all it degenerates to a broadcast
nested-loop. This implementation buckets the domain into fixed-width
bins: each interval explodes into the bins it covers (bounded by
``interval_length / bin_width + 1`` rows — pick ``bin_width`` near the
typical interval length so the blow-up is a small constant), each point
maps to exactly ONE bin, and the join becomes a plain equi-join on
``(key, bin)`` with the exact containment predicate as a cheap residual
filter. Because a point lives in a single bin, no pair is produced
twice — no distinct pass afterwards. Shuffle volume is (points +
exploded intervals), both linear; AQE still broadcasts whichever side
ends up small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PFX = "_rj_"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: float,
    point_key: str | None = None,
    interval_key: str | None = None,
) -> DataFrame:
    """All (point row ⨯ matching interval row) pairs with
    ``start <= point < end`` (and ``point_key = interval_key`` when
    given), as one DataFrame carrying both sides' columns.

    Timestamp columns are binned on their epoch-second value;
    ``bin_width`` is then in seconds. Column names must not overlap
    between the two sides (alias before calling); NULL points, bounds,
    or keys never match, exactly as in the SQL predicate.
    """
    if bin_width <= 0:
        raise ValueError("range_join: bin_width must be positive")
    if (point_key is None) != (interval_key is None):
        raise ValueError(
            "range_join: point_key and interval_key go together"
        )
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"range_join: overlapping column names {sorted(overlap)}; "
            "alias one side first"
        )

    def _num(frame: DataFrame, c: str):
        t = dict(
            (f.name, f.dataType.simpleString()) for f in frame.schema.fields
        )[c]
        col = F.col(f"`{c}`")
        if t == "date":
            col = col.cast("timestamp")
        return (
            col.cast("double")
            if t.startswith("timestamp") or t == "date"
            else col
        )

    p_num = _num(points, point_col)
    s_num = _num(intervals, start_col)
    e_num = _num(intervals, end_col)
    width = F.lit(float(bin_width))

    pts = points.withColumn(_PFX + "pbin", F.floor(p_num / width))
    # End is exclusive: an interval ending exactly on a bin boundary does
    # not occupy the next bin. ceil(end/W) - 1 is the last occupied bin
    # (clamped so zero-length intervals still emit their start bin).
    ivs = intervals.withColumn(
        _PFX + "ibin",
        F.explode(
            F.sequence(
                F.floor(s_num / width),
                F.greatest(
                    F.ceil(e_num / width) - 1, F.floor(s_num / width)
                ),
            )
        ),
    )
    cond = pts[_PFX + "pbin"] == ivs[_PFX + "ibin"]
    if point_key is not None:
        cond = cond & (
            pts[f"`{point_key}`"] == ivs[f"`{interval_key}`"]
        )
    contained = (F.col(f"`{point_col}`") >= F.col(f"`{start_col}`")) & (
        F.col(f"`{point_col}`") < F.col(f"`{end_col}`")
    )
    return (
        pts.join(ivs, on=cond, how="inner")
        .filter(contained)
        .drop(_PFX + "pbin", _PFX + "ibin")
    )
