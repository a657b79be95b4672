"""Deterministic sampling operators for training-data curation.

Why not ``df.sample()`` / ``rand()``: Spark's random sampling is seeded
per-partition, so the selected set changes whenever partitioning changes
(repartition, AQE coalesce, speculative re-execution re-draws rows), and
it cannot be reproduced by another engine. Every operator here derives
its randomness from a cryptographic hash of the ROW ID instead:

* **Reproducible** — the same corpus always yields the same sample, on
  any cluster layout, any engine (the DuckDB oracle replays it exactly).
* **Stable under retries** — a re-executed task selects identical rows,
  so downstream exactly-once guarantees survive speculation.
* **Incremental** — yesterday's sampled ids stay sampled when new data
  arrives; only new ids are drawn. That's what makes hash sampling the
  standard shape for train/eval splits (a document must never migrate
  between splits across pipeline runs).

Scale notes:

* ``hash_sample`` / ``train_eval_split`` are stateless projections — one
  scan, zero shuffles, fully pushdown-friendly.
* ``stratified_cap`` is a per-group top-k. Spark ≥ 3.5 plans a
  ``rank/row_number <= k`` filter over a window as WindowGroupLimit:
  each map task keeps only its local top-k per group BEFORE the
  exchange, so the shuffle carries at most ``k × groups × tasks`` rows,
  not the full table — the window shape is the scale shape, no manual
  two-phase rewrite needed (pinned by tests/test_plans.py).

The selection hash is md5 (bit-identical in the DuckDB oracle); the
uniformity, not the cryptography, is what matters — at production scale
``F.xxhash64`` drops in with the same properties.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hex_threshold(rate: float) -> str:
    """8-hex-digit threshold such that a uniform 32-bit hex string is
    lexicographically below it with probability ``rate``."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * 2**32), 2**32 - 1), "08x")


def sample_key(id_col: Column | str, salt: str = "") -> Column:
    """The deterministic per-row selection key: first 8 hex chars of
    md5(salt ':' id). Lowercase-hex strings compare lexicographically the
    same in every engine, so thresholding needs no numeric conversion."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, 8)


def hash_sample(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    *,
    salt: str = "",
) -> DataFrame:
    """Deterministic Bernoulli sample: keeps each row iff
    md5(salt ':' id)[0:8] < hex(rate · 2³²). Same rows on every run,
    every partitioning, every engine. Pure filter — predicate sits
    directly on the scan."""
    return df.filter(sample_key(id_col, salt) < F.lit(_hex_threshold(rate)))


def train_eval_split(
    df: DataFrame,
    eval_rate: float = 0.1,
    id_col: str = "doc_id",
    *,
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` column: 'eval' with probability ``eval_rate``,
    else 'train', keyed on the id hash — a document keeps its split
    assignment forever (across runs, re-partitions, and corpus growth),
    which is the property that prevents silent train-on-eval leakage."""
    return df.withColumn(
        "split",
        F.when(
            sample_key(id_col, salt) < F.lit(_hex_threshold(eval_rate)),
            F.lit("eval"),
        ).otherwise(F.lit("train")),
    )


def stratified_cap(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    *,
    priority: Column | None = None,
    salt: str = "cap",
) -> DataFrame:
    """Keeps at most ``cap`` rows per ``group_col`` value — the standard
    per-domain / per-source cap that stops one crawler domain from
    dominating a training mix.

    Selection order within a group is ``priority`` descending if given
    (e.g. a quality score — keep the best ``cap``), then the id hash
    (uniform, deterministic), then the id itself (total order → unique
    row_number → reproducible output set).

    Scale: rank ≤ k over a window is planned as WindowGroupLimit in
    Spark ≥ 3.5 — map-side partial top-k per group runs before the
    exchange, so a hot group ships ``k`` rows per map task, not its full
    row count. A group too hot for even that (≫ executor memory in one
    reducer) is a salting case: two_phase top-k via operators/skew.py.
    """
    order = [sample_key(id_col, salt).asc(), F.col(id_col).asc()]
    if priority is not None:
        order = [priority.desc()] + order
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
