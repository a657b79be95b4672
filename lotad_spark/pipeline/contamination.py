"""Benchmark decontamination: find training documents that contain
eval/benchmark content, via n-gram containment.

The standard LLM-pipeline hygiene step (the reference pipelines for
GPT-3/PaLM/Llama all describe a variant): before training, drop every
training document sharing too many n-grams with any benchmark item, so
eval scores measure generalization rather than memorization.

Metric: **containment**, not Jaccard —
``|train_shingles ∩ eval_shingles| / |eval_shingles|``. A 100-word
benchmark question fully quoted inside a 10 000-word web page has tiny
Jaccard but containment 1.0; containment is the right direction for
"does the training doc CONTAIN the eval item".

Scale design (the asymmetry is the whole design):

* The eval side is small (benchmark suites are 10³–10⁶ items) and the
  train side is the 100 TB corpus — so the eval shingle set is
  **broadcast**, and the train side streams through a map-side hash
  join: the 100 TB side is never shuffled by shingle.
* The only exchange is the groupBy on (train_id, eval_id) **matches**,
  whose volume is bounded by actual overlap, which for a clean corpus is
  ≈ 0. The cost is one scan of train + shingling CPU.
* If the eval set ever outgrows broadcast (~8 GB of shingles), drop the
  ``F.broadcast`` hint and the same plan degrades gracefully to a
  shuffled hash join on the shingle — semantics unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lotad_spark.pipeline.dedup import shingles


def contamination_pairs(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    n: int = 3,
    threshold: float = 0.5,
    train_id: str = "doc_id",
    eval_id: str = "doc_id",
    prefilter: str | None = None,
    prefilter_bits: int = 1 << 17,
    prefilter_hashes: int = 4,
) -> DataFrame:
    """(train_id, eval_id, containment) for every train×eval pair whose
    n-gram containment of the EVAL item reaches ``threshold``.

    ``containment = |T ∩ E| / |E|`` over distinct word n-grams.
    Eval shingles and sizes are broadcast; the train corpus is scanned
    once and never shuffled by shingle.

    ``prefilter="bloom"`` inserts a Bloom membership test
    (:func:`pipeline.sketch.bloom_prefilter`) in front of the exact
    join: the eval shingle set packs into a ~n_bits/8-byte bitmap that
    broadcasts as ONE map row, and train shingles that cannot be in the
    eval set drop inside the scan stage — so what reaches the hash join
    is true matches plus the false-positive trickle instead of every
    shingle of the 100 TB corpus. Output is IDENTICAL by construction
    (a Bloom filter has no false negatives; survivors still pass the
    exact join — pinned in tests), which is also why this kicks in when
    the eval set outgrows a comfortable broadcast of the full shingle
    strings: the bitmap stays KBs-to-MBs while the string set grows
    into GBs. Size prefilter_bits ≈ 10× the eval shingle count.

    Size contract: ``eval_df`` must be BOUNDED (a benchmark suite —
    thousands of items, not a corpus). Its exploded shingle relation is
    materialized in executor storage via a lazy ``localCheckpoint`` so
    the three consumers (bitmap build, join side, per-eval sizes) share
    one computation; an unbounded eval side would turn that into
    executor memory/disk pressure proportional to n-gram-multiplied
    eval bytes. ``train`` is the unbounded side and is never
    materialized."""
    t_sh = shingles(train, train_id, "text", n).select(
        F.col(train_id).alias("train_id"), "shingle"
    )
    # The eval shingle relation feeds THREE consumers on the bloom path
    # (bitmap build, join side, per-eval sizes) and two on the exact
    # path; unshared, each consumer re-scans and re-shingles the eval
    # corpus. The eval side is small BY DESIGN (benchmark suites), so a
    # lazy localCheckpoint computes it once and every consumer reads the
    # materialized rows.
    e_sh = (
        shingles(eval_df, eval_id, "text", n)
        .select(F.col(eval_id).alias("eval_id"), "shingle")
        .localCheckpoint(eager=False)
    )
    if prefilter == "bloom":
        from lotad_spark.pipeline.sketch import (
            bloom_build_terms,
            bloom_prefilter,
        )

        bloom = bloom_build_terms(
            e_sh.select("shingle"),
            "shingle",
            n_bits=prefilter_bits,
            n_hashes=prefilter_hashes,
        )
        t_sh = bloom_prefilter(
            t_sh,
            bloom,
            "shingle",
            n_bits=prefilter_bits,
            n_hashes=prefilter_hashes,
        )
    elif prefilter is not None:
        raise ValueError(
            f"contamination_pairs: unknown prefilter {prefilter!r} "
            "(expected None or 'bloom')"
        )
    e_sz = e_sh.groupBy("eval_id").agg(F.count(F.lit(1)).alias("e_sz"))
    # The whole point of the bloom path is surviving an eval set whose
    # FULL SHINGLE STRINGS no longer broadcast comfortably — so do NOT
    # force-broadcast them there: the corpus side is already reduced to
    # matches + the fp trickle, and the planner (AQE) picks broadcast
    # when the eval strings do fit, shuffle when they don't. The exact
    # path keeps the explicit hint (its design premise is a small eval
    # set and an UNREDUCED corpus side that must never shuffle).
    e_join = e_sh if prefilter == "bloom" else F.broadcast(e_sh)
    inter = (
        t_sh.join(e_join, "shingle")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(F.broadcast(e_sz), "eval_id")
        .select(
            "train_id",
            "eval_id",
            (F.col("n_inter").cast("double") / F.col("e_sz").cast("double")
             ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def contaminated_ids(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    n: int = 3,
    threshold: float = 0.5,
    train_id: str = "doc_id",
    eval_id: str = "doc_id",
) -> DataFrame:
    """Distinct train ids to DROP: one column ``train_id``. Feed to an
    anti-join against the corpus (see ``curate.curate_corpus``)."""
    return (
        contamination_pairs(
            train, eval_df, n=n, threshold=threshold,
            train_id=train_id, eval_id=eval_id,
        )
        .select("train_id")
        .distinct()
    )
