"""Count-min sketch: sublinear-state term-frequency estimation.

Cormode & Muthukrishnan 2005, "An improved data stream summary: the
count-min sketch and its applications" (J. Algorithms — public): a
depth × width grid of integer counters; every item increments ONE
counter per row (``counter[d][hash_d(x)] += 1``) and
``estimate(x) = min_d counter[d][hash_d(x)]`` — never an undercount
(every cell an item touches holds its true count plus non-negative
collision mass), overcount bounded by εN with probability 1−δ at
width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.

Why this matters at 100 TB: exact term frequencies shuffle on the TERM
VOCABULARY — billions of keys for a web corpus. The sketch's aggregation
state is depth·width integers NO MATTER the corpus: map-side combine
collapses each partition to ≤ depth·width cells before the exchange, the
merged sketch is a few KB, and sketches of independent shards/days merge
by cell-wise addition (the mergeable-summaries property) — so frequency
monitoring over a growing corpus never re-reads old text.

Determinism (the repo's oracle contract): ``hash_d(tok)`` is the first
8 md5 hex chars of ``'d:' + tok`` mod width — the md5 idiom shared with
the MinHash/LSH family, bit-identical in any engine — and every counter
is an exact integer sum, so build, merge, and estimate all replay
exactly in SQL.

Tokenization matches ``pipeline.text``: lowercased whitespace tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lotad_spark.pipeline.text import tokens

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _bucket(tok: Column, row: int, width: int) -> Column:
    """Row ``row``'s bucket for a token: first-8-hex-of-md5('row:tok')
    mod width — an unsigned 32-bit value, exact in bigint."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{row}:"), tok)), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % width
    )


def _token_stream(
    df: DataFrame, text_col: str
) -> DataFrame:
    return df.select(
        F.explode(
            F.filter(
                tokens(F.lower(F.coalesce(F.col(text_col), F.lit("")))),
                lambda w: w != "",
            )
        ).alias("_tok")
    )


def cms_build(
    df: DataFrame,
    text_col: str = "text",
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Sketch a corpus's token stream into a (row, bucket, cnt) relation
    of at most depth·width rows.

    Plan shape: one scan → explode tokens → explode the depth (row,
    bucket) cells per token → ONE aggregation whose key space is
    depth·width regardless of vocabulary — partial aggregation collapses
    each input partition to the sketch grid before the exchange, so the
    shuffle carries ≤ partitions·depth·width rows, never the corpus."""
    cells = _token_stream(df, text_col).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        _bucket(F.col("_tok"), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c")
    )
    return (
        cells.select(
            F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of independently-built sketches (same depth/width)
    — the mergeable-summaries property: sketch(A) ⊕ sketch(B) ≡
    sketch(A ∪ B) exactly (integer sums commute), pinned in tests. The
    daily-increment loop: sketch the new shard, merge, done — old text
    is never re-read."""
    if not sketches:
        raise ValueError("cms_merge: no sketches")
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("row", "bucket").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    term_col: str = "term",
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(term, est) for a bounded query vocabulary: est = min over the
    depth rows of the term's cell (a cell no query term hashes into is
    never read; a term absent from the stream min-coalesces with its
    empty cells to 0 — the no-undercount guarantee holds trivially).

    The probe relation is |terms|·depth rows against the ≤ depth·width
    sketch — both bounded, so the join broadcasts and the final min
    groups a tiny relation; corpus text is never touched at probe
    time."""
    probes = terms.select(
        F.col(term_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        _bucket(F.col(term_col), d, width).alias(
                            "bucket"
                        ),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(term_col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(term_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("est")
        )
    )
