"""Exact duplicate-substring span detection (Lee et al., "Deduplicating
Training Data Makes Language Models Better" — the ExactSubstr operator).

Document-level dedup (exact hash, MinHash) misses the common failure
mode of web corpora: distinct pages sharing long verbatim passages
(boilerplate, quotes, licenses). The remedy is span-level: find every
maximal token range whose n-grams occur elsewhere in the corpus, so the
caller can strip the span (or weigh it down) instead of dropping whole
documents.

The reference implementation builds a suffix array — inherently
single-machine. The distributed re-expression here is positional
n-gram matching, the standard Spark-native equivalent:

* one explode of (doc, token-position) n-grams, each hashed once to a
  64-bit key (16 md5 hex chars — shuffle key is 16 bytes, never text);
* one groupBy over the gram hash finds globally repeated grams
  (map-side partial aggregation collapses local repeats first);
* an equi-join marks the repeated positions (AQE broadcasts the dup-key
  relation when small);
* a per-document gaps-and-islands window merges overlapping /
  adjacent covered intervals into maximal spans.

A span of L >= n duplicated tokens is covered by L−n+1 consecutive
repeated n-grams, so merged islands reproduce exactly the maximal
repeated substrings of length >= n (up to hash collisions: ~2^-64 per
gram pair).

100 TB design: no all-pairs anything — cost is one shuffle of
(16-byte hash) gram rows plus one join on the same key; the window is
partitioned by doc_id (bounded by document length, never corpus size).
At production scale swap md5 for ``F.xxhash64`` — shapes unchanged
(md5 kept here for bit-identical DuckDB oracle parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lotad_spark.pipeline.text import tokens

DEFAULT_N = 6


def positional_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_N,
) -> DataFrame:
    """(id, pos, gh): one row per token position 0 <= pos <= len−n, with
    gh = first 16 md5 hex chars of the space-joined n-gram starting
    there. Documents shorter than n tokens emit nothing."""
    # Bind the token array once per row (see shingles() in dedup.py) —
    # re-splitting inside the per-gram lambda is O(tokens × length).
    grams = F.transform(
        F.array(tokens(F.col(text_col))),
        lambda tk: F.when(
            F.size(tk) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(tk) - n),
                lambda i: F.substring(
                    F.md5(F.array_join(F.slice(tk, i + 1, n), " ")), 1, 16
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )[0]
    return df.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "gh")
    )


def _spans_from_marked(marked: DataFrame, id_col: str, n: int) -> DataFrame:
    """Gaps-and-islands merge of duplicated gram positions into maximal
    spans — the ONE definition both the batch operator and the
    incremental index probe assemble spans with (their bit-equality
    contract depends on sharing it). Two covered intervals [p, p+n−1],
    [q, q+n−1] (p < q) merge iff q <= p + n."""
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        marked.withColumn(
            "_new",
            F.when(F.col("pos") - F.lag("pos").over(w) > n, 1).otherwise(0),
        )
        .withColumn("_isl", F.sum("_new").over(w))
    )
    return (
        islands.groupBy(id_col, "_isl")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).cast("bigint").alias("span_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_dup_grams"),
        )
        .select(id_col, "span_start", "span_end", "n_dup_grams")
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_N,
    min_count: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans per document:
    (id, span_start, span_end, n_dup_grams) — token indices inclusive,
    0-based. Guarantee: every TOKEN in [span_start, span_end] lies
    inside at least one n-gram that occurs >= min_count times
    corpus-wide. (Islands merge across position gaps of up to n, so an
    interior n-gram starting at an unmarked position need not itself be
    duplicated — the coverage guarantee is per token, not per gram.)"""
    grams = positional_ngrams(df, id_col, text_col, n)
    dup_keys = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("gh")
    )
    marked = grams.join(dup_keys, "gh").select(id_col, "pos")
    return _spans_from_marked(marked, id_col, n)


def write_span_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_N,
) -> None:
    """Persist the corpus's gram-occurrence counts — ``path/grams``
    parquet of (gh, n_occurrences): 16-byte keys and a count, never
    text — plus ``path/params`` recording the gram length, so a probe
    with a mismatched ``n`` fails loudly instead of silently
    under-detecting (hashes of different-length grams never match).
    The nightly-ingest face of span dedup: tomorrow's batch probes this
    index instead of re-reading the corpus."""
    from lotad_spark.storeparams import write_params

    (
        positional_ngrams(df, id_col, text_col, n)
        .groupBy("gh")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
        .write.mode("overwrite")
        .parquet(f"{path}/grams")
    )
    write_params(df.sparkSession, f"{path}/params", "n int", (int(n),))


def duplicate_spans_against_index(
    new_docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_N,
    min_count: int = 2,
) -> DataFrame:
    """Duplicated spans of a NEW batch against corpus ∪ batch, without
    re-reading the corpus: a gram is duplicated when its stored corpus
    count plus its batch count reaches ``min_count`` — exactly the
    count the batch operator would see over the union, so results are
    bit-equal to ``duplicate_spans(corpus ∪ batch)`` restricted to
    batch documents (the oracle contract). One equi-join on the 16-byte
    gram key; index rows never fan out (grouped to one count per key).
    Raises if ``n`` differs from the index's stored gram length."""
    from lotad_spark.storeparams import read_params

    spark = new_docs.sparkSession
    stored = read_params(spark, f"{index_path}/params")
    if stored is None:
        # span indexes have recorded params from birth — absence means
        # this is not a span index at all
        raise ValueError(
            f"no span index params at {index_path}/params — is this a "
            "write_span_index output?"
        )
    stored_n = stored.n
    if stored_n != n:
        raise ValueError(
            f"span index at {index_path} was built with n={stored_n}; "
            f"probing with n={n} would silently miss every stored gram"
        )
    grams = positional_ngrams(new_docs, id_col, text_col, n)
    batch_counts = grams.groupBy("gh").agg(
        F.count(F.lit(1)).alias("_bc")
    )
    idx = spark.read.parquet(f"{index_path}/grams")
    total = (
        batch_counts.join(idx, "gh", "left")
        .select(
            "gh",
            (F.col("_bc") + F.coalesce("n_occurrences", F.lit(0))).alias("_tc"),
        )
        .filter(F.col("_tc") >= min_count)
        .select("gh")
    )
    marked = grams.join(total, "gh").select(id_col, "pos")
    return _spans_from_marked(marked, id_col, n)


def contamination_spans(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_N,
) -> DataFrame:
    """Span-level benchmark decontamination: the maximal token ranges of
    TRAINING documents whose n-grams appear anywhere in the eval set —
    (train id, span_start, span_end, n_dup_grams). Document-level
    contamination checks (pipeline/contamination.py) say WHICH docs
    overlap; this says WHERE, so the remedy can be span removal (feed
    the output to ``strip_duplicate_spans(spans=...)``) instead of
    dropping whole documents.

    Scale: eval benchmarks are tiny next to a training corpus — the
    distinct eval gram keys broadcast (AQE's call via the equi-join),
    and the train side is one positional-gram explode + the shared
    per-doc islands window. The eval TEXT never joins anything."""
    eval_keys = (
        positional_ngrams(eval_docs, id_col, text_col, n)
        .select("gh")
        .distinct()
    )
    grams = positional_ngrams(train, id_col, text_col, n)
    marked = grams.join(eval_keys, "gh").select(id_col, "pos")
    return _spans_from_marked(marked, id_col, n)


def strip_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_N,
    min_count: int = 2,
    spans: DataFrame | None = None,
) -> DataFrame:
    """Rewrite each document with its duplicated spans removed:
    (id, text, n_tokens_removed). Documents with no duplicated span pass
    through unchanged with n_tokens_removed = 0.

    Pass ``spans`` (a ``duplicate_spans``-shaped relation, e.g. one
    already computed and written out) to skip re-running the detection
    pipeline. When ``spans`` is given, ``n`` and ``min_count`` are NOT
    used — the spans are taken as-is, so they must come from the SAME
    corpus snapshot and tokenization. A span whose positions fall
    outside the document's token range raises at execution time — the
    guard is attached to BOTH output columns, so it fires whenever the
    rewritten text or the removal count is actually computed (stale
    spans silently removing the wrong tokens is the failure mode this
    guards against); spans for ids absent from ``df`` are ignored by
    the join.

    The span relation re-joins to the corpus on id (one shuffle of
    span metadata — 3 ints per span, never text); removal itself is a
    pure filter over token positions, no Python in the loop."""
    validate_bounds = spans is not None
    if spans is None:
        spans = duplicate_spans(df, id_col, text_col, n, min_count)
    spans = (
        spans
        .groupBy(id_col)
        .agg(
            F.collect_list(
                F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))
            ).alias("_spans")
        )
    )
    joined = df.join(spans, id_col, "left")
    tk = F.array(tokens(F.col(text_col)))  # bind once
    kept = F.transform(
        tk,
        lambda toks: F.filter(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size(toks) - 1, F.lit(0)),
                ),
                lambda i: F.struct(toks[i].alias("t"), i.alias("p")),
            ),
            lambda s: ~F.exists(
                F.col("_spans"),
                lambda sp: (s["p"] >= sp["s"]) & (s["p"] <= sp["e"]),
            ),
        ),
    )[0]
    n_toks = F.size(tk[0])
    # Documents with no duplicated span pass through BYTE-IDENTICAL —
    # the token-rebuild (single-space array_join) only runs when a span
    # was actually removed, so untouched text keeps its whitespace.
    new_text = F.when(F.col("_spans").isNull(), F.col(text_col)).otherwise(
        F.array_join(F.transform(kept, lambda s: s["t"]), " ")
    )
    new_count = (
        F.when(F.col("_spans").isNull(), F.lit(0))
        .otherwise(n_toks - F.size(kept))
        .cast("bigint")
    )
    if validate_bounds:
        # User-supplied spans: positions outside [0, n_tokens-1] mean
        # the spans were built against a different corpus snapshot or
        # tokenization — fail loudly instead of removing wrong tokens.
        # (Internally-computed spans are in-bounds by construction.)
        # The guard wraps BOTH output columns — Spark prunes expressions
        # of unreferenced columns, so a guard on text alone would never
        # run for a consumer selecting only the removal counts — and the
        # predicate is MATERIALIZED as its own boolean column first:
        # sharing the lambda-bearing predicate tree across two sibling
        # outputs made Spark 4's common-expression rewrite resolve the
        # count guard's token count against the REBUILT text sibling,
        # firing the raise on perfectly valid spans (observed; the
        # non-cheap exists() keeps CollapseProject from re-inlining).
        bad = ~F.col("_spans").isNull() & F.exists(
            F.col("_spans"),
            lambda sp: (sp["s"] < 0) | (sp["s"] > sp["e"]) | (sp["e"] >= n_toks),
        )
        flagged = joined.withColumn("_bad", bad)
        err = F.raise_error(
            F.concat(
                F.lit(
                    "strip_duplicate_spans: span outside the document's"
                    " token range (stale or mismatched spans?) for id="
                ),
                F.col(id_col).cast("string"),
            )
        )
        return flagged.select(
            F.col(id_col),
            F.when(F.col("_bad"), err).otherwise(new_text).alias(text_col),
            F.when(F.col("_bad"), err.cast("bigint"))
            .otherwise(new_count)
            .alias("n_tokens_removed"),
        )
    return joined.select(
        F.col(id_col),
        new_text.alias(text_col),
        new_count.alias("n_tokens_removed"),
    )
