"""Text-analysis operators: tokenization, stats, quality, language ID,
document fingerprints.

All pure ``pyspark.sql.functions`` expression compositions — no UDFs, no
shuffles beyond what the caller aggregates; every operator stays inside
whole-stage codegen and scales linearly with a single scan of the corpus.

Every formula is chosen to be *bit-reproducible in ANSI SQL* (DuckDB
oracle): md5 for fingerprints, integer counts, IEEE double arithmetic with
a fixed operation order.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lotad_spark.sources.memory import bounded_local_df
from lotad_spark.pipeline._share import share_corpus
from pyspark.sql.window import Window

# A BPE-ish pre-tokenization: letter runs, digit runs, single punctuation.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language marker lexicons for the heuristic language ID.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
    "zh": ["的", "是", "了", "在", "和"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of trimmed text — the repo-wide tokenization
    convention, mirrored verbatim by the oracles' ``_TOKS``
    (``string_split_regex(trim(text), '\\s+')``).

    Two deliberate convention notes (identical in both engines, so
    cross-engine hashes are safe): (1) ``trim`` strips ASCII SPACES
    only — text starting with a newline/tab yields one empty leading
    token, which splitting callers filter and counting callers
    (text_stats) count; (2) the token class is Java's ASCII ``\\s``
    ([ \\t\\n\\x0B\\f\\r]) — python's ``\\s``/str.split additionally
    treat \\x1c-\\x1f as whitespace (see the randomized-parity tests).
    Run :func:`normalize_text` first when byte-level noise would
    otherwise splinter the tokenization."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document counts: characters, whitespace tokens, BPE-ish tokens,
    punctuation marks."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(t).cast("bigint").alias("n_chars"),
        F.size(tokens(t)).cast("bigint").alias("n_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), F.lit(0)))
        .cast("bigint")
        .alias("n_tokens_bpeish"),
        F.size(F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]"), F.lit(0)))
        .cast("bigint")
        .alias("n_punct"),
    )


def quality_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic quality score in [0, 1]:

    0.5 * stopword-token ratio + 0.3 * min(n_tokens, 100)/100
    + 0.2 * (1 - punct/chars).

    Fixed operation order → bit-identical doubles in any IEEE engine.
    Divisors are clamped with greatest(·, 1) — mirrored in the oracle
    SQL — so an empty/whitespace-only document scores deterministically
    (and never divides by zero under ``spark.sql.ansi.enabled``).
    """
    return df.select(
        F.col(id_col), quality_expr(F.col(text_col)).alias("quality")
    )


def quality_expr(t: Column) -> Column:
    """The quality score as a composable Column expression (see
    :func:`quality_score` for the formula)."""
    stop = F.array([F.lit(w) for w in LANG_MARKERS["en"]])

    # Bind the token array once per row — `n_tokens` is referenced twice in
    # the score and inlining the tokenizer would re-split the text each time.
    def score_of(tk: Column) -> Column:
        n_tokens = F.size(tk).cast("double")
        stop_hits = F.size(
            F.filter(tk, lambda x: F.array_contains(stop, F.lower(x)))
        ).cast("double")
        n_chars = F.greatest(F.length(t), F.lit(1)).cast("double")
        n_punct = F.size(
            F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]"), F.lit(0))
        ).cast("double")
        return (
            (stop_hits / F.greatest(n_tokens, F.lit(1.0))) * F.lit(0.5)
            + (F.least(n_tokens, F.lit(100.0)) / F.lit(100.0)) * F.lit(0.3)
            + (F.lit(1.0) - n_punct / n_chars) * F.lit(0.2)
        )

    return F.transform(F.array(tokens(t)), score_of)[0]


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: count distinct marker-lexicon hits per
    language, pick the max (deterministic fixed tie-break order: en, de,
    fr, es, zh); a document with ZERO marker hits in every language is
    ``'unknown'`` — so marker-free/non-language text is rejected by
    ``corpus_filter`` instead of silently defaulting to the first
    language. A real deployment swaps the lexicons for char-n-gram
    profiles; the operator shape (pure expressions, argmax over scores)
    is the same."""
    # Score = number of the language's (distinct) marker words present.
    # Counting over the marker list (not the token list) gives identical
    # dedup semantics in any engine.
    #
    return df.select(
        F.col(id_col), lang_pred_expr(F.col(text_col)).alias("lang_pred")
    )


def lang_pred_expr(t: Column) -> Column:
    """The language prediction as a composable Column expression (see
    :func:`lang_id` for semantics)."""
    # Two lambda bindings (`transform(array(x), v -> …)[0]`) keep this one
    # pass per row: the lowered token array is bound once (inlining it
    # re-tokenizes the text per marker word), and the score vector is
    # bound once (the argmax references each score twice).
    langs = list(LANG_MARKERS)

    def scores_arr(tk: Column) -> Column:
        return F.array(*[
            F.size(
                F.filter(
                    F.array([F.lit(w) for w in LANG_MARKERS[lg]]),
                    lambda m: F.array_contains(tk, m),
                )
            )
            for lg in langs
        ])

    def pick(ss: Column) -> Column:
        best = F.array_max(ss)
        pred = F.lit(None).cast("string")
        # Earlier langs win ties → build the when-chain from the back.
        for i in reversed(range(len(langs))):
            pred = F.when(ss[i] == best, F.lit(langs[i])).otherwise(pred)
        return F.when(best == 0, F.lit("unknown")).otherwise(pred)

    toks = F.transform(tokens(t), F.lower)
    return F.transform(
        F.array(toks),
        lambda tk: F.transform(F.array(scores_arr(tk)), pick)[0],
    )[0]


def normalized_fingerprint(text_col: Column | str) -> Column:
    """md5 of whitespace-normalized lowercased text — catches
    formatting-only duplicates."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))


def winnow_fingerprint(
    text_col: Column | str, *, k: int = 8, window: int = 4
) -> Column:
    """Winnowing (MOSS-style) rolling fingerprint: hash every k-char gram
    of the normalized text, keep the minimum hash of each ``window``-gram
    block, digest the sorted distinct minima. Robust to local edits —
    only blocks overlapping a change alter the fingerprint set.

    Pure expressions (one pass, no shuffle); hashes are md5 hex prefixes
    so any SQL engine reproduces the value exactly.
    """
    name = text_col if isinstance(text_col, str) else None
    if name is None:
        raise ValueError("winnow_fingerprint needs a column name")
    norm = f"lower(regexp_replace(trim(`{name}`), '\\\\s+', ' '))"
    # Each stage is bound ONCE per row via a single-element transform()
    # lambda (`transform(array(x), v -> body)[0]`). Textually inlining the
    # stages instead re-evaluates `grams` inside every window-block lambda
    # iteration — interpreted higher-order functions do no subexpression
    # reuse, so that shape is O(len³) per document and hangs on real-sized
    # text. The lambda binding keeps it one pass, matching the staged-CTE
    # oracle SQL.
    #
    # sequence(1, 0) would flip to a descending range — guard texts
    # shorter than k with an explicit empty array.
    grams = (
        f"if(length(t) < {k}, array(), "
        f"transform(sequence(1, length(t) - {k} + 1), "
        f"i -> substr(md5(substring(t, i, {k})), 1, 8)))"
    )
    mins = (
        f"if(size(gs) = 0, array(), "
        f"transform(sequence(0, cast(ceil(size(gs) / {window}.0) as int) - 1), "
        f"w -> array_min(slice(gs, w * {window} + 1, {window}))))"
    )
    return F.expr(
        f"transform(array({norm}), t -> "
        f"transform(array({grams}), gs -> "
        f"md5(array_join(array_sort(array_distinct({mins})), '')))[0])[0]"
    )


def bow_fingerprint(text_col: Column | str) -> Column:
    """md5 of the sorted bag of lowercased tokens — catches word-reorder
    duplicates."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(
        F.array_join(F.array_sort(F.transform(tokens(c), F.lower)), " ")
    )


# PII scrub patterns, applied IN ORDER (email before IP before phone —
# the phone pattern would otherwise eat dotted IPs digit-by-digit).
# Regex subset chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB oracle): character classes, bounded repetition, \b — no
# lookarounds, no backreferences.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d()\- ]{6,}\d", "<PHONE>"),
]


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    *,
    patterns: list[tuple[str, str]] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Redact PII-shaped spans (emails, IPv4s, phone numbers) with typed
    placeholders — the standard pre-training privacy pass.

    A chain of JVM-side ``regexp_replace`` expressions in one projection:
    single scan, whole-stage codegen, no Python, no shuffle — at 100 TB
    this is scan-bound exactly like any other stateless gate, and it
    composes into :func:`corpus_filter`-style fused projections."""
    target = out_col or text_col
    expr = F.col(text_col)
    for pat, repl in patterns or PII_PATTERNS:
        expr = F.regexp_replace(expr, pat, repl)
    return df.withColumn(target, expr)


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document:
    (id, n_lines, dup_line_frac, top_bigram_frac).

    ``dup_line_frac`` — fraction of lines that are duplicates of an
    earlier line (1 − distinct/total) — and ``top_bigram_frac`` — share
    of all token bigrams taken by the single most frequent one — are the
    two cheapest high-signal repetition filters for crawl text.

    Plan shape: the line stats are a pure projection; the bigram mode
    needs true per-(doc, gram) counts, so it is ONE explode feeding two
    hash aggregations keyed by the doc id — partial aggregation runs
    map-side and only (doc, gram, count) partials shuffle. Left join back
    restores gram-free docs (fraction 0.0)."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    # ratios in exact integer micro-units (_ratio_6dp): round(double, 6)
    # on an int/int quotient is not engine-reproducible on exact .5e-6
    # boundaries — the same hardening as gopher_rules / the LM averages
    n_l = F.size(lines).cast("bigint")
    n_dup = (n_l - F.size(F.array_distinct(lines))).cast("bigint")
    base = df.select(
        F.col(id_col),
        n_l.alias("n_lines"),
        _ratio_6dp(
            n_dup, F.greatest(n_l, F.lit(1)).cast("bigint")
        ).alias("dup_line_frac"),
    )
    # Bind the token array once (same trick as dedup.shingles) and emit
    # overlapping bigrams; docs under 2 tokens yield no rows.
    grams = F.transform(
        F.array(tokens(t)),
        lambda tk: F.when(
            F.size(tk) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(tk) - 2),
                lambda i: F.array_join(F.slice(tk, i + 1, 2), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )[0]
    gram_mode = (
        df.select(F.col(id_col), F.explode(grams).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_top"), F.sum("_c").alias("_tot"))
    )
    return base.join(gram_mode, id_col, "left").select(
        id_col,
        "n_lines",
        "dup_line_frac",
        _ratio_6dp(
            F.coalesce(F.col("_top"), F.lit(0)).cast("bigint"),
            F.greatest(F.coalesce(F.col("_tot"), F.lit(0)), F.lit(1))
            .cast("bigint"),
        ).alias("top_bigram_frac"),
    )


def corpus_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    lang: str = "en",
    min_quality: float = 0.5,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
) -> DataFrame:
    """The canonical training-data gate: keep documents that are in
    ``lang``, score at least ``min_quality``, and fall inside the token
    bounds. Returns (id, quality, n_tokens) for the kept set.

    Pure EXPRESSION composition (``quality_expr`` + ``lang_pred_expr`` +
    token count in one projection): ONE scan, ZERO joins, ZERO exchanges
    — pinned by tests/test_plans.py. An earlier formulation joined the
    three operator DataFrames on the id and Catalyst did NOT collapse
    the self-joins (measured: 2 exchanges + 3 scans at sf0.01).
    Stateless expressions also mean the same definition runs unchanged
    on a ``readStream`` input — the streaming ingest gate."""
    t = F.col(text_col)
    return (
        df.select(
            F.col(id_col),
            quality_expr(t).alias("quality"),
            lang_pred_expr(t).alias("lang_pred"),
            F.size(tokens(t)).cast("bigint").alias("n_tokens"),
        )
        .filter(
            (F.col("lang_pred") == lang)
            & (F.col("quality") >= min_quality)
            & F.col("n_tokens").between(min_tokens, max_tokens)
        )
        .select(id_col, "quality", "n_tokens")
    )


def normalize_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    nfc: bool = False,
) -> DataFrame:
    """CCNet/FineWeb-style text normalization — the cleanup pass every
    web-scale pipeline runs BEFORE hashing/dedup so that byte-level
    noise (CRLF, control chars, run-on whitespace) doesn't splinter
    otherwise-identical documents into distinct hash buckets. Steps, in
    a fixed documented order:

    1. CRLF / bare CR → LF;
    2. strip control characters (C0 except tab/newline, plus DEL);
    3. collapse runs of spaces/tabs to one space;
    4. cap blank-line runs at one empty line (``\\n{3,}`` → two);
    5. trim leading/trailing whitespace.

    All five are chained ``regexp_replace`` in ONE JVM projection —
    zero shuffles, whole-stage codegen, streaming-safe. With
    ``nfc=True`` a Unicode NFC pass (stdlib ``unicodedata``, no deps)
    runs FIRST as an Arrow-batched mapInPandas stage — off by default
    so the default path stays pure-JVM; turn it on for multilingual
    corpora where composed/decomposed forms must hash identically.
    NULL text stays NULL (a missing document is not an empty one).

    Returns df with ``text_col`` replaced and ``n_chars_removed``
    (original minus normalized length, 0 for NULL) — the audit signal:
    a corpus where normalization removes 30% of bytes has an ingest
    problem worth seeing. With ``nfc=True`` the original length is
    captured BEFORE the NFC pass, so ``n_chars_removed`` includes
    characters the NFC composition itself removed (decomposed
    sequences shrinking when composed)."""
    pre_nfc_len: str | None = None
    if nfc:
        import pandas as pd  # noqa: F401 — mapInPandas contract

        # Capture the raw length before the NFC stage rewrites the
        # text — n_chars_removed is documented as original-minus-final,
        # and NFC composition can itself change the length.
        pre_nfc_len = "_pre_nfc_len"
        df = df.withColumn(
            pre_nfc_len, F.length(F.col(text_col)).cast("bigint")
        )
        fields = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in df.schema.fields
        )

        def nfc_batches(batches):
            import unicodedata

            for pdf in batches:
                out = pdf.copy()
                out[text_col] = pdf[text_col].map(
                    lambda t: None
                    if t is None
                    else unicodedata.normalize("NFC", t)
                )
                yield out

        df = df.mapInPandas(nfc_batches, schema=fields)
    t = F.col(text_col)
    orig_len = (
        F.col(pre_nfc_len) if pre_nfc_len is not None else F.length(t)
    )
    norm = F.regexp_replace(t, r"\r\n?", "\n")
    norm = F.regexp_replace(
        norm, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", ""
    )
    norm = F.regexp_replace(norm, r"[ \t]+", " ")
    norm = F.regexp_replace(norm, r"\n{3,}", "\n\n")
    # NOT F.trim: Spark's trim strips ONLY ASCII spaces, so a doc ending
    # in "\n" would keep it (caught by the randomized parity test —
    # DuckDB's trim shares the space-only behavior, so the oracle alone
    # could never have seen it). After steps 1-3 the only whitespace
    # left is space/tab/newline; strip those explicitly.
    norm = F.regexp_replace(norm, r"^[ \t\n]+|[ \t\n]+$", "")
    passthrough = [
        F.col(f.name)
        for f in df.schema.fields
        if f.name not in (id_col, text_col, pre_nfc_len)
    ]
    return df.select(
        F.col(id_col),
        norm.alias(text_col),
        *passthrough,
        F.coalesce(orig_len - F.length(norm), F.lit(0))
        .cast("bigint")
        .alias("n_chars_removed"),
    )


def blocklist_filter(
    df: DataFrame,
    terms: list[str] | tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    strategy: str = "literal",
) -> DataFrame:
    """Blocklist screening — the C4/FineWeb "banned words" gate (public;
    C4 dropped any page containing a word from the "List of Dirty,
    Naughty, Obscene..." list): per document, match the lowercased
    whitespace tokens against ``terms`` and emit
    (id, n_hits, hit_terms, blocked). Matching is EXACT token equality
    (no substring surprises — 'classic' never trips 'ass'); ``n_hits``
    counts total occurrences, ``hit_terms`` is the sorted DISTINCT
    matched terms joined with ',' (a deterministic audit trail), and
    ``blocked`` is n_hits > 0.

    Every row comes back flagged rather than silently dropped: at 100 TB
    the operational question is "what did the gate remove and why" —
    the kept corpus is one ``filter(~blocked)`` away.

    strategy='literal' (default): the term list rides into the
    projection as an array literal — ONE scan, zero joins, zero
    exchanges; right for the typical curated lists (hundreds to a few
    thousand terms). strategy='join': tokens explode into a broadcast
    join against the term relation and re-aggregate per doc — the shape
    for 100k+-term lists where a literal array bloats the plan; only
    MATCHED (doc, term) rows reach the aggregation exchange, so the
    shuffle is hit-sparse, never corpus-sized. Output-identical
    (pinned in tests)."""
    tl = sorted({t.lower() for t in terms})
    if not tl:
        raise ValueError("blocklist_filter: empty term list")
    if strategy == "literal":
        # Stage the token array as its own column first (the Spark 4
        # shared-lambda-tree hazard; see gopher_rules).
        staged = df.select(
            F.col(id_col),
            F.filter(
                tokens(F.lower(F.coalesce(F.col(text_col), F.lit("")))),
                lambda w: w != "",
            ).alias("_w"),
        )
        lit = F.array(*[F.lit(t) for t in tl])
        # Materialize the lambda-bearing n_hits tree in its OWN
        # projection before anything references it twice: reusing the
        # same F.filter(..., lambda) Column across sibling outputs of
        # one select is the Spark 4 common-expression-rewrite hazard
        # (sub-references can resolve against the sibling output; see
        # the strip_duplicate_spans incident). `blocked` below reads
        # the plain materialized column, never the shared tree.
        counted = staged.select(
            F.col(id_col),
            F.size(
                F.filter(F.col("_w"), lambda w: F.array_contains(lit, w))
            )
            .cast("bigint")
            .alias("n_hits"),
            F.array_join(
                F.array_sort(F.array_intersect(F.col("_w"), lit)), ","
            ).alias("hit_terms"),
        )
        return counted.select(
            F.col(id_col),
            F.col("n_hits"),
            F.col("hit_terms"),
            (F.col("n_hits") > 0).alias("blocked"),
        )
    if strategy != "join":
        raise ValueError(
            f"blocklist_filter: unknown strategy {strategy!r} "
            "(expected 'literal' or 'join')"
        )
    spark = df.sparkSession
    termdf = bounded_local_df(spark, [(t,) for t in tl], "_tok string")
    exploded = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                tokens(F.lower(F.coalesce(F.col(text_col), F.lit("")))),
                lambda w: w != "",
            )
        ).alias("_tok"),
    )
    hits = (
        exploded.join(F.broadcast(termdf), "_tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hits"),
            F.array_join(
                F.array_sort(F.collect_set("_tok")), ","
            ).alias("hit_terms"),
        )
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0).cast("bigint")).alias(
                "n_hits"
            ),
            F.coalesce(F.col("hit_terms"), F.lit("")).alias("hit_terms"),
            F.coalesce(F.col("n_hits") > 0, F.lit(False)).alias(
                "blocked"
            ),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document: (id, term, tf, df, score) —
    the classic keyword/topic signal a curation pipeline uses for
    domain bucketing and topical mixing.

    score = tf · ln(N / df), with terms lowercased whitespace tokens and
    the score rounded to 6 decimals so two engines computing the same
    ln() agree bit-for-bit after rounding. Ties break by term ascending
    (total order → reproducible top-k).

    Scale shape, all built-ins:
    * TF: one shuffle of (doc, term) — the exploded relation never
      carries the document text, and map-side partial aggregation
      collapses repeated terms per partition before the exchange;
    * DF: aggregates the TF output (already distinct per doc-term), so
      per-term document counts reuse the reduced relation, shuffling one
      row per distinct (doc, term);
    * N: a scalar count joined in as a literal-free crossjoin of a
      1-row frame — Catalyst broadcasts it;
    * top-k: rank ≤ k over a per-doc window → WindowGroupLimit prunes to
      k rows per doc map-side before the final shuffle."""
    tf = (
        df.select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = df.select(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * F.log(F.col("_n") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(id_col, "term", "tf", "df", "score")
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document average unigram log-probability under the corpus's
    own unigram LM: (id, n_tokens, avg_logprob) — the deterministic
    stand-in for CCNet-style perplexity filtering (a document of rare /
    incoherent tokens scores far below the corpus mode; gate on the
    tails). Trained and applied in one plan, no external model.

    Determinism: a float sum over a document's token log-probs would be
    reduction-order-dependent (parallel aggregation sums in partition
    order). Each term's log-prob is rounded to 6 decimals and cast to
    DECIMAL(18,6) FIRST, so the per-document sum is exact integer
    arithmetic — associative, partitioning-proof, and bit-equal in any
    engine (the repo-wide decimal-sum convention).

    Scale: token counts are one (doc, term) shuffle with map-side
    combine; the corpus LM aggregates that already-reduced relation; the
    scalar total-token count rides in as a broadcast; scoring joins tf
    against the LM by term — Catalyst broadcasts the LM when the vocab
    fits (the common case: vocab ≪ corpus), else it's a term-keyed
    shuffle of the reduced tf relation, never of raw text."""
    tf = (
        df.select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    lm = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    total = lm.select(F.sum("c").cast("double").alias("_t"))
    lm = lm.crossJoin(F.broadcast(total)).select(
        "term",
        F.round(F.log(F.col("c") / F.col("_t")), 6)
        .cast("decimal(18,6)")
        .alias("_lp"),
    )
    return (
        tf.join(lm, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("_lp")).alias("_sum_lp"),
        )
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            _avg_micros_6dp("_sum_lp", "n_tokens").alias("avg_logprob"),
        )
    )


def ccnet_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data", LREC — public): score every document with the corpus-LM
    average log-probability (:func:`unigram_logprob`, the deterministic
    perplexity proxy), then split EACH LANGUAGE into exact thirds by
    rank — ``head`` (most corpus-like), ``middle``, ``tail`` (the
    incoherent/rare-token residue CCNet discards). Returns
    ``(id, lang, n_tokens, avg_logprob, bucket, keep)`` with
    ``keep = bucket IN ('head', 'middle')`` (the paper's default
    head+middle training cut); every row comes back flagged, never
    dropped — including token-less documents (NULL / empty /
    whitespace-only text), which the scorer cannot rank: they return
    with ``n_tokens = 0``, ``avg_logprob`` NULL, and the explicit
    bucket ``'empty'`` (``keep = false``), so a keep-gated pipeline
    sees them audited rather than silently vanished. Terciles are
    computed over the SCORED documents only; ``'empty'`` rows are
    appended after the split and never perturb the thirds.

    Terciles are RANK-based, not value-threshold-based:
    ``bucket_idx = 3·(rank−1) div n`` over (avg_logprob DESC, id ASC)
    within the language — pure integer arithmetic on an exact
    deterministic ordering, so the split is bit-reproducible in any
    engine (percentile thresholds would re-introduce the approximate /
    boundary hazards the micro-unit scores just eliminated). Docs with
    NULL language bucket together under NULL — auditable, not hidden.

    Scale: one doc-keyed exchange inherited from the scorer plus one
    language-keyed rank window, plus the final id-keyed left join that
    carries token-less docs back (equi-join on the id, no new hazard).
    Language cardinality is tiny but a dominant language makes a hot
    partition (exact per-group rank — same trade as ``domain_cap``);
    at 100 TB compute per-language cut SCORES from the mergeable
    histogram quantiles (``column_histogram``/``quantiles_from_counts``)
    and broadcast them instead of ranking, accepting approximate
    boundaries."""
    scored = unigram_logprob(df, id_col=id_col, text_col=text_col)
    joined = scored.join(
        df.select(id_col, lang_col), id_col
    )
    wrank = Window.partitionBy(lang_col).orderBy(
        F.desc("avg_logprob"), F.asc(id_col)
    )
    wn = Window.partitionBy(lang_col)
    staged = joined.select(
        F.col(id_col),
        F.col(lang_col),
        F.col("n_tokens"),
        F.col("avg_logprob"),
        F.row_number().over(wrank).alias("_r"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    k = F.lit(3) * (F.col("_r") - 1)
    idx = ((k - k % F.col("_n")) / F.col("_n")).cast("int")
    withb = staged.select(
        id_col,
        F.col("n_tokens"),
        F.col("avg_logprob"),
        F.when(idx == 0, F.lit("head"))
        .when(idx == 1, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
    # Left-join the bucketed relation back onto the FULL input so
    # token-less docs (which unigram_logprob cannot emit) come back
    # flagged 'empty' instead of silently vanishing from a keep gate.
    flagged = df.select(id_col, lang_col).join(withb, id_col, "left")
    return flagged.select(
        id_col,
        lang_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias(
            "n_tokens"
        ),
        F.col("avg_logprob"),
        F.coalesce(F.col("bucket"), F.lit("empty")).alias("bucket"),
        F.coalesce(F.col("bucket").isin("head", "middle"), F.lit(False))
        .alias("keep"),
    )


def _avg_micros_6dp(sum_col: str, n_col: str) -> Column:
    """round(sum/n, 6) for a DECIMAL(·,6) sum — computed ENTIRELY in
    exact integer arithmetic (micro-units, HALF_UP away from zero via
    ``(2·|s| + n) div (2·n)``), then ONE IEEE division by 10⁶ of an
    exactly-representable integer for display. round(double, 6) on the
    quotient is NOT engine-reproducible when the true average lands
    exactly on a .5e-6 boundary: the nearest double sits a hair off the
    boundary and Java's BigDecimal-of-double HALF_UP reads its full
    binary expansion while DuckDB rounds the other way — observed at
    sf0.1 (doc 1185: −88.754679/26 = exactly −3.4136415). Integer
    division has no such boundary; the SQL oracles replay it with
    ``//`` on the same integers."""
    sm = (F.col(sum_col) * F.lit(1_000_000)).cast("bigint")
    n = F.col(n_col).cast("bigint")
    # Column API has no integer-div operator; (x − x % d) / d is an
    # exact multiple, so the IEEE division returns the integer exactly.
    x = F.lit(2) * F.abs(sm) + n
    d = F.lit(2) * n
    q = ((x - x % d) / d).cast("bigint")
    signed = F.when(sm < F.lit(0), -q).otherwise(q)
    return signed.cast("double") / F.lit(1_000_000.0)


def _ratio_6dp(num: Column, den: Column) -> Column:
    """round(num/den, 6) for NON-NEGATIVE integer counts, computed in
    exact integer micro-units (HALF_UP via ``(2·num·10⁶ + den) div
    (2·den)``) and finished with one exact IEEE division by 10⁶ — the
    same engine-boundary-proof shape as :func:`_avg_micros_6dp`:
    ``round(double, 6)`` flips engines when the true ratio lands
    exactly on a .5e-6 half boundary that no double represents (e.g. a
    78125-word document's 1-symbol ratio)."""
    a = num.cast("bigint") * F.lit(1_000_000)
    b = den.cast("bigint")
    x = F.lit(2) * a + b
    d = F.lit(2) * b
    q = ((x - x % d) / d).cast("bigint")
    return q.cast("double") / F.lit(1_000_000.0)


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """The Gopher document-quality rules (Rae et al. 2021, "Scaling
    Language Models: Methods, Analysis & Insights from Training Gopher",
    Appendix A.1.1 — public), the standard pre-filter stack every
    web-scale corpus runs before dedup: per document,

    * word count within [min_words, max_words];
    * mean word length within [min_mean_word_len, max_mean_word_len];
    * symbol-to-word ratio (``#`` or ``...``/``…``) ≤ max_symbol_ratio;
    * ≤ max_bullet_ratio of lines starting with a bullet
      (``•``/``-``/``*``);
    * ≤ max_ellipsis_ratio of lines ending with an ellipsis;
    * ≥ min_alpha_ratio of words containing an alphabetic character;
    * ≥ min_stopwords DISTINCT words from the small English stopword
      list present in the document (the paper requires the document to
      "contain at least two of" {the, be, to, of, and, that, have,
      with} — distinct membership, so a doc repeating one stopword
      twice does NOT pass; ``array_intersect`` dedupes in both engines).

    Returns every metric plus the combined ``passes`` flag so callers
    can audit WHICH rule fired (the operational need at 100 TB is "why
    did my corpus shrink 40%", not just the surviving rows).

    Scale/determinism shape: one projection over one scan — no joins, no
    aggregation, no shuffle; every metric is integer counting over the
    token/line arrays, and the ratios/mean round via exact
    integer-micro-unit division (:func:`_ratio_6dp` — engine-boundary
    proof; the SQL oracle replays the identical integer arithmetic, and
    threshold comparisons run on the ROUNDED values so both engines
    branch identically).
    NULL text coalesces to '' (scores as an empty document and fails
    the word-count rule, never poisons size() with -1). "Alphabetic"
    means ASCII [a-z] after lowercasing — swap the class for \\p{L}
    when filtering multilingual corpora."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    # Two-stage projection: the lambda-bearing token/line arrays land as
    # their own columns first, and every metric references the PLAIN
    # columns — sharing one HOF tree across sibling select outputs hits
    # a Spark 4 common-expression-rewrite hazard (sub-references can
    # resolve against the sibling output; see strip_duplicate_spans).
    staged = df.select(
        F.col(id_col),
        F.filter(tokens(F.lower(t)), lambda w: w != "").alias("_w"),
        F.filter(
            F.transform(F.split(t, r"\n"), lambda line: F.trim(line)),
            lambda line: line != "",
        ).alias("_l"),
        F.size(
            F.regexp_extract_all(t, F.lit(r"#|\.\.\.|…"), F.lit(0))
        ).alias("_nsym"),
    )
    words, lines = F.col("_w"), F.col("_l")
    n_words = F.size(words)
    n_lines = F.size(lines)
    sum_word_len = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    n_symbols = F.col("_nsym")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda line: line.startswith("•")
            | line.startswith("-")
            | line.startswith("*"),
        )
    )
    n_ellipsis = F.size(
        F.filter(
            lines,
            lambda line: line.endswith("...") | line.endswith("…"),
        )
    )
    n_alpha = F.size(
        F.filter(words, lambda w: w.rlike("[a-z]"))
    )
    stop = F.array(
        *[
            F.lit(w)
            for w in ("the", "be", "to", "of", "and", "that", "have", "with")
        ]
    )
    n_stop = F.size(F.array_intersect(words, stop))
    d1 = F.greatest(n_words, F.lit(1)).cast("bigint")
    dl = F.greatest(n_lines, F.lit(1)).cast("bigint")
    metrics = staged.select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        _ratio_6dp(sum_word_len, d1).alias("mean_word_len"),
        _ratio_6dp(n_symbols, d1).alias("symbol_ratio"),
        _ratio_6dp(n_bullet, dl).alias("bullet_ratio"),
        _ratio_6dp(n_ellipsis, dl).alias("ellipsis_ratio"),
        _ratio_6dp(n_alpha, d1).alias("alpha_ratio"),
        n_stop.cast("bigint").alias("n_stopwords"),
    )
    return metrics.withColumn(
        "passes",
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(
            min_mean_word_len, max_mean_word_len
        )
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_ratio") <= max_bullet_ratio)
        & (F.col("ellipsis_ratio") <= max_ellipsis_ratio)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
        & (F.col("n_stopwords") >= min_stopwords),
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document average log-probability under the corpus's own
    INTERPOLATED BIGRAM LM: (id, n_tokens, avg_logprob) — the contextual
    upgrade of :func:`unigram_logprob`'s perplexity proxy (CCNet filters
    with a 5-gram KenLM; a bigram model with absolute discounting is the
    honest distributed version — it already separates shuffled-word-salad
    from coherent text, which a unigram model by construction cannot).

    Model (absolute discounting interpolated with the unigram, Ney et
    al. 1994, public):

        P(w₂|w₁) = max(c(w₁,w₂) − D, 0)/c(w₁·)
                   + (D · N₁₊(w₁)/c(w₁·)) · P_uni(w₂)

    with ``c(w₁·) = Σ_w c(w₁,w)`` (the history count, derived from the
    bigram relation itself so the model is self-consistent), ``N₁₊(w₁)``
    the number of distinct continuations of w₁, and
    ``P_uni(w) = c(w)/T``. A document scores ``ln P_uni(w₁)`` for its
    first token plus ``ln P(wᵢ|wᵢ₋₁)`` per transition, averaged over its
    n tokens. Trained and applied on the same corpus in one plan, so
    every scored bigram exists in the model — no unseen-event branch.

    Determinism: each term is rounded to 6 decimals and cast to
    DECIMAL(18,6) FIRST, so per-document sums are exact integer
    arithmetic (the repo-wide decimal-sum convention); all the model's
    inputs are integer counts, and the per-term double expression has a
    fixed operation order mirrored by the SQL oracle.

    Scale shape: bigrams explode once from a zip of two token-array
    slices — the raw text is scanned once and never shuffles; the
    (doc, w₁, w₂) relation gets map-side combine before its one
    exchange; the model relations (bigram counts, history stats,
    unigram) aggregate that already-reduced relation; scoring joins the
    doc-bigram relation against the model by (w₁, w₂) — a term-keyed
    shuffle of reduced rows, the :func:`unigram_logprob` shape. The
    multi-consumer feature relation is lazily checkpointed (the
    dsir/retrieval pattern) so the corpus tokenizes exactly once."""
    toks = F.filter(
        tokens(F.lower(F.col(text_col))), lambda t: t != ""
    )
    n = F.size(toks)
    base = (
        df.select(
            F.col(id_col),
            toks.alias("_w"),
            n.alias("_n"),
            F.element_at(toks, 1).alias("_w1first"),
        )
        .filter(F.col("_n") >= 1)
    )
    # three consumers (pairs, unigram counts, first-token rows):
    # share the tokenized relation so raw text scans ONCE
    base = share_corpus(base)
    pairs = base.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.slice(F.col("_w"), 1, F.col("_n") - 1).alias("w1"),
                F.slice(F.col("_w"), 2, F.col("_n") - 1).alias("w2"),
            )
        ).alias("_p"),
    ).select(
        id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )
    doc_pairs = share_corpus(
        pairs.groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    uni = share_corpus(
        base.select(id_col, F.explode("_w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = uni.select(F.sum("c").cast("double").alias("_t"))
    big = doc_pairs.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
    hist = big.groupBy("w1").agg(
        F.sum("c12").alias("chist"),
        F.count(F.lit(1)).alias("n1plus"),
    )
    d = F.lit(discount)
    # ln( max(c12−D,0)/chist + ((D·n1plus)/chist) · (c2/T) ) — fixed
    # operation order, mirrored verbatim by the SQL oracle.
    p_bi = F.greatest(
        F.col("c12") - d, F.lit(0.0)
    ) / F.col("chist") + (
        d * F.col("n1plus") / F.col("chist")
    ) * (F.col("_c2") / F.col("_t"))
    trans = (
        doc_pairs.join(big, ["w1", "w2"])
        .join(hist, "w1")
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c").alias("_c2")),
            "w2",
        )
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            (
                F.col("tf")
                * F.round(F.log(p_bi), 6).cast("decimal(18,6)")
            ).alias("_lp"),
        )
    )
    first = (
        base.select(id_col, F.col("_w1first").alias("w"), "_n")
        .join(uni, "w")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.col("_n"),
            F.round(F.log(F.col("c") / F.col("_t")), 6)
            .cast("decimal(18,6)")
            .alias("_lp"),
        )
    )
    sums = (
        trans.select(id_col, "_lp")
        .unionByName(first.select(id_col, "_lp"))
        .groupBy(id_col)
        .agg(F.sum("_lp").alias("_sum_lp"))
    )
    return (
        first.select(id_col, "_n")
        .join(sums, id_col)
        .select(
            F.col(id_col),
            F.col("_n").cast("bigint").alias("n_tokens"),
            _avg_micros_6dp("_sum_lp", "_n").alias("avg_logprob"),
        )
    )


def duplicate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    delim: str = "\n",
) -> DataFrame:
    """Corpus-wide duplicated lines per document (the CCNet-style
    boilerplate signal: headers, cookie banners, navigation chrome
    repeat VERBATIM across pages): one row per (id, line_pos) whose
    trimmed line occurs >= min_count times across the whole corpus,
    with the occurrence count. Blank lines are ignored. ``delim`` is
    a LITERAL separator (regex-escaped before the split).

    Scale: lines explode once; the shuffle key is the FULL 128-bit md5
    of the trimmed line (fixed width, never text — same discipline as
    spandedup's 16-byte positional grams; a truncated 64-bit key would
    see birthday collisions at web-corpus line cardinalities and
    silently delete non-duplicate lines); the duplicate-key relation is
    bounded by the distinct-line vocabulary and joins back to the
    positional relation by hash only."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), re.escape(delim))
        ).alias("line_pos", "_line"),
    ).select(
        id_col,
        "line_pos",
        F.md5(F.trim("_line")).alias("_lh"),
        (F.length(F.trim("_line")) > 0).alias("_nonblank"),
    ).filter("_nonblank")
    dup = (
        lines.groupBy("_lh")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )
    return lines.join(dup, "_lh").select(
        id_col, "line_pos", "n_occurrences"
    )


def strip_duplicate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    delim: str = "\n",
) -> DataFrame:
    """Rewrite each document with its corpus-duplicated lines removed:
    (id, text, n_lines_removed). Documents with no duplicated line pass
    through BYTE-IDENTICAL (the rebuild only runs when a line is
    actually removed).

    Only line POSITIONS travel back to the corpus (one shuffle of
    (id, int) pairs, never line text); removal is a position filter
    over the split array, so the raw text is read exactly once on the
    rebuild side."""
    removed = (
        duplicate_lines(df, id_col, text_col, min_count, delim)
        .groupBy(id_col)
        .agg(F.collect_list("line_pos").alias("_rm"))
    )
    joined = df.join(removed, id_col, "left")
    parts = F.split(F.col(text_col), re.escape(delim))
    kept = F.filter(
        F.transform(
            parts,
            lambda line, i: F.struct(line.alias("t"), i.alias("p")),
        ),
        lambda s: ~F.array_contains(F.col("_rm"), s["p"]),
    )
    return joined.select(
        F.col(id_col),
        F.when(F.col("_rm").isNull(), F.col(text_col))
        .otherwise(F.array_join(F.transform(kept, lambda s: s["t"]), delim))
        .alias(text_col),
        F.when(F.col("_rm").isNull(), F.lit(0))
        .otherwise(F.size("_rm"))
        .cast("bigint")
        .alias("n_lines_removed"),
    )


# --- Unicode script profiling ------------------------------------------
# Character classes per major script, built from RAW characters (not
# \uXXXX escapes — Java's \uHHHH, RE2's \x{HH}, and Python's escapes
# have no common syntax, but a literal char in a class means the same
# thing to all three engines: the _NBSP precedent). BMP ranges only:
# Java regex sees supplementary chars as surrogate pairs, so classes
# stay below U+10000 and supplementary text simply counts toward no
# class (never mis-counts).


def _chr_range(lo: int, hi: int) -> str:
    return chr(lo) + "-" + chr(hi)


SCRIPT_CLASSES: tuple = (
    ("latin", "[A-Za-z" + _chr_range(0xC0, 0x24F) + "]"),
    ("cyrillic", "[" + _chr_range(0x400, 0x52F) + "]"),
    ("greek", "[" + _chr_range(0x370, 0x3FF) + "]"),
    ("arabic", "[" + _chr_range(0x600, 0x6FF) + _chr_range(0x750, 0x77F) + "]"),
    ("hebrew", "[" + _chr_range(0x590, 0x5FF) + "]"),
    ("devanagari", "[" + _chr_range(0x900, 0x97F) + "]"),
    ("han", "[" + _chr_range(0x3400, 0x4DBF) + _chr_range(0x4E00, 0x9FFF) + "]"),
    ("kana", "[" + _chr_range(0x3040, 0x30FF) + "]"),
    ("hangul", "[" + _chr_range(0x1100, 0x11FF) + _chr_range(0xAC00, 0xD7AF) + "]"),
)


def script_profile(
    df: DataFrame,
    text_col: str = "text",
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_chars, <script>_chars per class, dominant_script) — the
    writing-system complement to :func:`lang_id`: per-script character
    counts (count = length minus length-after-removing-the-class, one
    regexp_replace per class) and the dominant script (first class in
    listed order reaching the maximum; 'none' when no class matches —
    digits/punctuation-only docs). A training pipeline uses this to
    route language-specific stages, to catch script-mixing spam
    (Cyrillic lookalikes inside Latin words score both classes), and
    to audit corpus composition. Two staged projections fused into the
    scan: zero UDFs, zero exchanges. NULL text profiles as NULL counts.

    Staging note (r18): computing ``dominant_script`` directly over the
    nine regexp count EXPRESSIONS duplicated each count ~10× (once in
    ``greatest``, once per when-branch) and the generated
    ``processNext()`` blew janino's 64 KB method limit — the row ran
    interpreted. Stage 1 materializes the counts as named columns;
    stage 2 ranks over cheap attribute references. Catalyst's
    CollapseProject keeps the stages separate because each count
    column is referenced more than once downstream (non-cheap aliases
    used >1× are never re-inlined), so each generated method stays
    small and the plan compiles (pinned in tests/test_plans.py)."""
    txt = F.col(text_col)
    staged = df.select(
        F.col(id_col),
        F.length(txt).cast("int").alias("n_chars"),
        txt.isNull().alias("_txt_null"),
        *[
            (F.length(txt) - F.length(F.regexp_replace(txt, pat, "")))
            .cast("int")
            .alias(f"{name}_chars")
            for name, pat in SCRIPT_CLASSES
        ],
    )
    cols = [(name, F.col(f"{name}_chars")) for name, _p in SCRIPT_CLASSES]
    best = F.greatest(*[c for _n, c in cols])
    dominant = F.lit("none")
    for name, c in reversed(cols):  # first-listed wins ties
        dominant = F.when((best > 0) & (c == best), F.lit(name)).otherwise(
            dominant
        )
    return staged.select(
        F.col(id_col),
        "n_chars",
        *[f"{name}_chars" for name, _p in SCRIPT_CLASSES],
        # NULL text profiles as NULL, not 'none' (a when() chain over
        # NULL counts would fall through to the literal)
        F.when(F.col("_txt_null"), F.lit(None).cast("string"))
        .otherwise(dominant)
        .alias("dominant_script"),
    )


# readability tokens: sentence-ending punctuation runs, word tokens,
# vowel-group runs (the classic syllable heuristic) — common
# Java-regex/RE2 subset, replayed verbatim by the oracle
READABILITY_SENT_RE = "[.!?]+"
READABILITY_WORD_RE = "[^ \t\n\r\f]+"
READABILITY_VOWEL_RE = "[aeiouyAEIOUY]+"

# One sentence = a maximal run of non-terminator characters plus its
# trailing terminator run (a final fragment without a terminator still
# counts — truncated crawl text is data). Same [.!?] terminator class
# as READABILITY_SENT_RE; the pattern lives in the common
# Java-regex/RE2/Python subset.
SENTENCE_SPLIT_RE = "[^.!?]+[.!?]*"
_SENT_TRIM_HEAD = "^[ \t\n\r\f]+"
_SENT_TRIM_TAIL = "[ \t\n\r\f]+$"


def sentence_split(
    df: DataFrame,
    text_col: str = "text",
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, sentence_id, sentence) — sentence segmentation for
    chunking, per-sentence dedup/decontamination, and citation-grain
    alignment: maximal non-terminator runs with their trailing
    ``[.!?]`` run, whitespace-trimmed, empties dropped, 0-based ids in
    document order. NULL/empty text yields no rows (count docs
    upstream). One projection + posexplode fused into the scan — no
    shuffle, linear in bytes; the r16 oracle replays the same pattern
    with DuckDB list functions and a positional parallel unnest."""
    txt = F.col(text_col)
    sents = F.filter(
        F.transform(
            F.regexp_extract_all(txt, F.lit(SENTENCE_SPLIT_RE), 0),
            lambda s: F.regexp_replace(
                F.regexp_replace(s, _SENT_TRIM_HEAD, ""),
                _SENT_TRIM_TAIL,
                "",
            ),
        ),
        lambda s: s != "",
    )
    return df.select(
        F.col(id_col), F.posexplode(sents).alias("sentence_id", "sentence")
    ).select(
        id_col, F.col("sentence_id").cast("int"), "sentence"
    )


def readability(
    df: DataFrame,
    text_col: str = "text",
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_sentences, n_words, n_vowel_groups, flesch_micro) — the
    Flesch reading-ease quality signal in EXACT integer micro-units
    (the gopher_rules discipline, so both engines branch and round
    identically): score·10⁶ = 206835000
    − (1015000·words) // max(sentences, 1)
    − (84600000·vowel_groups) // max(words, 1), with vowel-group runs
    as the standard syllable heuristic and sentence-ending punctuation
    runs as sentences. Training pipelines bucket on this next to
    quality_score/gopher_rules: very low scores flag dense boilerplate
    and OCR junk, implausibly high ones flag word-salad. Honest limit:
    the heuristic is English-centric (vowel-group syllables); for
    other scripts use :func:`script_profile` to route first. One
    projection fused into the scan; NULL text yields NULL columns."""
    txt = F.col(text_col)

    def n_matches(pat):
        return F.size(F.regexp_extract_all(txt, F.lit(pat), 0))

    staged = df.select(
        F.col(id_col),
        txt.isNull().alias("_tnull"),
        n_matches(READABILITY_SENT_RE).cast("int").alias("n_sentences"),
        n_matches(READABILITY_WORD_RE).cast("int").alias("n_words"),
        n_matches(READABILITY_VOWEL_RE).cast("int").alias("n_vowel_groups"),
    )
    # TRUE integer division (`div`) on bigint, not floor(double /):
    # the double path loses units once count*10^6 exceeds 2^53, which
    # would hash-mismatch the oracle's exact `//` on a pathological
    # ~100 MB document; multiply in bigint (int32 overflows under
    # ANSI). All operands are non-negative, so Spark's
    # truncate-toward-zero div and DuckDB's floor `//` agree.
    flesch = F.expr(
        "CAST(206835000 AS BIGINT) "
        "- (CAST(1015000 AS BIGINT) * n_words) "
        "div greatest(n_sentences, 1) "
        "- (CAST(84600000 AS BIGINT) * n_vowel_groups) "
        "div greatest(n_words, 1)"
    )
    return staged.select(
        id_col,
        "n_sentences",
        "n_words",
        "n_vowel_groups",
        F.when(F.col("_tnull"), F.lit(None).cast("bigint"))
        .otherwise(flesch.cast("bigint"))
        .alias("flesch_micro"),
    )
