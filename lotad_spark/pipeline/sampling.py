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


def weighted_sample(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    weight_col: str = "weight",
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): each row gets priority ln(u)/w for a hash-derived
    uniform u ∈ (0, 1] and weight w > 0, and the k largest priorities
    win — inclusion probability proportional to weight, no replacement,
    no accept/reject loop.

    Deterministic by the same contract as :func:`hash_sample`: u comes
    from md5(salt ':' id), so the selection is identical on every run,
    partitioning, and engine (the driver oracle replays it in SQL).

    Scale: priorities are pure scan-side expressions; the top-k runs as
    Spark's TakeOrderedAndProject — per-partition heaps of size k merged
    on the driver, never a global sort shuffle. Rows with NULL or
    non-positive weight are excluded (as the math requires w > 0)."""
    if k <= 0:
        raise ValueError(f"weighted_sample: k must be positive, got {k}")
    w = F.col(f"`{weight_col}`").cast("double")
    # (hash32 + 1) / (2^32 + 1) ∈ (0, 1]: never 0 (ln undefined), can
    # reach 1 (priority 0, the best possible) — exactly the A-ES domain.
    u = (F.conv(sample_key(id_col, salt), 16, 10).cast("double") + 1) / F.lit(
        float(2**32 + 1)
    )
    pri = F.log(u) / w
    # NaN weights satisfy `w > 0` (Spark orders NaN above all doubles)
    # and a NaN priority sorts FIRST under desc — without the isnan
    # guard a single NaN row deterministically hijacks a sample slot.
    return (
        df.filter(w.isNotNull() & ~F.isnan(w) & (w > 0))
        .withColumn("_pri", pri)
        .orderBy(F.col("_pri").desc(), F.col(f"`{id_col}`"))
        .limit(k)
        .drop("_pri")
    )


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


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    *,
    default_rate: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Per-source Bernoulli sampling — the "data mixture" operator that
    turns raw source proportions into a target training mix (downsample
    the over-represented crawl, keep all of the scarce high-quality
    source). ``rates`` maps a source value to its keep probability;
    sources absent from the map keep ``default_rate``.

    Same determinism contract as ``hash_sample``: selection is keyed on
    md5(salt ':' id), so the mix is reproducible across runs, engines,
    and partitionings, and yesterday's kept rows stay kept when the
    corpus grows.

    Scale: the per-source threshold compiles to a single CASE expression
    — the whole operator is one stateless filter on the scan, zero
    shuffles, zero joins (a rates TABLE would force a broadcast join;
    a literal CASE keeps it inside whole-stage codegen and lets the
    common ``rate = 0`` sources prune via predicate pushdown)."""
    threshold = F.lit(_hex_threshold(default_rate))
    for src, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(source_col) == src, F.lit(_hex_threshold(rate))
        ).otherwise(threshold)
    return df.filter(sample_key(id_col, salt) < threshold)


def temperature_rates(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based mixture rates (the multilingual-training
    standard: sample source s with probability ∝ p_s^α, α<1 flattening
    the head so low-resource sources aren't drowned): per source,
    (source, n_docs, p_raw, p_temp, keep_rate), where keep_rate is the
    largest Bernoulli rate realizing the p_temp mix WITHOUT upsampling
    (the binding source keeps rate 1.0). ``mixture_sample`` takes the
    rates as a dict — collect this |sources|-row relation first:
    ``rates = {r[source_col]: r.keep_rate for r in out.collect()}``.

    Scale: one count aggregation over the corpus; every subsequent step
    is arithmetic on the |sources|-row relation against broadcast
    1-row totals. Determinism: the two float sums aggregate through
    DECIMAL(38,18) so they are partitioning-order-independent, and the
    arithmetic uses one fixed formula — engines agree bit-for-bit
    before the final round(6)."""
    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    tot = counts.agg(F.sum("n_docs").alias("_N"))
    c = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("p_raw", F.col("n_docs") / F.col("_N"))
        .withColumn("_pa", F.pow("p_raw", F.lit(float(alpha))))
    )
    pa_sum = c.agg(
        F.sum(F.col("_pa").cast("decimal(38,18)")).cast("double").alias("_S")
    )
    c2 = c.crossJoin(F.broadcast(pa_sum)).withColumn(
        "p_temp", F.col("_pa") / F.col("_S")
    )
    t_cap = c2.agg(F.min(F.col("n_docs") / F.col("p_temp")).alias("_T"))
    return (
        c2.crossJoin(F.broadcast(t_cap))
        .select(
            source_col,
            "n_docs",
            F.round("p_raw", 6).alias("p_raw"),
            F.round("p_temp", 6).alias("p_temp"),
            F.round(
                F.least(
                    F.col("p_temp") * F.col("_T") / F.col("n_docs"),
                    F.lit(1.0),
                ),
                6,
            ).alias("keep_rate"),
        )
    )


def upsample_by_weight(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    *,
    default_weight: float = 1.0,
    salt: str = "epoch",
) -> DataFrame:
    """Weighted repetition — the other half of data mixing: a source with
    weight 2.3 contributes every row twice plus a deterministic 30%
    Bernoulli sample a third time (so the EXPECTED multiplicity is the
    weight, and the realized set is exactly reproducible). Adds an
    ``epoch`` column (1..n) distinguishing the copies so a downstream
    global shuffle spreads them across the training order.

    Scale: one stateless projection + ``explode(sequence(1, n))`` — the
    row multiplication happens AFTER filters/pruning at the scan, never
    shuffles, and the fractional draw reuses the ``hash_sample`` key
    (md5 of the row id) so the oracle can replay it."""
    n_copies = F.lit(int(default_weight))
    frac_thr = F.lit(_hex_threshold(default_weight - int(default_weight)))
    for src, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"weight must be >= 0, got {w} for {src!r}")
        is_src = F.col(source_col) == src
        n_copies = F.when(is_src, F.lit(int(w))).otherwise(n_copies)
        frac_thr = F.when(
            is_src, F.lit(_hex_threshold(w - int(w)))
        ).otherwise(frac_thr)
    total = n_copies + (sample_key(id_col, salt) < frac_thr).cast("int")
    return (
        df.withColumn("_n", total)
        .filter(F.col("_n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("_n"))))
        .drop("_n")
    )


def shuffle_batches(
    df: DataFrame,
    batch_size: int,
    id_col: str = "doc_id",
    *,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic global shuffle + fixed-size batching: every row gets
    a ``shuffle_key`` (md5 of salt ':' id), a global ``shuffle_pos``
    (0-based rank in key order), and a ``batch_id`` (pos / batch_size) —
    the "shuffle the corpus once per epoch, then read batches in order"
    step of a training run, reproducible on any engine. Change ``salt``
    per epoch for a fresh permutation.

    Scale: ``row_number`` over a global ORDER BY is the obvious shape and
    the classic scale bug — Spark plans an empty-PARTITION BY window as
    ``Exchange SinglePartition`` (the whole corpus through one reducer).
    The rank is computed bucketed instead: the key's first 2 hex chars
    split the corpus into 256 uniform buckets; a per-bucket window ranks
    locally (distributed, one hash shuffle), a 256-row aggregate —
    reusing the SAME bucket partitioning, no extra exchange — yields
    cumulative bucket offsets (the only single-partition window runs
    over those 256 rows), and a broadcast join adds offset + local rank.
    Widen the bucket prefix with the corpus (4 hex chars = 65k buckets at
    100 TB)."""
    d = df.withColumn("shuffle_key", sample_key(id_col, salt)).withColumn(
        "_b", F.substring("shuffle_key", 1, 2)
    )
    wloc = Window.partitionBy("_b").orderBy("shuffle_key", id_col)
    d = d.withColumn("_lrn", F.row_number().over(wloc))
    counts = d.groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
    woff = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_c").over(woff), F.lit(0)).alias("_off")
    )
    return (
        d.join(F.broadcast(offsets), "_b")
        .withColumn("shuffle_pos", F.col("_off") + F.col("_lrn") - 1)
        .withColumn(
            "batch_id", F.floor(F.col("shuffle_pos") / F.lit(batch_size))
        )
        .drop("_b", "_lrn", "_off")
    )


def sliding_token_windows(
    df: DataFrame,
    size: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping per-document token windows — the RAG / long-context
    chunk-prep step (split every document into ``size``-token chunks
    every ``stride`` tokens, overlap = size − stride): one row per
    window, ``(id, window_id, start_pos, n_window_tokens, window_text)``.
    Distinct from :func:`token_chunk_plan`, which packs the WHOLE corpus
    end-to-end into fixed training blocks with no overlap and documents
    spanning blocks; here windows never cross documents and overlap by
    design.

    Coverage rule (deterministic, engine-free): window starts are
    1, 1+stride, 1+2·stride, … up to ``max(n − size + 1, 1)``, plus the
    final start ``max(n − size + 1, 1)`` itself (so the document tail is
    always covered even when ``n − 1`` is not a multiple of stride);
    duplicate starts collapse. Every window therefore has exactly
    ``min(size, n)`` tokens — no ragged tail chunks, the shape
    long-context training wants. Zero-token documents yield no rows.

    Scale shape: a pure projection + explode over one scan — the window
    starts generate per row from a ``sequence()``, the token array binds
    once, and no shuffle exists anywhere in the plan (callers aggregate
    or write as they choose). Window text re-joins with single spaces
    (the tokenizer's whitespace equivalence class)."""
    if size <= 0 or stride <= 0:
        raise ValueError(
            f"sliding_token_windows: size={size} and stride={stride} "
            "must be positive"
        )
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    base = df.select(
        F.col(id_col), toks.alias("_w"), F.size(toks).alias("_n")
    ).filter(F.col("_n") > 0)
    last_start = F.greatest(F.col("_n") - F.lit(size) + 1, F.lit(1))
    starts = F.array_distinct(
        F.concat(
            F.sequence(F.lit(1), last_start, F.lit(stride)),
            F.array(last_start),
        )
    )
    win = base.select(
        id_col,
        "_w",
        F.posexplode(starts).alias("window_id", "start_pos"),
    )
    chunk = F.slice(F.col("_w"), F.col("start_pos"), size)
    return win.select(
        F.col(id_col),
        F.col("window_id").cast("bigint").alias("window_id"),
        F.col("start_pos").cast("bigint").alias("start_pos"),
        F.size(chunk).cast("bigint").alias("n_window_tokens"),
        F.array_join(chunk, " ").alias("window_text"),
    )


def token_chunk_plan(
    df: DataFrame,
    block_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    salt: str = "shuffle",
) -> DataFrame:
    """Concat-and-chunk packing plan — the "shuffle the corpus, lay every
    token end-to-end, cut fixed ``block_size`` training blocks" step of
    an LLM data pipeline, as a PLAN: each document gets its global token
    offset (``chunk_start``), its token count, and the first/last block
    it lands in (documents span blocks; readers slice accordingly).
    Deterministic: order is the hash shuffle of :func:`shuffle_batches`,
    so the same corpus yields byte-identical blocks on any engine.

    Scale: a global token-offset is a global cumulative sum — same
    single-partition-window trap as the global rank, avoided the same
    way: per-bucket window cumsum (distributed, one hash shuffle — the
    256-row bucket-total aggregate reuses that same exchange), cumulative
    bucket offsets over 256 rows, broadcast join back. Documents with
    zero tokens occupy no block and are dropped from the plan."""
    n_tok = F.size(
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
        )
    ).cast("bigint")
    d = (
        df.select(F.col(id_col), n_tok.alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .withColumn("shuffle_key", sample_key(id_col, salt))
        .withColumn("_b", F.substring("shuffle_key", 1, 2))
    )
    wloc = (
        Window.partitionBy("_b")
        .orderBy("shuffle_key", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn(
        "_loff", F.coalesce(F.sum("n_tokens").over(wloc), F.lit(0))
    )
    totals = d.groupBy("_b").agg(F.sum("n_tokens").alias("_c"))
    woff = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_b", F.coalesce(F.sum("_c").over(woff), F.lit(0)).alias("_boff")
    )
    return (
        d.join(F.broadcast(offsets), "_b")
        .withColumn("chunk_start", F.col("_boff") + F.col("_loff"))
        .withColumn(
            "first_chunk", F.floor(F.col("chunk_start") / F.lit(block_size))
        )
        .withColumn(
            "last_chunk",
            F.floor(
                (F.col("chunk_start") + F.col("n_tokens") - 1)
                / F.lit(block_size)
            ),
        )
        .select(
            id_col, "n_tokens", "chunk_start", "first_chunk", "last_chunk"
        )
    )


def chunk_manifest(
    df: DataFrame,
    block_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    salt: str = "shuffle",
) -> DataFrame:
    """Reader-side manifest for :func:`token_chunk_plan`: one row per
    (chunk, document) pair — ``chunk_id``, the document, the 0-based
    token offset INSIDE the document where this chunk's slice starts
    (``slice_start``), and the slice length. A block reader fetches
    chunk k by taking each listed document's ``[slice_start,
    slice_start + slice_len)`` tokens in ``chunk_start`` order; every
    chunk except the last is exactly ``block_size`` tokens.

    Scale: the plan rows explode by ``sequence(first_chunk, last_chunk)``
    — output size is O(total_tokens / block_size + docs), each row a
    handful of ids and offsets; no additional shuffle beyond the plan's
    own cumsum exchange."""
    plan = token_chunk_plan(
        df, block_size, id_col=id_col, text_col=text_col, salt=salt
    )
    return manifest_from_plan(plan, block_size, id_col=id_col)


def manifest_from_plan(
    plan: DataFrame, block_size: int, id_col: str = "doc_id"
) -> DataFrame:
    """The explode-and-slice arithmetic of :func:`chunk_manifest`, split
    out so a MATERIALIZED plan (e.g. the `curate` CLI's written
    ``plan/`` parquet) can emit its manifest without re-running the
    pipeline — and so the slice arithmetic exists exactly once (the CLI
    previously carried a verbatim copy; r11 review finding)."""
    c = F.col("chunk_id")
    slice_start_g = F.greatest(F.col("chunk_start"), c * block_size)
    slice_end_g = F.least(
        F.col("chunk_start") + F.col("n_tokens"), (c + 1) * block_size
    )
    return (
        plan.withColumn(
            "chunk_id",
            F.explode(F.sequence(F.col("first_chunk"), F.col("last_chunk"))),
        )
        .withColumn("slice_start", slice_start_g - F.col("chunk_start"))
        .withColumn("slice_len", slice_end_g - slice_start_g)
        .select(id_col, "chunk_id", "slice_start", "slice_len")
    )


def pack_plan(
    df: DataFrame,
    block_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    salt: str = "pack",
    n_buckets: int = 256,
) -> DataFrame:
    """NO-SPLIT packing plan — the instruction-tuning sibling of
    :func:`token_chunk_plan`: assign whole documents to fixed
    ``block_size``-token training blocks such that no document crosses
    a block boundary (each block is padded, never contaminated by a
    neighbor's attention). Returns one row per nonempty document:
    ``(id, n_tokens, pack_id, overflow)`` where ``pack_id`` is the
    block label ('<bucket>-<idx>') and ``overflow`` marks documents
    LONGER than a block — surfaced, never silently truncated
    (``pack_id`` NULL; the caller decides truncate/split/drop).

    Algorithm: documents hash into ``n_buckets`` deterministic buckets
    (the :func:`sample_key` md5 idiom — engine-replayable), and each
    bucket packs independently by NEXT-FIT-DECREASING: order by
    (n_tokens DESC, id ASC), keep one open block, start a new one when
    the next document doesn't fit. NFD is the strongest packing rule
    that is still a PURE SEQUENTIAL SCAN — exactly replayable as a
    recursive SQL CTE (the oracle), unlike first-fit's open-bin
    search. Waste bound, honestly: each CLOSED block is filled past
    ``block_size − next_doc_tokens``, and descending order makes the
    straggler small; the classic adversarial NFD corpora (alternating
    just-over-half sizes) still approach 2× optimal — callers packing
    pathological length mixes should bucket by length first.

    Scale shape: only ``(id, n_tokens, bucket)`` ever shuffles (never
    text) — ONE exchange into ``n_buckets`` groups; each bucket packs
    in one Arrow ``applyInPandas`` task (vectorized sort + one linear
    scan), so parallelism is the bucket count and the sequential part
    is corpus/n_buckets. Block ids are bucket-qualified, so no
    cross-bucket coordination exists at any scale."""
    import pandas as pd

    if block_size <= 0:
        raise ValueError(f"pack_plan: block_size must be > 0, got {block_size}")
    if not 1 <= n_buckets <= 65536:
        raise ValueError(f"pack_plan: n_buckets out of range: {n_buckets}")
    n_tok = F.size(
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
        )
    ).cast("bigint")
    width = len(format(n_buckets - 1, "x")) if n_buckets > 1 else 1
    d = (
        df.select(F.col(id_col), n_tok.alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "bucket",
            F.substring(sample_key(id_col, salt), 1, width)
            if n_buckets == 16**width
            else F.format_string(
                f"%0{width}x",
                (
                    F.conv(
                        F.substring(sample_key(id_col, salt), 1, 8), 16, 10
                    ).cast("bigint")
                    % n_buckets
                ).cast("int"),
            ),
        )
    )
    over = d.filter(F.col("n_tokens") > block_size).select(
        id_col,
        "n_tokens",
        F.lit(None).cast("string").alias("pack_id"),
        F.lit(True).alias("overflow"),
    )
    fit = d.filter(F.col("n_tokens") <= block_size)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        )
        bins = []
        idx, fill = 0, 0
        first = True
        for n in pdf["n_tokens"]:
            n = int(n)
            if first:
                fill = n
                first = False
            elif fill + n <= block_size:
                fill += n
            else:
                idx += 1
                fill = n
            bins.append(idx)
        out = pdf[[id_col, "n_tokens", "bucket"]].copy()
        out["bin_idx"] = bins
        return out

    id_type = dict(
        (f.name, f.dataType.simpleString()) for f in d.schema.fields
    )[id_col]
    packed = fit.groupBy("bucket").applyInPandas(
        pack,
        schema=f"`{id_col}` {id_type}, n_tokens bigint, bucket string, "
        "bin_idx bigint",
    )
    return packed.select(
        id_col,
        "n_tokens",
        F.concat_ws("-", "bucket", F.col("bin_idx").cast("string")).alias(
            "pack_id"
        ),
        F.lit(False).alias("overflow"),
    ).unionByName(over)
