"""curate_corpus — the end-to-end training-data curation pipeline, as ONE
lazy DataFrame composition:

    quality/language gate → exact dedup → near-dup (MinHash-LSH)
    component drop → benchmark decontamination → per-source cap →
    deterministic sample

Every stage is an operator this package already oracle-checks in
isolation (text.corpus_filter, dedup.exact_dedup_rows,
dedup.near_dup_pairs + dedup_components, contamination.contaminated_ids,
sampling.stratified_cap + hash_sample); this module is the composition a
real pipeline runs nightly, declared lazily so Catalyst sees the WHOLE
plan — the gate's language/quality/length predicates are applied at the
first scan, and every later stage works on the reduced corpus.

Stage order is cost order (each stage shrinks the input of the next):

1. **Gate** — stateless projection+filter, applied on the scan; at real
   corpus ratios this drops the bulk of raw crawl before anything
   shuffles.
2. **Exact dedup** — one shuffle by 128-bit content hash;
   WindowGroupLimit keeps one row per local duplicate set map-side.
3. **Near-dup drop** — MinHash-LSH pairs (banded, candidates only) →
   min-label connected components → drop non-representatives via an
   anti-join. The drop list scales with corpus duplication (unbounded
   on a dup-heavy crawl), so no broadcast hint is forced: AQE picks
   broadcast at runtime when the list is actually small, shuffle
   otherwise.
4. **Decontaminate** — eval shingles broadcast (the EVAL set is the
   bounded side; the corpus is never shuffled by shingle); the
   resulting drop list is anti-joined with the same AQE-decided
   strategy as stage 3.
5. **Cap per source** — WindowGroupLimit top-``cap`` per source by
   quality (then id-hash tiebreak).
6. **Sample** — stateless hash filter, reproducible across runs/engines.

The heavy corpus is shuffled exactly twice unconditionally (content-hash
dedup, per-source cap); the stage-3/4 anti-joins add shuffles only when
AQE measures their drop lists as too large to broadcast — the worst case
on a dup-heavy crawl, where a forced broadcast would be the scale bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from lotad_spark.pipeline.contamination import contaminated_ids
from lotad_spark.pipeline.dedup import (
    dedup_components,
    exact_dedup_rows,
)
from lotad_spark.pipeline.sampling import hash_sample, stratified_cap
from lotad_spark.pipeline.text import lang_pred_expr, quality_expr, tokens


def curate_corpus(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lang: str = "en",
    min_quality: float = 0.5,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    near_threshold: float = 0.6,
    contam_threshold: float = 0.5,
    cap_per_source: int = 1_000,
    sample_rate: float = 1.0,
    salt: str = "curate",
    keep_text: bool = False,
    url_col: str | None = None,
    blocklist_terms: list[str] | tuple[str, ...] | None = None,
    max_per_domain: int | None = None,
) -> DataFrame:
    """Returns the curated corpus as (id, source, quality, n_tokens)
    — plus the text column when ``keep_text`` (for downstream packing).

    ``eval_df`` is the benchmark set to decontaminate against (skipped
    when None). All thresholds mirror the component operators' defaults;
    see the module docstring for the plan shape per stage.

    Optional r12 gates (all default OFF, so the base composition — and
    its oracle row — is unchanged):

    * ``url_col`` — run :func:`~lotad_spark.pipeline.urls.url_dedup`
      FIRST (stage 0): exact dedup on the canonical URL before any text
      is read — the cheapest drop in the pipeline, one shuffle of
      (id, url) only.
    * ``blocklist_terms`` — a C4-style banned-words gate
      (:func:`~lotad_spark.pipeline.text.blocklist_filter`, literal
      strategy) folded into the gate region: blocked ids anti-join out
      before dedup.
    * ``max_per_domain`` (requires ``url_col``) — the RefinedWeb
      anti-monoculture cap
      (:func:`~lotad_spark.pipeline.urls.domain_cap`) after near-dup,
      so the cap counts surviving docs, not raw crawl.
    """
    if max_per_domain is not None and url_col is None:
        raise ValueError("curate_corpus: max_per_domain needs url_col")
    if url_col is not None:
        from lotad_spark.pipeline.urls import url_dedup

        url_drop = (
            url_dedup(docs, id_col, url_col)
            .filter(F.col("is_dup"))
            .select(id_col)
        )
        docs = docs.join(url_drop, id_col, "left_anti")
    t = F.col(text_col)
    gated = docs.select(
        F.col(id_col),
        F.col(source_col),
        t,
        quality_expr(t).alias("quality"),
        lang_pred_expr(t).alias("lang_pred"),
        F.size(tokens(t)).cast("bigint").alias("n_tokens"),
    ).filter(
        (F.col("lang_pred") == lang)
        & (F.col("quality") >= min_quality)
        & F.col("n_tokens").between(min_tokens, max_tokens)
    )

    if blocklist_terms:
        from lotad_spark.pipeline.text import blocklist_filter

        # Scan the GATED subset, not raw docs: the anti-join can only
        # remove gated ids anyway, so the outputs are identical and the
        # blocklist tokenization pass reads the already-reduced corpus.
        blocked = (
            blocklist_filter(
                gated, list(blocklist_terms), id_col, text_col
            )
            .filter(F.col("blocked"))
            .select(id_col)
        )
        gated = gated.join(blocked, id_col, "left_anti")

    deduped = exact_dedup_rows(gated, id_col, text_col)
    # The deduped relation feeds the near-dup pair DAG, the kept side of
    # the stage-3 anti-join, AND (via kept) the contamination source —
    # and dedup_components' convergence loop runs eager actions, so
    # nothing upstream can be shared by plan reuse alone: unpersisted,
    # the regex-heavy gate + content-hash dedup executed 3-4× per call
    # (measured r18, sf0.1: curate 8.2 s → 4.3 s with this persist).
    # One row per surviving doc (no explode), so unlike the shingle
    # relation (see near_dup_pairs) the cache is smaller than its
    # recompute; MEMORY_AND_DISK spills rather than OOMs at scale.
    deduped = deduped.persist(StorageLevel.MEMORY_AND_DISK)

    # Inlined near_dup_pairs with the shingle and signature relations
    # persisted (r18): the pair DAG references shingles five ways
    # (signatures via both sides of the band self-join, the intersection
    # join's two sides, the size lookup) and physical-plan reuse never
    # unifies them (each branch gets different pushed filters/pruning,
    # breaking canonical equality) — measured 5 duplicate
    # scan→tokenize→explode stages per call. Unlike the lazy
    # near_dup_pairs return (where a persist would outlive the caller —
    # see its docstring), dedup_components CONSUMES the pairs eagerly in
    # its convergence loop, so both caches are dropped right after it
    # returns; the checkpointed labels carry no lineage back to them.
    # sigs is O(docs × K) longs, shingles O(total tokens) — both
    # MEMORY_AND_DISK.
    from lotad_spark.pipeline.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard,
        shingles,
    )

    sh = shingles(deduped, id_col, text_col, 3).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs = minhash_signatures(sh, id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cands = lsh_candidate_pairs(sigs, id_col)
    pairs = ngram_jaccard(cands, sh, id_col).filter(
        F.col("jaccard") >= near_threshold
    )
    comps = dedup_components(pairs, id_out=id_col)
    sh.unpersist()
    sigs.unpersist()
    near_drop = comps.filter(F.col(id_col) != F.col("component_id")).select(
        id_col
    )
    # No explicit broadcast hint: the drop list scales with corpus
    # duplication (unbounded on a dup-heavy crawl), so a forced broadcast
    # could blow past Spark's broadcast limit / driver memory. AQE picks
    # broadcast at runtime whenever the list is actually small.
    kept = deduped.join(near_drop, id_col, "left_anti")

    if eval_df is not None:
        bad = contaminated_ids(
            kept, eval_df, threshold=contam_threshold,
            train_id=id_col, eval_id=id_col,
        ).withColumnRenamed("train_id", id_col)
        # Same reasoning as the near-dup drop: contamination volume
        # scales with the corpus, so let AQE decide the join strategy.
        kept = kept.join(bad, id_col, "left_anti")

    if max_per_domain is not None:
        from lotad_spark.pipeline.urls import domain_cap

        # Rank only the SURVIVORS of the earlier stages — capping
        # against raw-crawl counts would punish a domain for docs the
        # pipeline already dropped.
        survivors = docs.join(kept.select(id_col), id_col)
        over_cap = (
            domain_cap(survivors, max_per_domain, id_col, url_col)
            .filter(F.col("capped"))
            .select(id_col)
        )
        kept = kept.join(over_cap, id_col, "left_anti")

    capped = stratified_cap(
        kept, source_col, cap_per_source, id_col,
        priority=F.col("quality"), salt=salt,
    )
    sampled = (
        hash_sample(capped, sample_rate, id_col, salt=salt)
        if sample_rate < 1.0
        else capped
    )
    out_cols = [id_col, source_col, "quality", "n_tokens"]
    if keep_text:
        out_cols.append(text_col)
    return sampled.select(*out_cols)


def plan_training_corpus(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    *,
    mixture_rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    upsample_weights: dict[str, float] | None = None,
    block_size: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    strip_eval_spans: bool = False,
    span_ngram: int = 6,
    packing: str = "chunk",
    packing_buckets: int = 256,
    **curate_kwargs,
) -> DataFrame:
    """The full raw-crawl → training-blocks plan, lazily composed:

        curate_corpus (gate → dedup → decontaminate → cap → sample)
        → mixture_sample (per-source target rates)
        → upsample_by_weight (epoch repetition)
        → token_chunk_plan (deterministic shuffle, concat, fixed blocks)

    ``packing`` picks the final stage: ``"chunk"`` (default — the
    GPT-style concat-and-cut plan above, documents may span blocks) or
    ``"nosplit"`` (:func:`~lotad_spark.pipeline.sampling.pack_plan` —
    whole documents into blocks, next-fit-decreasing per hash bucket;
    the instruction-tuning shape). The nosplit plan returns
    ``(item_id, n_tokens, pack_id, overflow)`` where ``item_id`` is
    ``id '#' epoch`` and over-long items surface as overflow instead of
    being silently truncated; ``packing_buckets`` is pack_plan's
    parallelism/packing-locality knob (more buckets = more parallel,
    slightly looser packing — items only co-pack within a bucket).

    ``strip_eval_spans=True`` additionally EXCISES eval-set passages
    from surviving documents (span-level decontamination —
    pipeline/spandedup.py) before packing: curate's document-level
    check drops documents that substantially CONTAIN an eval item,
    while span stripping removes shorter verbatim overlaps from the
    documents that stay. Off by default (the decontamination contract
    of the oracle-checked default plan is doc-level only).

    Each copy of an upsampled document packs under its own
    ``pack_id`` = ``id '#' epoch``, so repeated epochs land at distinct
    (hash-shuffled) offsets in the training order instead of back-to-back.
    Returns the chunk plan keyed by ``pack_id``; feed it to
    :func:`lotad_spark.pipeline.sampling.chunk_manifest`'s explode shape
    for reader slices.

    Every stage is individually oracle-checked; the composition stays one
    lazy DAG — Catalyst sees the gate predicates at the scan, and the only
    corpus-wide shuffles are curation's two plus the packing cumsum."""
    from lotad_spark.pipeline.sampling import (
        mixture_sample,
        token_chunk_plan,
        upsample_by_weight,
    )

    curated = curate_corpus(
        docs,
        eval_df,
        id_col=id_col,
        text_col=text_col,
        source_col=source_col,
        keep_text=True,
        **curate_kwargs,
    )
    if strip_eval_spans:
        if eval_df is None:
            raise ValueError(
                "plan_training_corpus: strip_eval_spans needs eval_df"
            )
        from pyspark.storagelevel import StorageLevel

        from lotad_spark.pipeline.spandedup import (
            contamination_spans,
            strip_duplicate_spans,
        )

        # The curated relation (incl. the shuffle-heavy near-dup stage)
        # feeds the span detection, the strip rewrite, AND the join back
        # — persist it so the strip branch costs one curation, not three.
        curated = curated.persist(StorageLevel.MEMORY_AND_DISK)
        spans = contamination_spans(
            curated, eval_df, id_col=id_col, text_col=text_col, n=span_ngram
        )
        stripped = strip_duplicate_spans(
            curated, id_col=id_col, text_col=text_col,
            n=span_ngram, spans=spans,
        ).select(id_col, text_col)
        # swap the text column; every other curated column rides along
        curated = (
            curated.drop(text_col)
            .join(stripped, id_col)
        )
    if mixture_rates is not None:
        curated = mixture_sample(
            curated,
            mixture_rates,
            source_col=source_col,
            id_col=id_col,
            default_rate=default_rate,
        )
    repeated = upsample_by_weight(
        curated, upsample_weights or {}, source_col=source_col, id_col=id_col
    )
    if packing not in ("chunk", "nosplit"):
        raise ValueError(
            f"plan_training_corpus: packing must be 'chunk' or "
            f"'nosplit', got {packing!r}"
        )
    if packing == "nosplit":
        from lotad_spark.pipeline.sampling import pack_plan

        items = repeated.withColumn(
            "item_id",
            F.concat(
                F.col(id_col).cast("string"), F.lit("#"), F.col("epoch")
            ),
        )
        return pack_plan(
            items,
            block_size,
            id_col="item_id",
            text_col=text_col,
            n_buckets=packing_buckets,
        )
    packed_ids = repeated.withColumn(
        "pack_id",
        F.concat(
            F.col(id_col).cast("string"), F.lit("#"), F.col("epoch")
        ),
    )
    return token_chunk_plan(
        packed_ids, block_size, id_col="pack_id", text_col=text_col
    )
