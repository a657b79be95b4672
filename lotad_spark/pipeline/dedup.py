"""Deduplication operators: exact, MinHash+LSH near-dup, SimHash.

Scale design (the part that matters at 100 TB):

* **No all-pairs joins anywhere.** Candidate pairs come from LSH band
  buckets (docs agreeing on one band of the MinHash signature); the exact
  n-gram Jaccard verification runs only on those candidates.
* Exact dedup groups by a 128-bit content hash, not the raw text — the
  shuffle key is 32 bytes regardless of document size, and map-side
  partial aggregation collapses local duplicates before the exchange.
* MinHash signatures are ONE explode + ONE groupBy over (doc × shingle):
  the K permutation minima are K aggregate expressions in a single
  aggregation, not K passes.
* Skew: band buckets of boilerplate documents (empty text, common
  headers) can explode the candidate join. AQE skew-join handles moderate
  cases; for pathological corpora cap bucket size with a count filter
  before the self-join (``max_bucket`` parameter).

Hashing is md5 (bit-identical in the DuckDB oracle); at production scale
swap for ``F.xxhash64`` — shapes unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from lotad_spark.pipeline.text import tokens
from lotad_spark.pipeline._share import share_corpus

DEFAULT_PERMS = 8
DEFAULT_BANDS = 4  # 4 bands × 2 rows = 8 perms


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One surviving ``id_col`` per distinct text content (minimum id wins —
    deterministic). Returns (content_hash, doc_id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col))
    )


def exact_dedup_rows(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Full-row exact dedup: keeps the minimum-id ROW per distinct text
    (all columns survive, unlike :func:`exact_dedup` which returns only
    the id map). ``row_number() = 1`` over a content-hash window — Spark
    ≥ 3.5 plans the rank filter as WindowGroupLimit, so each map task
    keeps one row per local content-hash before the exchange: the
    shuffle carries near-deduped data, and there is NO join back to
    re-attach the surviving rows."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    *,
    distinct: bool = True,
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    ``distinct=False`` skips the dedup exchange and yields the raw
    (duplicate-bearing, doc-contiguous) shingle stream — correct for any
    consumer invariant under duplicates. MinHash signatures are the
    canonical case: ``min((a·h+b) mod M)`` over a multiset equals the
    min over its set. Catalyst's RemoveRedundantAggregates already
    elides the distinct below the pure-SQL min tower (verified in
    plans/r19/minhash_sigs_before.txt — ONE exchange either way), but it
    cannot see through the opaque Arrow pre-reduction stage used at
    production K, and the raw stream's doc-contiguity is also what
    keeps that stage's partial count at ~one row per doc. Jaccard/size
    consumers need set semantics; they keep the default."""
    # Bind the token array ONCE per row (`transform(array(x), tk -> …)[0]`):
    # referencing the tokenizer expression inside the per-gram lambda would
    # re-split the full text for every gram — O(tokens × length) per doc,
    # since interpreted higher-order functions do no subexpression reuse.
    # sequence(0, -k) would flip to a descending range — guard short docs.
    # r18: bind the token array in a PROJECT below the explode instead of
    # the transform(array(x))[0] wrapper — one less interpreted HOF layer
    # per row (HOFs never codegen), measured −15% on the explode stage
    # with bit-identical output (count + bit_xor(xxhash64) checked).
    tk = F.col("_tk")
    grams = F.when(F.size(tk) >= n, F.transform(
        F.sequence(F.lit(0), F.size(tk) - n),
        lambda i: F.array_join(F.slice(tk, i + 1, n), " "),
    )).otherwise(F.array().cast("array<string>"))
    out = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_tk")
    ).select(F.col(id_col), F.explode(grams).alias("shingle"))
    return out.distinct() if distinct else out


MERSENNE31 = 2_147_483_647  # 2^31 − 1, the universal-hash modulus


def perm_coeffs(num_perms: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) coefficient pairs for the K universal-hash
    permutations. a < 2^30 keeps a·h + b below 2^62 for a 32-bit base
    hash — no signed-64 overflow in EITHER engine (Java longs would wrap
    silently; DuckDB would error), so the arithmetic is bit-identical
    across the Spark side and the SQL oracle."""
    return [
        (
            (1_103_515_245 * i + 12_345) % ((1 << 30) - 1) + 1,
            (69_069 * i + 1_234_567) % MERSENNE31,
        )
        for i in range(num_perms)
    ]


# At or above this K, minhash_signatures pre-reduces the permutation
# minima in ONE vectorized Arrow stage before the grouping aggregate.
# Measured at sf0.1 (260k shingle rows, K=128): the K-expression
# aggregate tower costs ~1.05 s of pure per-row agg-buffer updates (the
# modulo is free — min(a·h+b) with and without % M timed 1.57 vs
# 1.55 s), while one numpy (rows × K) matrix + run-boundary
# minimum.reduceat does the same reduction at memory speed. Below this
# K the tower is already cheap and the oracle-checked K=8 row keeps its
# pinned zero-Python plan.
MINHASH_ARROW_MIN_PERMS = 32


def _minhash_partial_sigs_arrow(
    hashed: DataFrame, id_col: str, num_perms: int
) -> DataFrame:
    """Per-batch partial MinHash minima via ``mapInArrow``: one
    (rows × K) universal-hash matrix + ``minimum.reduceat`` over
    id-run boundaries per Arrow batch, emitting one partial row per id
    RUN (the shingle stream is doc-contiguous out of the explode, so
    runs ≈ docs; the reduction is correct for ANY row order — a doc
    split across runs or batches just yields more partials for the
    final SQL min to fold). Arithmetic is bit-identical to the SQL
    tower: a·h + b < 2^62 fits int64 exactly and numpy's ``%`` matches
    SQL ``%`` on non-negatives. Rows with NULL id or hash take a
    per-row pass-through partial (sig_i NULL when h is NULL) — the
    final SQL min-aggregate then applies exactly SQL's null semantics,
    so the two paths cannot diverge on nulls either."""
    import pyarrow as pa

    coeffs = perm_coeffs(num_perms)
    a_list = [a for a, _ in coeffs]
    b_list = [b for _, b in coeffs]
    sig_names = [f"sig_{i}" for i in range(num_perms)]
    id_type = hashed.schema[id_col].dataType.simpleString()
    out_schema = ", ".join(
        [f"`{id_col}` {id_type}"] + [f"{s} bigint" for s in sig_names]
    )

    def kernel(batches):
        import numpy as np

        A = np.asarray(a_list, dtype=np.int64)
        B = np.asarray(b_list, dtype=np.int64)
        for b in batches:
            if b.num_rows == 0:
                continue
            ids_col, h_col = b.column(0), b.column(1)
            if ids_col.null_count == 0 and h_col.null_count == 0:
                ids = ids_col.to_numpy(zero_copy_only=False)
                h = h_col.to_numpy(zero_copy_only=False).astype(
                    np.int64, copy=False
                )
                starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
                if len(starts) > b.num_rows // 4:
                    # scattered input (e.g. a stored hash-partitioned
                    # shingle relation): group within the batch so the
                    # partial count stays ≈ distinct ids, not ≈ rows
                    order = np.argsort(ids, kind="stable")
                    ids, h = ids[order], h[order]
                    starts = np.flatnonzero(
                        np.r_[True, ids[1:] != ids[:-1]]
                    )
                v = (h[:, None] * A[None, :] + B[None, :]) % MERSENNE31
                sig = np.minimum.reduceat(v, starts, axis=0)
                arrays = [pa.array(ids[starts])] + [
                    pa.array(sig[:, i]) for i in range(len(a_list))
                ]
            else:
                # null-bearing batch: per-row partials with SQL-shaped
                # nulls (min ignores them downstream)
                h = h_col.to_numpy(zero_copy_only=False)  # float + NaN
                mask = np.isnan(h) if h.dtype.kind == "f" else np.zeros(
                    len(h), dtype=bool
                )
                hi = np.where(mask, 0, h).astype(np.int64)
                v = (hi[:, None] * A[None, :] + B[None, :]) % MERSENNE31
                arrays = [ids_col] + [
                    pa.array(
                        np.ma.masked_array(v[:, i], mask=mask),
                        type=pa.int64(),
                    )
                    for i in range(len(a_list))
                ]
            yield pa.RecordBatch.from_arrays(
                arrays, [id_col] + sig_names
            )

    return hashed.mapInArrow(kernel, out_schema)


def minhash_signatures(
    shingle_df: DataFrame,
    id_col: str = "doc_id",
    num_perms: int = DEFAULT_PERMS,
) -> DataFrame:
    """K-permutation MinHash signature per document, one groupBy:
    (id, sig_0 … sig_{K-1}).

    ONE md5 per shingle, not K: the shingle is hashed once to a 32-bit
    base (first 8 md5 hex chars), and the K permutations are cheap
    universal hashes (a_i·h + b_i) mod (2^31−1) evaluated inside the
    aggregate — at production K (128) this removes ~K× of the hash CPU,
    which is the dominant cost of MinHash at corpus scale. The base hash
    is computed in the pre-aggregation projection so codegen evaluates
    it exactly once per shingle row.

    At K ≥ ``MINHASH_ARROW_MIN_PERMS`` the K minima are pre-reduced in
    one vectorized Arrow stage (guide §4.2: hand whole batches to
    native code) and the grouping aggregate folds ~one partial row per
    doc per batch-run instead of every shingle row — identical values
    (bit-exact int64 arithmetic, SQL null semantics preserved; pinned
    in tests/test_dedup.py)."""
    hashed = shingle_df.select(
        F.col(id_col),
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10)
        .cast("long")
        .alias("_h"),
    )
    # SQL-text permutations (r18): the K py4j Column towers (~9 round
    # trips each, ~4.6 ms/trip on the bench box) made CONSTRUCTING the
    # aggregation the dominant cost at production K (128: ~5 s before a
    # single task ran). Each permutation is now one parsed expression;
    # integer literals embed exactly, so the evaluated op sequence
    # (int·long promotion, + int, % int over long) is unchanged.
    if num_perms >= MINHASH_ARROW_MIN_PERMS:
        hashed = _minhash_partial_sigs_arrow(hashed, id_col, num_perms)
        aggs = [
            F.expr(f"min(sig_{i}) AS sig_{i}") for i in range(num_perms)
        ]
        return hashed.groupBy(id_col).agg(*aggs)
    aggs = [
        F.expr(f"min(({a} * `_h` + {b}) % {MERSENNE31}) AS sig_{i}")
        for i, (a, b) in enumerate(perm_coeffs(num_perms))
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def band_stack(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    num_perms: int = DEFAULT_PERMS,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """(id, band_i, bh): the stacked LSH band relation of a signature
    frame — md5 over '|'-joined row signatures per band, exploded one
    row per band. The single banding implementation shared by batch
    pair generation, index build, and index probe (identical band
    hashes are what make the stored index probeable at all).

    SQL-text banding (r18): the per-band concat/struct towers are one
    parsed expression each (md5/concat_ws/named_struct are the same
    functions the Column builders resolved to; values unchanged — the
    py4j tower construction cost was the only difference)."""
    rows = num_perms // bands
    band_cols = [
        F.expr(
            "md5(concat_ws('|', "
            + ", ".join(f"sig_{b * rows + r}" for r in range(rows))
            + f")) AS band_{b}"
        )
        for b in range(bands)
    ]
    banded = sig_df.select(F.col(id_col), *band_cols)
    return banded.select(
        F.col(id_col),
        F.expr(
            "explode(array("
            + ", ".join(
                f"named_struct('band_i', {b}, 'bh', band_{b})"
                for b in range(bands)
            )
            + "))"
        ).alias("band"),
    ).select(id_col, "band.band_i", "band.bh")


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    num_perms: int = DEFAULT_PERMS,
    bands: int = DEFAULT_BANDS,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) sharing at least one LSH band.

    Shuffle key is (band_index, band_hash); the self-join happens inside
    each bucket only. ``max_bucket`` drops degenerate buckets (boilerplate
    skew guard).
    """
    stacked = band_stack(sig_df, id_col, num_perms, bands)
    if max_bucket is not None:
        from pyspark.sql import Window

        counts = stacked.groupBy("band_i", "bh").agg(F.count(F.lit(1)).alias("_n"))
        stacked = (
            stacked.join(counts, ["band_i", "bh"])
            .filter(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    a = stacked.select(
        F.col(id_col).alias("id_a"), F.col("band_i"), F.col("bh")
    )
    b = stacked.select(
        F.col(id_col).alias("id_b"), F.col("band_i"), F.col("bh")
    )
    return (
        a.join(b, ["band_i", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard(
    pairs: DataFrame, shingle_df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Exact Jaccard similarity over shingle sets for given (id_a, id_b)
    pairs: |A ∩ B| / (|A| + |B| − |A ∩ B|). Joins only candidate pairs —
    never all-pairs."""
    sizes = shingle_df.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sa = shingle_df.select(F.col(id_col).alias("id_a"), "shingle")
    sb = shingle_df.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )


def near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    num_perms: int = DEFAULT_PERMS,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.7,
    max_bucket: int | None = None,
    persist_shingles: bool = False,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with exact-Jaccard verification:
    (id_a, id_b, jaccard), jaccard ≥ threshold.

    The shingle relation feeds FIVE branches of the DAG (signatures, both
    sides of the intersection join, both size lookups). Re-computing it
    per branch is pure-expression work over the text scan; persisting it
    trades that CPU for cache serialization of the exploded (doc ×
    shingle) relation — measured at sf0.1 (5.2k docs) the persist LOSES:
    2.0–2.2 s unpersisted vs 2.7 s warm / 8.0 s cold persisted, so the
    default is OFF. The cache also outlives the call (Spark has no
    scoped unpersist on a derived plan), so repeated calls with
    ``persist_shingles=True`` accumulate pinned storage — reserve it for
    interactive sessions that reuse ONE corpus. At 100 TB neither shape
    is right: materialize shingles once to a bucketed table partitioned
    by ``id_col`` and feed all branches from that."""
    sh = shingles(df, id_col, text_col, n)
    if persist_shingles:
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
        # the persisted (distinct) relation is already materialized —
        # reading it back beats re-deriving the raw stream
        sig_src = sh
    else:
        # the signature branch takes the raw doc-contiguous stream (see
        # shingles(distinct=False)) so the Arrow pre-reduction at
        # production K sees one run per doc and no distinct exchange
        sig_src = shingles(df, id_col, text_col, n, distinct=False)
    sigs = minhash_signatures(sig_src, id_col, num_perms)
    cands = lsh_candidate_pairs(sigs, id_col, num_perms, bands, max_bucket)
    jac = ngram_jaccard(cands, sh, id_col)
    return jac.filter(F.col("jaccard") >= threshold)


# Above this many near-dup pairs, dedup_components keeps the iterative
# distributed loop (the dup-heavy-crawl shape: edge lists can be a large
# fraction of the corpus). At or below it the edge list is a
# driver-bounded relation — a few MB — and a local union-find computes
# the identical min-id components with zero scheduled rounds.
LOCAL_EDGES_MAX = 100_000


def dedup_components(
    pairs: DataFrame,
    *,
    max_iter: int = 20,
    id_out: str = "doc_id",
) -> DataFrame:
    """Connected components over a near-dup pair graph:
    (doc_id, component_id) where component_id is the MINIMUM doc id
    transitively reachable — the step that turns pairwise matches into an
    actionable keep/drop list (keep ``doc_id == component_id``, drop the
    rest). Input is any (id_a, id_b) frame (MinHash, SimHash, or
    embedding-LSH pairs).

    Iterative min-label propagation, the standard Spark shape for CC
    (GraphFrames' Pregel loop is the same): each round every vertex takes
    the min of its own label and its neighbors' labels — one join + one
    groupBy per round, converging in O(component diameter) rounds.
    Near-dup clusters are clique-like (diameter 1-2), so 2-4 propagation
    steps in practice; ``max_iter`` bounds pathological chains. ONE
    propagation per scheduled round, with the previous label carried
    through the plan as ``_old`` so the convergence count needs no
    second join and no recompute (a round-6 experiment fusing two
    propagation steps per job to halve the action count measured
    consistently SLOWER — driver +24%, quiet-box A/B 3.2 s vs 2.3 s at
    sf0.1 — because the second step's plan referenced the un-persisted
    first step twice and the deeper per-job plan cost more than the
    saved action). Labels are ``localCheckpoint``-ed each round: without
    truncation the iterative lineage re-executes from scratch on every
    convergence check (O(rounds²) work) and eventually overflows the
    planner; the checkpoint is LAZY and the convergence count is the
    action that materializes it. The symmetrized edge relation is
    persisted REPARTITIONED by ``src``: the cached layout carries
    hashpartitioning, so when the label side outgrows AQE's broadcast
    threshold (the 100 TB case) every per-round join reuses the cached
    edge partitioning and shuffles only the labels. Only vertices
    appearing in ``pairs`` are labeled — join the corpus back for
    singleton docs (they are their own component by definition).

    Scale-adaptive (r18): a LIMIT probe first collects up to
    ``LOCAL_EDGES_MAX + 1`` pairs; when the edge list is driver-bounded
    (the common case — near-dup pair lists are small relative to the
    corpus) the components come from a local union-find with
    min-id representatives — identical output to min-label propagation
    (both compute min reachable id per vertex) for ONE evaluation of
    the pair DAG and zero scheduled rounds, instead of 2-4 rounds of
    join+agg+checkpoint jobs. Above the bound the distributed loop runs
    unchanged (the 100 TB dup-heavy-crawl shape); the probe cost is one
    incrementally-executed CollectLimit over the pair plan."""
    id_type = {f.name: f.dataType for f in pairs.schema.fields}["id_a"]
    head = pairs.select("id_a", "id_b").limit(LOCAL_EDGES_MAX + 1).collect()
    if len(head) <= LOCAL_EDGES_MAX:
        from lotad_spark.sources.memory import bounded_local_df
        from pyspark.sql import types as T

        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in head:
            a, b = r[0], r[1]
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        # min id per root, then one row per vertex — exactly the
        # distributed fixed point (component_id = min reachable id).
        mins: dict = {}
        for v in parent:
            r = find(v)
            if r not in mins or v < mins[r]:
                mins[r] = v
        return bounded_local_df(
            pairs.sparkSession,
            [(v, mins[find(v)]) for v in parent],
            T.StructType(
                [
                    T.StructField(id_out, id_type),
                    T.StructField("component_id", id_type),
                ]
            ),
        )

    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def propagate(lbl: DataFrame) -> DataFrame:
        nbr_min = (
            edges.join(lbl, edges["src"] == lbl["id"])
            .select(F.col("dst").alias("id"), "label")
            .groupBy("id")
            .agg(F.min("label").alias("_nbr"))
        )
        # Carry the incoming label as _old: the convergence count below
        # reads it from the SAME materialized plan — no second join
        # against the previous labels, no recompute.
        return lbl.join(nbr_min, "id", "left").select(
            "id",
            F.least(F.col("label"), F.coalesce("_nbr", "label")).alias("label"),
            F.col("label").alias("_old"),
        )

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    try:
        for _ in range(max_iter):
            prop = propagate(labels).localCheckpoint(eager=False)
            # The single action of the round: it triggers the lazy
            # checkpoint (truncating lineage) AND counts changes. Labels
            # only ever decrease, so label < _old iff this round moved;
            # zero means the input was already a fixed point.
            changed = prop.filter(F.col("label") < F.col("_old")).count()
            labels = prop.select("id", "label")
            if changed == 0:
                break
    finally:
        edges.unpersist()
    return labels.select(
        F.col("id").alias(id_out), F.col("label").alias("component_id")
    )


def canonical_docs(
    components: DataFrame,
    scores: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Pick each duplicate cluster's canonical survivor BY MERIT:
    (component_id, keep_id, <score_col>) — the highest-``score_col``
    member wins (ties break to the smallest id, so selection is
    deterministic). ``dedup_components`` keeps the minimum id, which is
    arbitrary; production pipelines keep the longest / highest-quality
    copy and drop the rest.

    ``components`` is the (id, component_id) relation from
    ``dedup_components``; ``scores`` any (id, score) relation (e.g.
    ``quality_score`` output). The join is INNER: a member absent from
    ``scores`` cannot win (and a component with no scored member emits
    no row) — score every candidate, or left-join a default first.
    One equi-join on id plus one per-component rank window —
    WindowGroupLimit pushes the keep-1 filter into the sort, so
    per-component state is one row, and singleton components pass
    through (their only member is canonical)."""
    w = Window.partitionBy("component_id").orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    return (
        components.join(scores.select(id_col, score_col), id_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "component_id",
            F.col(id_col).alias("keep_id"),
            F.col(score_col),
        )
    )


def simhash32(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """32-bit SimHash over term frequencies: bit b is set when the
    count-weighted sum of (±1 per token whose md5-derived 32-bit hash has
    bit b set) is positive. Near-duplicates differ in few bits (compare
    with hamming distance downstream).

    Packed-aggregate shape: the 32 per-bit sums are 32 parallel aggregate
    expressions in ONE groupBy over (doc × token) — no ×32 row explode,
    so the aggregation input is bounded by the token count."""
    tok = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "tok_hash",
            F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long"),
        )
    )
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(F.col("tok_hash"), b).bitwiseAND(F.lit(1)) == 1,
                F.col("cnt"),
            ).otherwise(-F.col("cnt"))
        ).alias(f"s_{b}")
        for b in range(32)
    ]
    packed = sum(
        (
            F.when(F.col(f"s_{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            for b in range(32)
        ),
        F.lit(0).cast("long"),
    )
    return (
        tok.groupBy(id_col)
        .agg(*bit_sums)
        .select(F.col(id_col), packed.cast("bigint").alias("simhash"))
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-duplicate PAIRING: (id_a, id_b, hamming) for pairs
    within ``max_hamming`` bits, via multi-probe banding — the downstream
    operator `simhash32` fingerprints exist for.

    The 32-bit fingerprint splits into ``bands`` equal slices; candidates
    share at least one (slice_index, slice_value). Pigeonhole: a pair
    differing in ≤ bands−1 bits cannot touch every slice, so for
    ``max_hamming ≤ bands−1`` (the default: 3 ≤ 3) recall is EXACT, not
    approximate. Verification is exact ``bit_count(a XOR b)`` on the
    candidate pairs only — never all-pairs; the join runs inside slice
    buckets, the same scale shape as the MinHash LSH path. Raising
    ``max_hamming`` past bands−1 trades recall for candidate volume —
    raise ``bands`` with it (and widen the fingerprint) instead."""
    if 32 % bands:
        raise ValueError(f"bands must divide 32, got {bands}")
    # The fingerprint relation feeds BOTH sides of the band self-join;
    # unshared, the whole token aggregation (two exchanges over the
    # doc × token relation) runs twice — and unlike the shingle relation
    # in near_dup_pairs (where recompute measurably beats persisting the
    # exploded rows), the materialized form here is 16 bytes/doc, so
    # sharing it once (share_corpus; SCALING.md storage policy) is
    # strictly cheaper at every scale.
    fp = share_corpus(simhash32(df, id_col, text_col))
    width = 32 // bands
    mask = (1 << width) - 1
    slices = F.array(*[
        F.struct(
            F.lit(b).alias("band_i"),
            F.shiftright(F.col("simhash"), b * width)
            .bitwiseAND(F.lit(mask))
            .alias("bv"),
        )
        for b in range(bands)
    ])
    stacked = fp.select(
        F.col(id_col), F.col("simhash"), F.explode(slices).alias("s")
    ).select(id_col, "simhash", "s.band_i", "s.bv")
    a = stacked.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("_ha"), "band_i", "bv"
    )
    b = stacked.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("_hb"), "band_i", "bv"
    )
    return (
        a.join(b, ["band_i", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        # fingerprints ride along (8 B each) — the distinct shuffle stays
        # ids+fingerprints wide, and no join back to re-attach them.
        .select("id_a", "id_b", "_ha", "_hb")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def write_dedup_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    num_perms: int = DEFAULT_PERMS,
    bands: int = DEFAULT_BANDS,
) -> None:
    """Materialize the incremental near-dup index of a corpus: the LSH
    band rows (``bands/``: band_i, bh, doc_id) plus the per-document
    shingle-hash relation and sizes (``shingles/``: doc_id, sh64;
    ``sizes/``: doc_id, sz) — everything batch dedup derives from the
    text, stored so nightly ingestion never re-reads or re-shingles the
    corpus. Band files partition by ``band_i`` (probes prune to the
    bands they carry); shingle hashes are 64-bit md5 prefixes, so the
    stored relation is ids + fixed-width hashes, never text."""
    from pyspark.storagelevel import StorageLevel

    # The build is three writes off one shingle relation (bands via the
    # signatures, the hash store, the sizes): unpersisted, each write
    # re-ran scan→tokenize→explode→distinct (measured 3× at sf0.1 —
    # r18). The build is eager (all writes happen inside this call), so
    # the caches are dropped before returning.
    sh = shingles(docs, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs = minhash_signatures(sh, id_col, num_perms)
    stacked = band_stack(sigs, id_col, num_perms, bands)
    stacked.write.mode("overwrite").partitionBy("band_i").parquet(
        f"{path}/bands"
    )
    hashed = sh.select(
        F.col(id_col), F.substring(F.md5(F.col("shingle")), 1, 16).alias("sh64")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    hashed.write.mode("overwrite").parquet(f"{path}/shingles")
    hashed.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz")).write.mode(
        "overwrite"
    ).parquet(f"{path}/sizes")
    sh.unpersist()
    hashed.unpersist()
    # Record the build parameters: probing with different shingle/
    # signature parameters never matches the stored bands, so a
    # mismatch must fail loudly, not return an empty result.
    from lotad_spark.storeparams import write_params

    write_params(
        docs.sparkSession,
        f"{path}/params",
        "n int, num_perms int, bands int",
        (int(n), int(num_perms), int(bands)),
    )


def near_dup_against_index(
    new_docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    num_perms: int = DEFAULT_PERMS,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs between an incoming batch and an indexed
    corpus: (new_id, corpus_id, jaccard ≥ threshold) — the ingestion-time
    half of dedup. The batch is shingled/banded fresh (it's the small
    side); candidates come from a band-bucket join against the stored
    band rows, and exact Jaccard verifies against the stored shingle
    hashes — the corpus text is never touched. Raises when the
    parameters differ from those recorded at index-build time (indexes
    written before parameter recording probe as before)."""
    from lotad_spark.storeparams import read_params

    spark = new_docs.sparkSession
    # None only for the pre-params index layout (absent path); corrupt
    # params propagate rather than silently skipping the guard.
    stored = read_params(spark, f"{index_path}/params")
    if stored is not None and (
        (stored.n, stored.num_perms, stored.bands) != (n, num_perms, bands)
    ):
        raise ValueError(
            f"dedup index at {index_path} was built with n={stored.n}, "
            f"num_perms={stored.num_perms}, bands={stored.bands}; probing "
            f"with n={n}, num_perms={num_perms}, bands={bands} would "
            "silently match nothing"
        )
    sh_new = shingles(new_docs, id_col, text_col, n)
    # signature branch off the raw stream (min is duplicate-invariant;
    # see shingles(distinct=False)) — sh_new keeps set semantics for
    # the exact intersection and sizes below
    sigs = minhash_signatures(
        shingles(new_docs, id_col, text_col, n, distinct=False),
        id_col,
        num_perms,
    )
    new_bands = band_stack(sigs, id_col, num_perms, bands).withColumnRenamed(
        id_col, "new_id"
    )
    idx_bands = spark.read.parquet(f"{index_path}/bands").select(
        F.col("band_i"), F.col("bh"), F.col(id_col).alias("corpus_id")
    )
    cands = (
        new_bands.join(idx_bands, ["band_i", "bh"])
        .select("new_id", "corpus_id")
        .distinct()
    )
    new_hashed = sh_new.select(
        F.col(id_col).alias("new_id"),
        F.substring(F.md5(F.col("shingle")), 1, 16).alias("sh64"),
    )
    idx_hashed = spark.read.parquet(f"{index_path}/shingles").select(
        F.col(id_col).alias("corpus_id"), "sh64"
    )
    inter = (
        cands.join(new_hashed, "new_id")
        .join(idx_hashed, ["corpus_id", "sh64"])
        .groupBy("new_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    new_sizes = new_hashed.groupBy("new_id").agg(F.count(F.lit(1)).alias("sz_new"))
    idx_sizes = spark.read.parquet(f"{index_path}/sizes").select(
        F.col(id_col).alias("corpus_id"), F.col("sz").alias("sz_corpus")
    )
    return (
        inter.join(new_sizes, "new_id")
        .join(idx_sizes, "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            (
                F.col("n_inter").cast("double")
                / (
                    F.col("sz_new") + F.col("sz_corpus") - F.col("n_inter")
                ).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def edit_distance_pairs(
    df: DataFrame,
    k: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs within Levenshtein distance ≤ ``k`` — EXACT, never
    all-pairs: the PassJoin segment filter (Li, Deng & Feng 2011,
    "PASS-JOIN: a partition-based method for similarity joins", VLDB —
    public) generates candidates, JVM ``levenshtein`` verifies.
    Returns ``(id_a, id_b, distance)`` with ``id_a < id_b``.

    Candidate rule (both directions of every pair satisfy it): split
    each string of length l ≥ k+1 into k+1 contiguous segments (even
    split — first l%(k+1) segments one char longer). k edits can fall
    inside at most k segments, so for any pair within distance k at
    least one segment of each side appears in the OTHER side as an
    exact substring, shifted by at most k (the shift is bounded by the
    insert/delete balance before it, ≤ total edits). The join is
    therefore an EQUI-join on (segment length, xxhash64(segment))
    against the probe side's ALIGNED substrings — for each of the
    (2k+1) partner lengths, each of the k+1 segment slots, each of the
    (2k+1) shifts, one substring: O(k³) probes per document, not one
    per position — with the |shift| ≤ k and |len diff| ≤ k residuals
    cutting the verify volume. Strings SHORTER than k+1
    chars can't be segmented — they go through a broadcast
    length-window arm (degenerate and tiny in real corpora; it is
    still exact).

    Scale shape: the candidate exchange carries (xxhash64(segment),
    id, length, position) rows ONLY — constant-width keys. The
    substrings are cut AND hashed map-side, and the text columns are
    dropped before the join, so a document of length L contributes
    O(L) fixed-size rows to the shuffle — never the O(L²) bytes that
    either full-text rows or raw long segments (each ~L/(k+1) chars)
    would move. Hashing the segment keeps the join EXACT: equal
    segments always meet (same hash), and a collision can only ADD a
    candidate, which the levenshtein verify kills. Candidate pairs
    dedup on (id_a, id_b) while still id-only; the two texts then
    re-join by id (each text crosses the verify exchange once per
    surviving candidate pair, bounded by the true near-pair density
    plus the PassJoin false-positive rate) and JVM ``levenshtein``
    verifies in the same stage. Honest worst case: a
    low-entropy corpus (everyone shares 'http://www.') makes hot
    segment keys and candidate volume degenerates toward the true
    near-pair density ceiling; raise segmentation entropy by joining
    on (segment, length bucket) — already done — or pre-strip shared
    boilerplate (normalize_text / strip_duplicate_lines upstream).
    Distances are CODEPOINT Levenshtein (Spark's semantics); byte-wise
    engines (DuckDB's levenshtein) agree on ASCII only — the oracle
    corpus is ASCII by construction.
    """
    if k < 1:
        raise ValueError(f"edit_distance_pairs: k must be >= 1, got {k}")
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(text_col).cast("string").alias("_s"),
        )
        .filter(F.col("_s").isNotNull())
        .withColumn("_l", F.length("_s"))
    )
    long_side = base.filter(F.col("_l") >= k + 1)
    # index side: the k+1 even-split segments with their 0-based starts
    i = F.col("_i")
    q = (F.col("l_s") / (k + 1)).cast("int")
    r = F.col("l_s") % (k + 1)
    seg_start = i * q + F.least(i, r)
    seg_len = q + F.when(i < r, 1).otherwise(0)
    segs = long_side.select(
        F.col("_id").alias("id_s"),
        F.col("_s").alias("s"),
        F.col("_l").alias("l_s"),
        F.explode(F.sequence(F.lit(0), F.lit(k))).alias("_i"),
    ).select(
        # text dropped and segment HASHED here, map-side: only
        # fixed-width (hash, id, length, position) rows cross the
        # candidate exchange
        "id_s",
        "l_s",
        seg_start.alias("p_s"),
        F.xxhash64(
            F.substring(F.col("s"), seg_start + 1, seg_len)
        ).alias("_sh"),
        seg_len.alias("_q"),
    )
    # probe side — ALIGNED substrings only (PassJoin's substring
    # selection): a ±k partner's i-th segment has a known canonical
    # start p(i, l_s) and the match shift is bounded by ±k, so instead
    # of all O(L) substrings per doc it suffices to probe
    # (2k+1) partner lengths × (k+1) segments × (2k+1) shifts — O(k³)
    # rows per doc (75 at k=2) regardless of document length.
    # Long-short pairs are the shorts arm's job, so partner lengths
    # clamp to the segmentable range.
    ls = F.col("_ls")
    qp = (ls / (k + 1)).cast("int")
    rp = ls % (k + 1)
    probe_q = qp + F.when(F.col("_i") < rp, 1).otherwise(0)
    probe_p = F.col("_i") * qp + F.least(F.col("_i"), rp)
    probes = (
        base.filter(F.col("_l") >= k + 1)
        .select(
            F.col("_id").alias("id_t"),
            F.col("_s").alias("t"),
            F.col("_l").alias("l_t"),
            F.explode(
                F.sequence(
                    F.greatest(F.col("_l") - k, F.lit(k + 1)),
                    F.col("_l") + k,
                )
            ).alias("_ls"),
        )
        .select(
            "id_t",
            "t",
            "l_t",
            "_ls",
            F.explode(F.sequence(F.lit(0), F.lit(k))).alias("_i"),
        )
        .select(
            "id_t",
            "t",
            "l_t",
            probe_q.alias("_q"),
            F.explode(
                F.sequence(probe_p - k, probe_p + k)
            ).alias("p_t"),
        )
        .filter(
            (F.col("p_t") >= 0)
            & (F.col("p_t") + F.col("_q") <= F.col("l_t"))
        )
        .select(
            # text dropped and substring hashed HERE, map-side — same
            # contract as segs; duplicate (p_t, _q) rows from different
            # (_ls, _i) enumerations cost duplicate candidates only,
            # which the id-pair distinct collapses
            "id_t",
            "l_t",
            "_q",
            "p_t",
            F.xxhash64(
                F.substring(F.col("t"), F.col("p_t") + 1, F.col("_q"))
            ).alias("_sh"),
        )
    )
    cand = (
        segs.join(probes, ["_q", "_sh"])
        .filter(
            (F.col("id_s") != F.col("id_t"))
            & (F.abs(F.col("l_s") - F.col("l_t")) <= k)
            & (F.abs(F.col("p_s") - F.col("p_t")) <= k)
        )
        .select(
            F.least("id_s", "id_t").alias("id_a"),
            F.greatest("id_s", "id_t").alias("id_b"),
        )
        .distinct()
    )
    with_text = cand.join(
        base.select(F.col("_id").alias("id_a"), F.col("_s").alias("s")),
        "id_a",
    ).join(
        base.select(F.col("_id").alias("id_b"), F.col("_s").alias("t")),
        "id_b",
    )
    # Bounded verify: levenshtein(s, t, threshold=k) banded-DP caps each
    # evaluation at O(k * min(|s|,|t|)) and returns -1 past the band.
    # Catalyst pushes the <= k predicate back through the projection and
    # evaluates the expression in both Filter and Project (no CSE across
    # that boundary — verified on the optimized plan), so the win comes
    # from bounding the per-evaluation cost, not from evaluation count.
    verified = (
        with_text.withColumn(
            "distance", F.levenshtein("s", "t", k).cast("int")
        )
        .filter(F.col("distance") >= 0)
        .select("id_a", "id_b", "distance")
    )
    # degenerate arm: strings too short to segment pair with anything
    # within the length window (broadcast — this set is tiny)
    shorts = base.filter(F.col("_l") < k + 1)
    short_pairs = (
        base.join(
            F.broadcast(
                shorts.select(
                    F.col("_id").alias("id_u"),
                    F.col("_s").alias("u"),
                    F.col("_l").alias("l_u"),
                )
            ),
            (F.col("_id") != F.col("id_u"))
            & (F.abs(F.col("_l") - F.col("l_u")) <= k),
        )
        .withColumn("distance", F.levenshtein("_s", "u", k).cast("int"))
        .filter(F.col("distance") >= 0)
        .select(
            F.least("_id", "id_u").alias("id_a"),
            F.greatest("_id", "id_u").alias("id_b"),
            "distance",
        )
        .distinct()
    )
    return verified.unionByName(short_pairs).distinct()


def edit_distance_search(
    corpus: DataFrame,
    queries: DataFrame,
    k_max: int = 2,
    topn: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-``topn`` corpus strings per query under Levenshtein distance
    ≤ ``k_max`` — the SEARCH face of :func:`edit_distance_pairs`
    (spelling-variant / near-key lookup). Returns
    ``(query_id, id, distance, rank)`` with rank 1 = closest, ties
    broken by id ascending (deterministic, engine-replayable).

    The PassJoin asymmetry is flipped to put the cheap work on the BIG
    side: every CORPUS string carries its k+1 even-split segments (a
    projection, hashed to 64-bit keys map-side), while the small QUERY
    side explodes into the xxhash64 of its substrings of the few
    lengths a ±k partner's segments could take and BROADCASTS a
    fixed-width (query_id, len, hash, position) map — so the corpus is
    never exploded and never shuffled;
    candidates fall out of a broadcast hash join plus the shift/length
    residuals, and JVM ``levenshtein`` verifies IN the corpus scan
    partitions, before any exchange. The only shuffle in the whole
    search is the distinct/rank over ``(query_id, id, distance)`` —
    no text column ever crosses an exchange (plan-pinned). Corpus
    strings too short to segment take the same broadcast length-window
    arm as the join face. Ranking is one per-query window over
    verified matches only (bounded by |queries| × candidates, never
    the corpus)."""
    if k_max < 1:
        raise ValueError(
            f"edit_distance_search: k_max must be >= 1, got {k_max}"
        )
    if topn < 1:
        raise ValueError(
            f"edit_distance_search: topn must be >= 1, got {topn}"
        )
    k = k_max
    base = (
        corpus.select(
            F.col(id_col).alias("_id"),
            F.col(text_col).cast("string").alias("_s"),
        )
        .filter(F.col("_s").isNotNull())
        .withColumn("_l", F.length("_s"))
    )
    qrel = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(text_col).cast("string").alias("_t"),
        )
        .filter(F.col("_t").isNotNull())
        .withColumn("_lt", F.length("_t"))
    )
    # corpus side: k+1 even-split segments (projection, no explosion
    # of the text itself — k+1 short rows per corpus string)
    i = F.col("_i")
    q = (F.col("_l") / (k + 1)).cast("int")
    r = F.col("_l") % (k + 1)
    seg_start = i * q + F.least(i, r)
    seg_len = q + F.when(i < r, 1).otherwise(0)
    segs = base.filter(F.col("_l") >= k + 1).select(
        F.col("_id"),
        F.col("_s"),
        F.col("_l"),
        F.explode(F.sequence(F.lit(0), F.lit(k))).alias("_i"),
    ).select(
        "_id",
        "_s",
        "_l",
        seg_start.alias("_ps"),
        # 64-bit segment hash as the join key (exact: collisions only
        # ADD candidates; the levenshtein verify kills them) — keeps
        # the broadcast map and hash probes constant-width
        F.xxhash64(
            F.substring(F.col("_s"), seg_start + 1, seg_len)
        ).alias("_sh"),
        seg_len.alias("_q"),
    )
    # query side — ALIGNED substrings only (the pairs face's PassJoin
    # substring selection): (2k+1) corpus partner lengths × (k+1)
    # segment slots × (2k+1) shifts, O(k³) probe rows per query
    # regardless of query length. Short corpus partners are the
    # shorts arm's job, so partner lengths clamp to the segmentable
    # range.
    ls = F.col("_ls")
    qp = (ls / (k + 1)).cast("int")
    rp = ls % (k + 1)
    probe_q = qp + F.when(F.col("_i") < rp, 1).otherwise(0)
    probe_p = F.col("_i") * qp + F.least(F.col("_i"), rp)
    qsubs = (
        qrel.select(
            "query_id",
            "_t",
            "_lt",
            F.explode(
                F.sequence(
                    F.greatest(F.col("_lt") - k, F.lit(k + 1)),
                    F.col("_lt") + k,
                )
            ).alias("_ls"),
        )
        .select(
            "query_id",
            "_t",
            "_lt",
            "_ls",
            F.explode(F.sequence(F.lit(0), F.lit(k))).alias("_i"),
        )
        .select(
            "query_id",
            "_t",
            "_lt",
            probe_q.alias("_q"),
            F.explode(
                F.sequence(probe_p - k, probe_p + k)
            ).alias("_pt"),
        )
        .filter(
            (F.col("_pt") >= 0)
            & (F.col("_pt") + F.col("_q") <= F.col("_lt"))
        )
        .select(
            # query text dropped here too: the broadcast map holds
            # fixed-width (query_id, len, hash, position) rows; the
            # text itself re-joins from the |queries|-row qrel below
            "query_id",
            "_lt",
            "_q",
            "_pt",
            F.xxhash64(
                F.substring(F.col("_t"), F.col("_pt") + 1, F.col("_q"))
            ).alias("_sh"),
        )
    )
    # Verify BEFORE the dedup exchange: both broadcast joins leave the
    # corpus text in its scan partitions, levenshtein runs there (a
    # duplicate candidate costs a redundant verify, bounded by
    # (k+1)·(2k+1) per pair), and the only shuffle in the whole search
    # is the distinct/rank over (query_id, id, distance) — no text
    # column ever crosses an exchange.
    cand = (
        segs.join(F.broadcast(qsubs), ["_q", "_sh"])
        .filter(
            (F.abs(F.col("_l") - F.col("_lt")) <= k)
            & (F.abs(F.col("_ps") - F.col("_pt")) <= k)
        )
        .select("query_id", F.col("_id"), "_s")
        .join(F.broadcast(qrel.select("query_id", "_t")), "query_id")
    )
    shorts = base.filter(F.col("_l") < k + 1).join(
        F.broadcast(qrel),
        F.abs(F.col("_l") - F.col("_lt")) <= k,
    ).select("query_id", F.col("_id"), "_s", "_t")
    matched = (
        cand.unionByName(shorts)
        .withColumn("distance", F.levenshtein("_s", "_t", k).cast("int"))
        .filter(F.col("distance") >= 0)
        .select("query_id", "_id", "distance")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("distance"), F.asc("_id")
    )
    return (
        matched.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= topn)
        .select(
            "query_id", F.col("_id").alias(id_col), "distance", "rank"
        )
    )
