"""BM25 lexical retrieval over a document corpus.

Robertson et al.'s Okapi BM25 (public: "Okapi at TREC-3", 1994; the
idf form below is the Lucene variant, ``ln(1 + (N − df + 0.5) /
(df + 0.5))``, which is non-negative for every df). The operator a
training-data pipeline reaches for when it needs *lexical* retrieval —
benchmark decontamination by retrieval instead of exact shingles,
nearest-document audits, quality probes ("which docs answer this
query"), and hard-negative mining for embedding training — complementing
the embedding-space ANN ladder (`pipeline.similarity` / `pipeline.pq`).

Scale shape (the 100 TB contract):

* the corpus touches ONE tokenize+explode pass → a (doc, term, tf)
  postings relation with map-side partial aggregation; document text
  never shuffles;
* document length and document frequency aggregate the already-reduced
  postings relation — no second scan of the raw text;
* the query relation is bounded (a serving batch), so its distinct
  terms broadcast: the postings relation is semi-join-reduced to
  query-vocabulary terms BEFORE any per-query work — at 100 TB the
  matched postings are a vanishing fraction of the corpus;
* corpus scalars (N, avgdl) ride in as a broadcast 1-row relation;
* the per-(query, doc) score is a sum of per-term contributions, each
  rounded to 6 decimals and cast to DECIMAL(18,6) FIRST, so the sum is
  exact integer arithmetic — associative, partitioning-proof, and
  bit-equal in any engine (the repo-wide decimal-sum convention);
* top-k is the shared rank-window shape: WindowGroupLimit prunes to k
  rows per query map-side before the final exchange.

The write-once index face (:func:`write_bm25_index` /
:func:`bm25_against_index`) materializes the postings + stats so a
serving probe never re-tokenizes the corpus — the same
build-once/probe-many pattern as ``build_ivf_index`` and
``write_dedup_index``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lotad_spark.pipeline.text import tokens
from lotad_spark.pipeline._share import share_corpus
from lotad_spark.sources.memory import bounded_local_df

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75

# Postings partition count for the index layout: probes read only the
# buckets their query terms hash into (a static partition filter, the
# IVF-index contract applied to the inverted index).
N_TERM_BUCKETS = 64


def _term_bucket(col: Column) -> Column:
    """uint32(md5(term)[:8]) % N_TERM_BUCKETS — the repo's cross-engine
    bucket idiom (dsir.ngram_features); :func:`_term_bucket_py` is the
    bit-identical driver-side twin used to pick probe partitions."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")
        % N_TERM_BUCKETS
    )


def _term_bucket_py(term: str) -> int:
    import hashlib

    return (
        int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16)
        % N_TERM_BUCKETS
    )


def _postings(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(doc, term, tf) — one tokenize+explode pass, map-side combined."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _bm25_contribution(k1: float, b: float) -> Column:
    """The per-(query-term, doc) BM25 term, rounded then decimal-cast so
    per-document sums are exact. Expects columns tf, df, dl and the
    broadcast scalars _n (docs) and _avgdl."""
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    norm = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl")
    )
    return (
        F.round(idf * tf * F.lit(k1 + 1.0) / norm, 6)
        .cast("decimal(18,6)")
        .alias("_c")
    )


def _score_and_rank(
    matched: DataFrame,
    k: int,
    k1: float,
    b: float,
    id_col: str,
    query_id_col: str,
) -> DataFrame:
    scored = (
        matched.select(
            query_id_col, id_col, _bm25_contribution(k1, b)
        )
        .groupBy(query_id_col, id_col)
        .agg(F.sum("_c").alias("_s"))
        .select(
            query_id_col,
            id_col,
            F.col("_s").cast("double").alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id_col, id_col, "score")
    )


def _query_terms(
    queries: DataFrame, query_id_col: str, query_col: str
) -> DataFrame:
    """DISTINCT (query_id, term): classic BM25 ignores query-side term
    frequency (queries are short; repeating a word in the query is not a
    relevance signal)."""
    return (
        queries.select(
            F.col(query_id_col),
            F.explode(tokens(F.lower(F.col(query_col)))).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """Top-``k`` documents per query under BM25: (query_id, doc_id,
    score), ties broken by doc_id ascending (total order → reproducible
    across engines; score is the exact decimal sum read back as double).

    ``avgdl`` counts EVERY corpus document (a zero-token document
    contributes dl=0 to the average and can never match), matching the
    textbook definition.

    The postings relation feeds FOUR consumers (match, df, dl, total
    tokens); Catalyst does not share common subplans, so without a
    share point the corpus would tokenize four times. share_corpus
    (the dsir/dedup pattern; SCALING.md storage policy) materializes
    the reduced (doc, term, tf) relation once — document text is read exactly once.
    The true serving path at 100 TB is :func:`write_bm25_index` +
    :func:`bm25_against_index`, which persists that relation instead."""
    postings = share_corpus(_postings(docs, id_col, text_col))
    dl = postings.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    df_rel = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    scalars = docs.select(
        F.count(F.lit(1)).cast("double").alias("_n")
    ).crossJoin(
        postings.select(F.sum("tf").alias("_tot"))
    ).select(
        "_n", (F.col("_tot").cast("double") / F.col("_n")).alias("_avgdl")
    )
    qt = _query_terms(queries, query_id_col, query_col)
    matched = (
        postings.join(F.broadcast(qt), "term")
        .join(df_rel, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(scalars))
    )
    return _score_and_rank(matched, k, k1, b, id_col, query_id_col)


def _index_postings(
    docs: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """(postings-with-dl, meta) for one document batch — shared by the
    index build and the incremental append so both write the identical
    layout."""
    postings = share_corpus(_postings(docs, id_col, text_col))
    dl = postings.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stored = postings.join(dl, id_col).withColumn(
        "term_bucket", _term_bucket(F.col("term"))
    )
    meta = docs.select(
        F.count(F.lit(1)).alias("n_docs")
    ).crossJoin(
        postings.select(
            F.coalesce(F.sum("tf"), F.lit(0)).alias("total_tokens")
        )
    )
    return stored, meta


def write_bm25_index(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the BM25 serving state: the postings relation with dl
    joined in (``postings/``: doc, term, tf, dl) and the corpus scalars
    (``meta/``: n_docs, total_tokens). The corpus is tokenized ONCE at
    build; every later probe reads back a few columns of the reduced
    relation — document text never again enters a plan. (The build
    lazily checkpoints the postings so its three consumers — the stored
    join, dl, and the meta total — share one tokenize pass, same as
    :func:`bm25_topk`.)

    Document frequency is deliberately NOT stored: df is a corpus-GLOBAL
    statistic, so a baked-in copy goes stale the moment documents are
    appended. The probe derives df from the matched postings instead
    (for a query term t, the matched postings ARE all of t's postings —
    one count over the already-semi-reduced relation), so df is fresh by
    construction and :func:`append_to_bm25_index` is a pure
    parquet-append plus a meta rewrite."""
    stored, meta = _index_postings(docs, id_col, text_col)
    stored.write.mode("overwrite").partitionBy("term_bucket").parquet(
        f"{path}/postings"
    )
    meta.coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def _replace_dir(spark, tmp: str, dst: str) -> None:
    """Swap a staged directory into place with two Hadoop-FS renames
    (local FS and HDFS: metadata-only, near-atomic; object stores:
    copy-rename, still a far narrower window than a delete-then-write
    overwrite). A reader never observes a half-written ``dst`` — but
    there IS a narrow missing-``dst`` window between the
    rename(dst → dst.old) and rename(tmp → dst) steps: a crash there
    leaves only ``dst.old`` (the pre-swap state; ``tmp`` was already
    renamed away). Readers handle it via :func:`_read_meta`, which
    falls back to ``dst.old`` when ``dst`` is absent, so a concurrent
    probe during (or after) that crash still reads a complete,
    pre-swap meta rather than failing."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    dst_p = jvm.org.apache.hadoop.fs.Path(dst)
    fs = dst_p.getFileSystem(conf)
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    old_p = jvm.org.apache.hadoop.fs.Path(dst + ".old")
    if fs.exists(old_p):
        fs.delete(old_p, True)
    if fs.exists(dst_p):
        fs.rename(dst_p, old_p)
    fs.rename(tmp_p, dst_p)
    if fs.exists(old_p):
        fs.delete(old_p, True)


def _read_meta(spark, path: str) -> DataFrame:
    """Read an index's ``meta`` directory, falling back to ``meta.old``
    when ``meta`` is absent — the recovery face of
    :func:`_replace_dir`'s missing-``dst`` crash window (a crash
    between its two renames leaves only the pre-swap ``meta.old``).
    The fallback serves the PRE-append totals, which is consistent
    with the postings a concurrent reader may see mid-append; the next
    successful append (or a re-run of the final swap) restores
    ``meta``."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    meta_p = jvm.org.apache.hadoop.fs.Path(path)
    fs = meta_p.getFileSystem(conf)
    if fs.exists(meta_p):
        return spark.read.parquet(path)
    old = path + ".old"
    old_p = jvm.org.apache.hadoop.fs.Path(old)
    if fs.exists(old_p):
        return spark.read.parquet(old)
    # Neither exists: surface the normal Spark path error on the
    # primary location.
    return spark.read.parquet(path)


def append_to_bm25_index(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Append a new document batch to a live :func:`write_bm25_index`
    layout WITHOUT re-reading the existing corpus: the batch tokenizes
    once, its (doc, term, tf, dl) rows parquet-append into ``postings/``
    (existing files untouched), and ``meta/`` rewrites as the sum of
    the old scalars and the batch's — two integers, no corpus scan.
    Because df derives at probe time from the (now larger) postings and
    dl is a per-document constant, a probe after the append is
    bit-identical to a fresh build over the union (pinned in tests) —
    the daily-increment loop for a growing corpus.

    Crash-consistency ordering: the summed meta is STAGED to
    ``meta.tmp`` first, then the postings append, then a rename-swap of
    ``meta`` (:func:`_replace_dir`) — so a concurrent probe always reads
    a complete meta (the swap's narrow missing-``meta`` crash window is
    covered by the probes' ``meta.old`` fallback, :func:`_read_meta`),
    and a failure
    between the postings append and the swap leaves ``meta.tmp`` holding
    the CORRECT post-append totals: recovery is re-running the append's
    final swap, not a rebuild. The one unrecoverable window is a crash
    mid-postings-append (partial part-files): that batch's files must be
    removed or the index rebuilt before serving — parquet appends are
    not transactional on any filesystem."""
    spark = docs.sparkSession
    old = _read_meta(spark, f"{path}/meta").collect()[0]
    stored, meta = _index_postings(docs, id_col, text_col)
    new = meta.collect()[0]
    bounded_local_df(
        spark,
        [
            (
                int(old["n_docs"]) + int(new["n_docs"]),
                int(old["total_tokens"]) + int(new["total_tokens"]),
            )
        ],
        "n_docs bigint, total_tokens bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta.tmp")
    stored.write.mode("append").partitionBy("term_bucket").parquet(
        f"{path}/postings"
    )
    _replace_dir(spark, f"{path}/meta.tmp", f"{path}/meta")


def bm25_against_index(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    *,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """Serve BM25 top-k off a :func:`write_bm25_index` layout —
    bit-identical to :func:`bm25_topk` on the same corpus, including
    after :func:`append_to_bm25_index` (both pinned in tests): the
    stored relation carries the same (tf, dl) integers and the same
    scalar meta, df derives from the matched postings (for a query term
    the matched postings ARE all of its postings, so the count equals
    the full-corpus df), and scoring reuses the identical decimal-exact
    expression. The postings scan semi-reduces on the DISTINCT query
    terms first and checkpoints, so the stored relation is read once
    and df never double-counts terms shared between queries.

    The layout partitions by ``term_bucket = md5-hash(term) % 64``;
    the bounded query terms collect (a serving batch by contract) and
    their buckets apply as a STATIC partition filter, so a probe
    provably reads only the partitions its terms hash into — the same
    contract as the IVF/PQ/SQ8 index probes (plan-pinned)."""
    postings = spark.read.parquet(f"{index_path}/postings")
    meta = _read_meta(spark, f"{index_path}/meta")
    scalars = meta.select(
        F.col("n_docs").cast("double").alias("_n"),
        (
            F.col("total_tokens").cast("double")
            / F.col("n_docs").cast("double")
        ).alias("_avgdl"),
    )
    qt = _query_terms(queries, query_id_col, query_col)
    qterms = qt.select("term").distinct()
    probed_buckets = sorted(
        {_term_bucket_py(r["term"]) for r in qterms.collect()}
    )
    tpost = share_corpus(
        postings.filter(F.col("term_bucket").isin(probed_buckets))
        .drop("term_bucket")
        .join(F.broadcast(qterms), "term")
    )
    df_rel = tpost.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    matched = (
        tpost.join(F.broadcast(qt), "term")
        .join(F.broadcast(df_rel), "term")
        .crossJoin(F.broadcast(scalars))
    )
    return _score_and_rank(matched, k, k1, b, id_col, query_id_col)
