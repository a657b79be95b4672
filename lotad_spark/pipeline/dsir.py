"""Data Selection via Importance Resampling (DSIR) over hashed n-grams.

Selects raw-corpus documents that look like a small in-domain target
corpus (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"): featurize every document as hashed
unigram+bigram counts, fit bag-of-hashed-ngrams models on the target and
the raw corpus, weight each raw document by its log importance ratio
``sum_g [ log p_target(bucket(g)) - log p_raw(bucket(g)) ]``, then
resample without replacement with Gumbel top-k (the log-space equivalent
of the A-ES exponential-keys trick in ``sampling.weighted_sample``).

Scale shape (the 100 TB path):

* **Featurize** — explode grams, then an immediate ``(doc, bucket)``
  groupBy: map-side partial aggregation reduces each document to at most
  ``min(n_grams, buckets)`` rows before any exchange; raw text never
  shuffles.
* **Bucket models** — a groupBy on ``bucket`` is bounded at ``buckets``
  rows (default 4096) regardless of corpus size, with map-side combine;
  the log-ratio relation is tiny and broadcast into the scoring join.
* **Score** — the reduced feature relation joins the broadcast ratio
  table and re-aggregates by document (partial sums again); one
  doc-keyed shuffle of pre-reduced rows is the entire cost.
* **Resample** — a global top-k plans as TakeOrderedAndProject (each
  task keeps k rows, the driver merges), never a single-partition sort.

Cross-engine determinism (DuckDB oracle): buckets come from the first 8
hex chars of md5 (same in both engines), per-bucket log-ratios are
rounded to 6 decimals and cast to DECIMAL(18,6) *before* the per-document
sum, so the sum is exact integer arithmetic — associative and
partitioning-proof (the repo-wide decimal-sum convention, see
``text.unigram_logprob``). Gumbel keys derive from md5 of the document
id, the same uniform-from-hash idiom as ``sampling.weighted_sample``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lotad_spark.pipeline.text import tokens
from lotad_spark.pipeline._share import share_corpus

DEFAULT_BUCKETS = 4096
DEFAULT_SMOOTHING = 0.5
_U32_SPAN = 4294967297.0  # 2**32 + 1: (hash32 + 1) / span lies in (0, 1)


def ngram_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Hashed unigram+bigram counts per document: (id, bucket, tf).

    Tokens are whitespace splits of lowercased text; bigrams are
    space-joined adjacent token pairs; each gram maps to
    ``uint32(md5(gram)[:8]) % buckets``. The filtered token array is
    materialized in its own projection first so the higher-order-function
    column is referenced (not re-inlined) downstream.
    """
    toks = F.filter(
        tokens(F.lower(F.col(text_col))), lambda x: x != F.lit("")
    )
    w = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), toks.alias("_w")
    )
    n1 = F.greatest(F.size("_w") - 1, F.lit(0))
    grams = F.concat(
        F.col("_w"),
        F.zip_with(
            F.slice("_w", 1, n1),
            F.slice("_w", 2, n1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    )
    return (
        w.select(F.col(id_col), F.explode(grams).alias("_g"))
        .select(
            F.col(id_col),
            (
                F.conv(F.substring(F.md5("_g"), 1, 8), 16, 10).cast("bigint")
                % buckets
            ).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bucket_logratios(
    raw_feat: DataFrame,
    target_feat: DataFrame,
    *,
    buckets: int = DEFAULT_BUCKETS,
    smoothing: float = DEFAULT_SMOOTHING,
) -> DataFrame:
    """Per-bucket importance log-ratio: (bucket, lr DECIMAL(18,6)).

    ``lr = ln(p_target(bucket)) - ln(p_raw(bucket))`` with add-lambda
    smoothing over the full bucket space, so buckets unseen in the
    target still get a finite (negative) ratio. Bounded at ``buckets``
    rows — always broadcastable.
    """
    # Each count relation is bounded at ``buckets`` rows but feeds TWO
    # consumers (the outer join and its own total); tgt_c unshared
    # additionally re-featurizes the whole target corpus per consumer.
    # The lazy localCheckpoint computes each once — ≤4096 tiny rows of
    # executor-local state.
    raw_c = (
        raw_feat.groupBy("bucket")
        .agg(F.sum("tf").alias("_rc"))
        .localCheckpoint(eager=False)
    )
    tgt_c = (
        target_feat.groupBy("bucket")
        .agg(F.sum("tf").alias("_tc"))
        .localCheckpoint(eager=False)
    )
    raw_t = raw_c.select(F.sum("_rc").cast("double").alias("_rt"))
    tgt_t = tgt_c.select(F.sum("_tc").cast("double").alias("_tt"))
    lam = float(smoothing)
    denom = lam * buckets
    joined = (
        raw_c.join(tgt_c, "bucket", "full_outer")
        .crossJoin(F.broadcast(raw_t))
        .crossJoin(F.broadcast(tgt_t))
    )
    lr = F.log(
        (F.coalesce(F.col("_tc"), F.lit(0)) + lam) / (F.col("_tt") + denom)
    ) - F.log(
        (F.coalesce(F.col("_rc"), F.lit(0)) + lam) / (F.col("_rt") + denom)
    )
    return joined.select(
        "bucket", F.round(lr, 6).cast("decimal(18,6)").alias("lr")
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    smoothing: float = DEFAULT_SMOOTHING,
    share_features: bool = True,
) -> DataFrame:
    """Per-document DSIR importance weight: (id, n_grams, weight).

    ``weight = sum_bucket tf * lr`` — the document's log importance
    ratio under the hashed-ngram models. Higher = more target-like.
    The per-bucket decimal ratios make the sum exact; the final weight
    is the double cast rounded to 6 decimals.

    The raw feature relation feeds two consumers (the raw bucket model
    and the scoring join); without sharing, Spark would featurize the
    full corpus twice — the dominant stage, so 2x the whole job at
    100 TB. ``share_features`` (default) shares the *reduced*
    (id, bucket, tf) relation once (share_corpus): the ratio-broadcast
    job materializes it and the scoring join reuses the materialized
    partitions. Values are identical either way (the relation is
    deterministic); disable only when executor-local storage is the
    constraint.
    """
    raw_feat = ngram_features(
        raw, id_col=id_col, text_col=text_col, buckets=buckets
    )
    if share_features:
        raw_feat = share_corpus(raw_feat)
    tgt_feat = ngram_features(
        target, id_col=id_col, text_col=text_col, buckets=buckets
    )
    ratio = bucket_logratios(
        raw_feat, tgt_feat, buckets=buckets, smoothing=smoothing
    )
    return (
        raw_feat.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_grams"),
            F.sum(F.col("tf") * F.col("lr")).alias("_sw"),
        )
        .select(
            id_col,
            "n_grams",
            F.round(F.col("_sw").cast("double"), 6).alias("weight"),
        )
    )


def dsir_resample(
    weights: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """Gumbel top-k resample of a (id, ..., weight) relation: the k
    selected rows, deterministic in (corpus, salt).

    Sampling without replacement with probability proportional to
    ``exp(weight)`` == taking the k largest ``weight + Gumbel(id)``;
    the Gumbel variate is ``-ln(-ln(u))`` with ``u`` uniform from
    md5(salt ':' id) — reproducible on any partitioning, any engine.
    Keys are rounded to 6 decimals with the id as tiebreak so the
    boundary is engine-stable. Plans as TakeOrderedAndProject.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + 1
    ) / F.lit(_U32_SPAN)
    key = F.round(F.col("weight") + (-F.log(-F.log(u))), 6)
    return (
        weights.withColumn("_key", key)
        .orderBy(F.col("_key").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("_key")
    )
