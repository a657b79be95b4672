"""URL/domain-level curation — the FIRST stage of every web-scale
pipeline (CCNet / C4 / RefinedWeb lineage): canonicalize URLs, dedup
exact URLs, aggregate per domain, and cap/block domains. Runs BEFORE
any text operator, because at 100 TB the cheapest byte is the one a
URL-level decision never fetches.

Everything here is pure JVM expressions — zero UDFs, and the only
shuffles are the one groupBy/window each relational op needs:

* :func:`canonicalize_urls` — a single projection (regexp pipeline);
* :func:`url_dedup` — one exchange keyed on the canonical URL;
* :func:`domain_stats` / :func:`domain_cap` — one exchange keyed on
  the domain;
* :func:`domain_blocklist_filter` — literal strategy: zero exchanges.

Canonicalization steps, in a fixed documented order (each replayable
in ANSI SQL, which is how the oracle value-checks every byte):

1. trim surrounding whitespace;
2. parse scheme / userinfo / host / port / path / query / fragment
   with anchored regexes (no URL library — the parse IS the spec);
3. lowercase scheme and host (path/query stay case-sensitive per
   RFC 3986 §6.2.2.1);
4. strip userinfo, strip the scheme's default port (http:80,
   https:443 — other ports kept), strip one leading ``www.``;
5. drop the fragment entirely;
6. path: empty → ``/``; otherwise strip ONE trailing slash;
7. query: split on ``&``, drop empty params and tracking params
   (``utm_*`` prefix + the exact-key list in :data:`TRACKING_PARAMS`,
   both matched case-insensitively — ``UTM_Source``/``Gclid`` are
   stripped too; surviving params stay byte-preserved), sort the
   survivors bytewise, rejoin with ``&``.

Rows whose URL has no ``scheme://`` prefix canonicalize to NULL —
surfaced, never guessed (relative URLs have no host to curate by).

Reference scope note: the reference engine (lotad) has no URL
operators; this module is part of the beyond-reference LLM-pipeline
surface (SURVEY.md §6), modeled on the public CCNet/RefinedWeb
descriptions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Exact-match tracking keys (lowercased), beyond the utm_ prefix:
# Google (gclid/dclid/wbraid/gbraid), Meta (fbclid), Microsooft ads
# (msclkid), Instagram (igshid), Mailchimp (mc_cid/mc_eid), Yandex
# (yclid), Alibaba (spm), generic referrer tags.
TRACKING_PARAMS = (
    "gclid",
    "dclid",
    "wbraid",
    "gbraid",
    "fbclid",
    "msclkid",
    "igshid",
    "mc_cid",
    "mc_eid",
    "yclid",
    "spm",
    "ref",
    "ref_src",
    "_ga",
)
TRACKING_PREFIX = "utm_"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def _url_parts(url: Column) -> dict[str, Column]:
    """The anchored-regex parse shared by every operator here. Returns
    plain Column expressions; callers MUST materialize any part they
    reference from two sibling outputs (the Spark 4 shared-tree
    hazard)."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.regexp_replace(
        F.regexp_extract(rest, r"^([^/?#]*)", 1), r"^[^@]*@", ""
    )
    host = F.regexp_replace(
        F.lower(F.regexp_replace(hostport, r":[0-9]+$", "")),
        r"^www\.",
        "",
    )
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    tail = F.regexp_replace(
        F.regexp_extract(rest, r"^[^/?#]*([^#]*)", 1), r"#.*$", ""
    )
    raw_path = F.regexp_extract(tail, r"^([^?]*)", 1)
    raw_query = F.when(
        tail.contains("?"), F.regexp_replace(tail, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    return {
        "scheme": scheme,
        "host": host,
        "port": port,
        "raw_path": raw_path,
        "raw_query": raw_query,
    }


def _canonical_query(raw_query: Column) -> Column:
    """Tracking-stripped, bytewise-sorted query string (may be '').

    The tracking-key MATCH is case-insensitive (``UTM_Source`` /
    ``Gclid`` are stripped like their lowercase forms — real crawls
    mix cases); surviving params stay byte-preserved per RFC 3986
    §6.2.2.1 (only the match key is lowercased, never the output)."""
    toks = F.filter(
        F.split(raw_query, "&"),
        lambda t: (t != "")
        & ~F.lower(F.regexp_extract(t, r"^([^=]*)", 1)).startswith(
            TRACKING_PREFIX
        )
        & ~F.lower(F.regexp_extract(t, r"^([^=]*)", 1)).isin(
            *[F.lit(p) for p in TRACKING_PARAMS]
        ),
    )
    return F.array_join(F.array_sort(toks), "&")


def canonicalize_urls(
    df: DataFrame,
    url_col: str = "url",
    *,
    out_col: str = "canonical_url",
) -> DataFrame:
    """Append ``out_col`` holding the canonical form of ``url_col``
    (the module docstring's 7 steps) — one JVM projection, zero
    exchanges, streaming-safe. URLs with no ``scheme://`` prefix (or
    NULL input) canonicalize to NULL.

    Known limitation (documented, not guessed around): IPv6 literal
    hosts (``http://[::1]/``) are treated textually — the bracketed
    form survives into the canonical host and the port strip doesn't
    apply inside brackets. Web-crawl corpora are overwhelmingly named
    hosts; pipelines with IPv6 URLs should normalize them upstream."""
    clash = {"_u_scheme", "_u_host", "_u_port", "_u_path", "_u_query"} & set(
        df.columns
    )
    if clash:
        raise ValueError(
            f"canonicalize_urls: input columns collide with staging "
            f"names {sorted(clash)}"
        )
    parts = _url_parts(F.col(url_col))
    # Materialize every multiply-referenced part in its own projection
    # first (shared-lambda/tree hazard; see blocklist_filter).
    staged = df.withColumns(
        {
            "_u_scheme": parts["scheme"],
            "_u_host": parts["host"],
            "_u_port": parts["port"],
            "_u_path": parts["raw_path"],
            "_u_query": _canonical_query(parts["raw_query"]),
        }
    )
    path = F.when(F.col("_u_path") == "", F.lit("/")).otherwise(
        F.when(
            F.col("_u_path") != "/",
            F.regexp_replace(F.col("_u_path"), r"/$", ""),
        ).otherwise(F.col("_u_path"))
    )
    port_suffix = F.when(
        (F.col("_u_port") == "")
        | ((F.col("_u_scheme") == "http") & (F.col("_u_port") == "80"))
        | (
            (F.col("_u_scheme") == "https")
            & (F.col("_u_port") == "443")
        ),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), F.col("_u_port")))
    canonical = F.when(
        (F.col("_u_scheme") == "") | (F.col("_u_host") == ""),
        F.lit(None).cast("string"),
    ).otherwise(
        F.concat(
            F.col("_u_scheme"),
            F.lit("://"),
            F.col("_u_host"),
            port_suffix,
            path,
            F.when(F.col("_u_query") == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), F.col("_u_query"))
            ),
        )
    )
    return staged.withColumn(out_col, canonical).drop(
        "_u_scheme", "_u_host", "_u_port", "_u_path", "_u_query"
    )


def url_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Exact URL dedup AFTER canonicalization: one row per input row,
    ``(id, canonical_url, keep_id, is_dup)`` — ``keep_id`` is the
    minimum id sharing the canonical URL (the repo's deterministic
    keep-rule, same as the text dedup family) and
    ``is_dup = id != keep_id``. NULL canonicals (unparseable URLs)
    are never each other's duplicates: every such row keeps itself.

    Scale shape: ONE exchange, keyed on the canonical URL (~100-byte
    keys — bounded, unlike document text; at 100 TB this is the
    standard first-dedup and removes the plurality of raw-crawl rows
    before any text ever shuffles). Flag-don't-drop: the kept corpus
    is one ``filter(~is_dup)`` away."""
    canon = canonicalize_urls(
        df.select(id_col, url_col), url_col
    )
    w = Window.partitionBy("canonical_url")
    return canon.select(
        F.col(id_col),
        F.col("canonical_url"),
        F.when(
            F.col("canonical_url").isNull(), F.col(id_col)
        )
        .otherwise(F.min(id_col).over(w))
        .alias("keep_id"),
    ).withColumn(
        "is_dup", F.col(id_col) != F.col("keep_id")
    )


def _apex_expr(host: Column) -> Column:
    """Last-two-labels apex heuristic. Deliberately NOT eTLD+1: the
    public-suffix list is a versioned external artifact; the heuristic
    is wrong for multi-label suffixes (``example.co.uk`` →
    ``co.uk``) and says so here rather than pretending. Pipelines that
    need true eTLD+1 should join a PSL relation on ``domain``."""
    return F.when(
        host.rlike(r"[^.]+\.[^.]+$"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1),
    ).otherwise(host)


def domain_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Per-domain aggregation feeding cap/blocklist decisions:
    ``(domain, apex_domain, n_docs, n_urls)`` where ``domain`` is the
    canonical host (www-stripped, lowercased), ``apex_domain`` the
    last-two-labels heuristic (see :func:`_apex_expr`), ``n_docs`` the
    row count and ``n_urls`` the DISTINCT canonical URLs. Unparseable
    URLs aggregate under domain NULL so the gate's coverage is
    auditable. TWO exchanges (plan-pinned): the exact count(DISTINCT)
    expands to a partial-aggregated (domain, canonical_url) exchange —
    bounded by the distinct-URL count, not the corpus — followed by
    the domain-keyed final aggregation. Trading exactness for one
    exchange means approx_count_distinct; this gate feeds cap/block
    DECISIONS, so it stays exact."""
    canon = canonicalize_urls(df.select(id_col, url_col), url_col)
    host = F.when(
        F.col("canonical_url").isNotNull(),
        F.regexp_extract(
            F.col("canonical_url"), r"^[a-z][a-z0-9+.\-]*://([^/:?]*)", 1
        ),
    )
    staged = canon.withColumn("domain", host)
    return (
        staged.groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct(F.col("canonical_url"))
            .cast("bigint")
            .alias("n_urls"),
        )
        .withColumn("apex_domain", _apex_expr(F.col("domain")))
        .select("domain", "apex_domain", "n_docs", "n_urls")
    )


def domain_cap(
    df: DataFrame,
    max_per_domain: int,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Deterministic per-domain cap (the RefinedWeb anti-monoculture
    gate): rank each domain's rows by id ascending and flag rank >
    ``max_per_domain`` as ``capped``. Returns
    ``(id, domain, domain_rank, capped)`` for every input row.
    Unparseable URLs (domain NULL) are never capped — a gate that
    silently eats the rows it can't parse is how corpora lose
    coverage unaudited.

    ONE exchange keyed on the domain. A pathological hot domain makes
    a hot partition here; that is inherent to exact per-domain rank —
    at 100 TB pre-filter with :func:`domain_stats` (broadcast the few
    over-cap domains, rank ONLY their rows) if one domain dominates
    the corpus."""
    if max_per_domain < 1:
        raise ValueError("domain_cap: max_per_domain must be >= 1")
    canon = canonicalize_urls(df.select(id_col, url_col), url_col)
    staged = canon.withColumn(
        "domain",
        F.when(
            F.col("canonical_url").isNotNull(),
            F.regexp_extract(
                F.col("canonical_url"),
                r"^[a-z][a-z0-9+.\-]*://([^/:?]*)",
                1,
            ),
        ),
    )
    w = Window.partitionBy("domain").orderBy(F.asc(id_col))
    return staged.select(
        F.col(id_col),
        F.col("domain"),
        F.when(F.col("domain").isNull(), F.lit(1))
        .otherwise(F.row_number().over(w))
        .cast("bigint")
        .alias("domain_rank"),
    ).withColumn(
        "capped", F.col("domain_rank") > max_per_domain
    )


def domain_blocklist_filter(
    df: DataFrame,
    domains: list[str] | tuple[str, ...],
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Domain-axis blocklist (the companion to the content-axis
    :func:`~lotad_spark.pipeline.text.blocklist_filter`): flag rows
    whose canonical host equals a blocked domain OR is a subdomain of
    one (``example.com`` blocks ``a.b.example.com`` — suffix-at-label
    semantics, never substring: ``notexample.com`` does not match).
    Returns ``(id, domain, blocked_by, blocked)``; ``blocked_by`` is
    the matching blocklist entry (bytewise-smallest when several
    match, deterministic) or NULL.

    The term list rides into the projection as an array literal — the
    curated-blocklist shape (hundreds to thousands of domains), ONE
    scan, zero exchanges. NULL domains are never blocked (surfaced
    via the domain column instead)."""
    # strip() FIRST: ' example.com ' must normalize to a matchable
    # entry, not silently keep its spaces and never match any host.
    dl = sorted(
        {d.strip().lower().lstrip(".") for d in domains if d.strip()}
    )
    if not dl:
        raise ValueError("domain_blocklist_filter: empty domain list")
    canon = canonicalize_urls(df.select(id_col, url_col), url_col)
    staged = canon.select(
        F.col(id_col),
        F.when(
            F.col("canonical_url").isNotNull(),
            F.regexp_extract(
                F.col("canonical_url"),
                r"^[a-z][a-z0-9+.\-]*://([^/:?]*)",
                1,
            ),
        ).alias("domain"),
    )
    lit = F.array(*[F.lit(d) for d in dl])
    # Materialize the lambda-bearing match array before `blocked`
    # references it (shared-tree hazard).
    matched = staged.withColumn(
        "_hits",
        F.when(
            F.col("domain").isNotNull(),
            F.array_sort(
                F.filter(
                    lit,
                    lambda d: (F.col("domain") == d)
                    | F.col("domain").endswith(
                        F.concat(F.lit("."), d)
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return matched.select(
        F.col(id_col),
        F.col("domain"),
        F.when(F.size("_hits") > 0, F.col("_hits")[0]).alias(
            "blocked_by"
        ),
        (F.size("_hits") > 0).alias("blocked"),
    )


def write_url_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> None:
    """Materialize the EXACT canonical-URL membership index the daily
    crawl loop dedups against (the precise sibling of the approximate
    ``sketch_index_prefilter`` face): the DISTINCT canonical URLs of
    the corpus as parquet (``urls/``: canonical_url) plus a one-row
    ``meta/`` (n_urls). Canonicalization runs once at build;
    unparseable URLs (NULL canonical) are NOT indexed — they can never
    match a future batch row, and indexing them would make NULL a
    member."""
    canon = (
        canonicalize_urls(df.select(id_col, url_col), url_col)
        .filter(F.col("canonical_url").isNotNull())
        .select("canonical_url")
        .distinct()
    )
    canon.write.mode("overwrite").parquet(f"{path}/urls")
    spark = df.sparkSession
    n = spark.read.parquet(f"{path}/urls").count()
    spark.createDataFrame(
        [(int(n),)], "n_urls bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def url_dedup_against_index(
    spark,
    index_path: str,
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Incremental URL dedup: flag a new batch against a stored
    :func:`write_url_index` AND within itself — one pass, the daily
    ingest shape. Returns one row per batch row:
    ``(id, canonical_url, is_dup, dup_source)`` where ``dup_source``
    is ``'index'`` (canonical already stored — wins over batch),
    ``'batch'`` (new URL, but a smaller id in THIS batch has it) or
    NULL. Unparseable URLs keep themselves, as in :func:`url_dedup`.

    Scale shape: the batch canonicalizes once; the index join is a
    LEFT SEMI-shaped left join on the canonical key — AQE broadcasts
    the index when it fits, shuffles the (id, canonical) projection
    (never text) otherwise; the within-batch face reuses the
    :func:`url_dedup` window. Probe-after-append ≡ rebuild-over-union
    is pinned in tests."""
    canon = canonicalize_urls(df.select(id_col, url_col), url_col)
    idx = spark.read.parquet(f"{index_path}/urls").withColumn(
        "_in_index", F.lit(True)
    )
    joined = canon.join(idx, "canonical_url", "left")
    w = Window.partitionBy("canonical_url")
    keep = F.when(
        F.col("canonical_url").isNull(), F.col(id_col)
    ).otherwise(F.min(id_col).over(w))
    staged = joined.select(
        F.col(id_col),
        F.col("canonical_url"),
        F.coalesce(F.col("_in_index"), F.lit(False)).alias("_idx"),
        keep.alias("_keep"),
    )
    dup_source = F.when(F.col("_idx"), F.lit("index")).otherwise(
        F.when(F.col(id_col) != F.col("_keep"), F.lit("batch"))
    )
    return staged.select(
        id_col,
        "canonical_url",
        dup_source.isNotNull().alias("is_dup"),
        dup_source.alias("dup_source"),
    )


def append_to_url_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> None:
    """Fold a batch's NEW canonical URLs into a live index without
    re-reading the stored set's source corpus: canonicalize the batch,
    left-anti against the stored relation, parquet-APPEND only the
    novel URLs (existing files untouched — appends here are
    distinct-safe because the anti-join guarantees novelty), then
    rewrite meta through the rename-swap (readers fall back to
    ``meta.old`` in the crash window). A crash mid-append leaves
    partial part-files of NOVEL urls only — re-running the append
    anti-joins them away, so recovery is re-run, same as the sketch
    index.

    Scale note: the novel set is eagerly localCheckpointed (so the
    append never scans its own new files); executor memory/disk bounds
    that set. At extreme daily volumes (novel URLs in the hundreds of
    millions) stage the anti-join result to a scratch parquet dir and
    append from THERE instead — same two-job shape, unbounded
    staging."""
    from lotad_spark.pipeline.retrieval import _replace_dir

    spark = df.sparkSession
    new = (
        canonicalize_urls(df.select(id_col, url_col), url_col)
        .filter(F.col("canonical_url").isNotNull())
        .select("canonical_url")
        .distinct()
        .join(
            spark.read.parquet(f"{path}/urls"),
            "canonical_url",
            "left_anti",
        )
        # EAGER checkpoint: the anti-join reads the very directory the
        # next line appends to — materialize the novel set first so the
        # write job never scans files it is itself creating.
        .localCheckpoint(eager=True)
    )
    new.write.mode("append").parquet(f"{path}/urls")
    n = spark.read.parquet(f"{path}/urls").count()
    spark.createDataFrame(
        [(int(n),)], "n_urls bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta.tmp")
    _replace_dir(spark, f"{path}/meta.tmp", f"{path}/meta")
