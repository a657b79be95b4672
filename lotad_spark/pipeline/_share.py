"""Storage policy for multi-consumer intermediate relations.

Catalyst does not share common subplans, so a relation consumed by N
branches of one query recomputes N times unless materialized once.
Every such site in this package picks its storage by the relation's
size class (SCALING.md "Shared-relation storage policy"):

**Bounded relations** (histograms, bucket counts, per-round labels —
KB-to-MB regardless of corpus size) use ``localCheckpoint(eager=False)``
directly: shards are tiny, lineage truncation keeps iterative plans
small, and on executor loss re-running the query re-derives them
cheaply.

**Corpus-proportional relations** (fingerprints, postings, token/
feature relations — they grow with the input) route through
:func:`share_corpus`. Locally that is the same lazy localCheckpoint,
but on a multi-node cluster local checkpoints trade fault tolerance
for speed: the shards live in executor storage with lineage TRUNCATED,
so losing one executor mid-query makes the job unrecoverable instead
of recomputable. Set ``spark.lotad.sharedRelations=reliable`` (and a
``spark.sparkContext.setCheckpointDir``) to store these relations as
reliable checkpoints that survive executor loss.

Why not ``DataFrame.persist(MEMORY_AND_DISK)``: persist registers the
plan in the session CacheManager, which (a) leaks until an explicit
``unpersist`` — these sites return lazy DataFrames, so there is no
call-scoped point to unpersist at (the r14 persist-leak lesson,
pinned in tests/test_plans.py) — and (b) plan-keyed matching silently
substitutes the cache into LATER, independently built queries with the
same canonical subplan, so repeated runs would reuse each other's
intermediates instead of recomputing. localCheckpoint and reliable
checkpoint are both RDD-scoped: fresh runs always recompute, and the
ContextCleaner reclaims shards when the DataFrame is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SHARE_MODE_CONF = "spark.lotad.sharedRelations"


def share_corpus(df: DataFrame) -> DataFrame:
    """Materialize a CORPUS-PROPORTIONAL multi-consumer relation once.

    Default (``local``): lazy ``localCheckpoint`` — fastest, shards in
    executor storage, job fails (and must re-run) if an executor dies.
    ``reliable``: lazy ``checkpoint`` into the configured checkpoint
    dir — shards survive executor loss; requires
    ``SparkContext.setCheckpointDir``. Values are identical either way.
    """
    mode = df.sparkSession.conf.get(SHARE_MODE_CONF, "local")
    if mode == "reliable":
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)
