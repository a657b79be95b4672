"""Deterministic spherical k-means for IVF centroid training.

Design: Lloyd's iterations run driver-side over a BOUNDED deterministic
sample (the first ``sample_size`` vectors by id) — the sample size is
independent of corpus size, so driver cost is O(sample × dim × iters)
whether the corpus is 1 GB or 100 TB (Spark MLlib's k-means likewise
seeds from samples; only the *assignment* must be distributed, and it
is — see ``similarity.assign_to_centroids``).

No RNG anywhere:

* init is max-min farthest-point traversal starting from the first
  vector in id order (ties break on the lowest sample index);
* assignment ties break on the lowest centroid index (``np.argmax``);
* empty clusters keep their previous centroid.

Every step is reproducible bit-for-bit from the same sample, so an
oracle re-running :func:`train_centroids` on the same rows (read via
DuckDB instead of Spark) derives byte-identical centroid constants —
which is how ``ann_ivf_topk`` stays value-checkable cross-engine.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

DEFAULT_SAMPLE_SIZE = 512
DEFAULT_ITERS = 5
DEFAULT_TARGET_CLUSTER_SIZE = 250
MIN_CENTROIDS = 8


MAX_CENTROIDS = 4096


def default_n_centroids(
    n_vectors: int,
    *,
    target_cluster_size: int = DEFAULT_TARGET_CLUSTER_SIZE,
    floor: int = MIN_CENTROIDS,
    cap: int = MAX_CENTROIDS,
) -> int:
    """The cluster-size rule: ``max(floor, n_vectors // target)``.

    This is THE knob that keeps every IVF-family layout's probed
    fraction (``nprobe / n_centroids``) constant as the corpus grows: a
    fixed centroid count makes each probed bucket's VOLUME
    corpus-proportional (the measured sf1 SQ8-probe growth), while the
    rule holds the expected bucket near ``target_cluster_size`` rows so
    probe cost tracks the probed fraction, not the corpus. Same rule
    `semantic_dedup`'s pair-volume bound documents
    (``n_centroids ∝ corpus_size / target_cluster_size``; SemDeDup uses
    11k clusters for 100M docs ≈ 9k/cluster — our 250 suits the
    serving-probe latency target rather than dedup pair volume).

    Deterministic and engine-reproducible: a plain integer function of
    the corpus row count, so SQL oracles derive the identical k from
    ``COUNT(*)``.

    ``cap`` bounds the driver-side Lloyd's cost
    (O(sample × k × dim × iters)): past ~4096 coarse lists the
    single-driver trainer is the wrong tool — shard the corpus and
    build per-shard indexes instead (the partitioned serving layout
    already composes), or supply pre-trained ``centroids``."""
    if n_vectors < 0:
        raise ValueError("default_n_centroids: negative n_vectors")
    return max(floor, min(cap, int(n_vectors) // target_cluster_size))


def default_sample_size(n_centroids: int) -> int:
    """Training-sample rows for a given centroid count:
    ``max(DEFAULT_SAMPLE_SIZE, 16 · k)``. Without this,
    :func:`train_centroids`'s ``k = min(k, len(sample))`` silently
    caps a rule-derived k at the fixed 512-row sample the moment the
    corpus passes 128k vectors — the probed-fraction contract would
    quietly stop scaling. 16 points/cluster is deliberately lean (the
    faiss guidance is ~39×): the sample stays driver-bounded
    (≤ 16 · 4096 rows at the cap) and determinism is what the oracle
    needs; cluster QUALITY tuning belongs to an explicit
    ``sample_size``."""
    return max(DEFAULT_SAMPLE_SIZE, 16 * int(n_centroids))


def train_centroids(
    vectors: Sequence[Sequence[float]],
    n_centroids: int = 16,
    iters: int = DEFAULT_ITERS,
) -> list[list[float]]:
    """Spherical k-means (cosine objective) → ``n_centroids`` unit-norm
    centroids as plain float lists, fully deterministic."""
    X = np.asarray(vectors, dtype=np.float64)
    if X.ndim != 2 or len(X) == 0:
        raise ValueError("train_centroids: need a non-empty 2-D sample")
    k = min(n_centroids, len(X))
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    Xn = X / norms[:, None]

    # Max-min farthest-point init from the id-ordered first vector.
    chosen = [0]
    best_sim = Xn @ Xn[0]
    for _ in range(1, k):
        nxt = int(np.argmin(best_sim))
        chosen.append(nxt)
        best_sim = np.maximum(best_sim, Xn @ Xn[nxt])
    C = Xn[chosen].copy()

    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for j in range(k):
            members = Xn[assign == j]
            if len(members):
                m = members.mean(axis=0)
                nm = np.linalg.norm(m)
                if nm > 0.0:
                    C[j] = m / nm
    return [[float(x) for x in row] for row in C]


def sample_vectors(
    corpus,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = DEFAULT_SAMPLE_SIZE,
) -> list[list[float]]:
    """Deterministic training sample from a Spark DataFrame: the first
    ``sample_size`` vectors in id order. The collect is bounded by
    ``sample_size`` rows regardless of corpus size."""
    from pyspark.sql import functions as F

    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.asc(id_col))
        .limit(sample_size)
        .collect()
    )
    return [list(r[vec_col]) for r in rows]
