"""Similarity-search operator semantics (cosine top-k, IVF)."""

import math

import pytest

from lotad_spark.pipeline.similarity import cosine_topk, ivf_topk


@pytest.fixture(scope="module")
def vectors(spark):
    # 0/1 are near-identical; 2 is orthogonal-ish to them; 3 is opposite of 0.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
        (4, [0.7, 0.7, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestCosineTopk:
    def test_neighbor_order(self, vectors):
        got = cosine_topk(vectors.filter("vec_id = 0"), vectors, k=4).collect()
        ids = [r.vec_id for r in got]
        assert ids == [1, 4, 2, 3]  # descending similarity
        sims = [r.sim for r in got]
        assert sims == sorted(sims, reverse=True)
        assert math.isclose(sims[0], 0.99995, abs_tol=1e-4)
        assert got[0].query_id == 0

    def test_excludes_self(self, vectors):
        got = cosine_topk(vectors, vectors, k=4).collect()
        assert all(r.query_id != r.vec_id for r in got)

    def test_k_limits(self, vectors):
        got = cosine_topk(vectors.filter("vec_id = 0"), vectors, k=2).collect()
        assert len(got) == 2


class TestIvfTopk:
    def test_matches_exact_on_small_corpus(self, spark, sf_dir):
        from lotad_spark.sources.parquet import ParquetDatabase

        e = ParquetDatabase(spark, sf_dir, "db").table("embeddings")
        q = e.filter("vec_id < 2")
        exact = {
            (r.query_id, r.vec_id)
            for r in cosine_topk(q, e, k=3).collect()
        }
        approx = {
            (r.query_id, r.vec_id)
            for r in ivf_topk(q, e, k=3, n_centroids=4, nprobe=4).collect()
        }
        # nprobe == n_centroids → IVF degenerates to exact search.
        assert approx == exact

    def test_probe_restricts_buckets(self, spark, sf_dir):
        from lotad_spark.sources.parquet import ParquetDatabase

        e = ParquetDatabase(spark, sf_dir, "db").table("embeddings")
        q = e.filter("vec_id < 2")
        got = ivf_topk(q, e, k=3, n_centroids=8, nprobe=1).collect()
        assert len(got) <= 6
        assert all(r.query_id != r.vec_id for r in got)
