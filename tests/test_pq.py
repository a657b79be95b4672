"""Product-quantization ANN (pipeline/pq.py): determinism, plan shape,
reconstruction accuracy, and the encoded-index scan contract."""

import hashlib

import pytest
from pyspark.sql import functions as F

from lotad_spark.pipeline.pq import (
    LUT_SCALE,
    pq_dcc_lut,
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)


def _vec(i, dim=8):
    h = hashlib.md5(f"v{i}".encode()).digest()
    return [h[d % 16] / 255.0 * 2 - 1 + 0.01 * i * (d % 3) for d in range(dim)]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in range(40)],
        "vec_id long, embedding array<double>",
    )


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


class TestPqTraining:
    def test_deterministic_and_shaped(self, corpus):
        b1 = train_pq_codebooks(corpus, m=4, n_codes=8)
        b2 = train_pq_codebooks(corpus, m=4, n_codes=8)
        assert b1 == b2
        assert len(b1) == 4
        assert all(len(book) == 8 for book in b1)
        assert all(len(cv) == 2 for book in b1 for cv in book)

    def test_dim_not_divisible_raises(self, corpus):
        with pytest.raises(ValueError, match="divisible"):
            train_pq_codebooks(corpus, m=3)


class TestPqEncode:
    def test_projection_is_shuffle_free(self, corpus):
        books = train_pq_codebooks(corpus, m=4, n_codes=8)
        plan = _plan(pq_encode(corpus, books))
        assert "Exchange" not in plan

    def test_codes_in_range(self, corpus):
        books = train_pq_codebooks(corpus, m=4, n_codes=8)
        rows = pq_encode(corpus, books).select("pq_code").collect()
        assert len(rows) == 40
        for r in rows:
            assert len(r.pq_code) == 4
            assert all(0 <= c < 8 for c in r.pq_code)


class TestPqTopk:
    def test_exact_when_reconstruction_is_lossless(self, spark, corpus):
        """With n_codes >= sample size every sample point becomes its own
        sub-centroid (farthest-point init enumerates all points; Lloyd's
        keeps singleton means), so the PQ reconstruction is EXACT and
        sim must equal the true round-6 cosine up to the 10^-6 integer
        quantization of the lookup tables."""
        from lotad_spark.pipeline.similarity import cosine_topk

        books = train_pq_codebooks(corpus, m=4, n_codes=64)
        q = corpus.filter(F.col("vec_id") < 3)
        got = {
            (r.query_id, r.vec_id): r.sim
            for r in pq_topk(q, corpus, books, k=5).collect()
        }
        exact = {
            (r.query_id, r.vec_id): r.sim
            for r in cosine_topk(q, corpus, k=5).collect()
        }
        assert set(got) == set(exact)
        for key, sim in got.items():
            assert abs(sim - exact[key]) <= 2e-6, (key, sim, exact[key])

    def test_excludes_self_and_shapes(self, corpus):
        books = train_pq_codebooks(corpus, m=4, n_codes=8)
        q = corpus.filter(F.col("vec_id") < 2)
        out = pq_topk(q, corpus, books, k=3)
        assert out.columns == ["query_id", "vec_id", "sim"]
        rows = out.collect()
        assert len(rows) == 6
        assert all(r.query_id != r.vec_id for r in rows)

    def test_deterministic_across_runs(self, corpus):
        books = train_pq_codebooks(corpus, m=4, n_codes=8)
        q = corpus.filter(F.col("vec_id") < 3)
        a = sorted(map(tuple, pq_topk(q, corpus, books, k=4).collect()))
        b = sorted(map(tuple, pq_topk(q, corpus, books, k=4).collect()))
        assert a == b

    def test_encoded_index_never_reads_embeddings(
        self, spark, corpus, tmp_path
    ):
        """The serving shape: scoring a pre-encoded corpus must scan
        ONLY (vec_id, pq_code) — the embedding column stays out of the
        parquet ReadSchema entirely (at 100 TB that is the difference
        between scanning a few bytes/row of codes and the full vector
        column)."""
        books = train_pq_codebooks(corpus, m=4, n_codes=8)
        path = str(tmp_path / "pq_index")
        pq_encode(corpus, books).write.parquet(path)
        enc = spark.read.parquet(path)
        q = corpus.filter(F.col("vec_id") < 2)
        out = pq_topk(q, corpus, books, k=3, encoded=enc)
        # the only file scan in the plan is the encoded index (the query
        # side is an in-memory relation), so every ReadSchema is its
        scans = [
            line
            for line in _plan(out).splitlines()
            if "ReadSchema" in line
        ]
        assert scans
        for scan in scans:
            assert "pq_code" in scan and "embedding" not in scan, scan
        assert out.count() == 6

    def test_string_query_ids(self, spark, corpus):
        """The serving relations key on the CALLER'S id type — a string
        (uuid-style) query id must flow through the LUT relation and the
        output unchanged, not raise at createDataFrame (r10 advice)."""
        books = train_pq_codebooks(corpus, m=4, n_codes=8)
        q = corpus.filter(F.col("vec_id") < 2).select(
            F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"),
            "embedding",
        )
        # corpus keeps bigint ids; self-exclusion compares query_id to
        # the corpus id, so cast the corpus side to match
        c = corpus.select(
            F.col("vec_id").cast("string").alias("vec_id"), "embedding"
        )
        rows = pq_topk(q, c, books, k=3).collect()
        assert len(rows) == 6
        assert {r.query_id for r in rows} == {"doc-0", "doc-1"}

    def test_dcc_lut_matches_scale(self):
        books = [[[1.0, 2.0], [0.5, 0.0]]]
        assert pq_dcc_lut(books) == [
            [int(5.0 * LUT_SCALE), int(0.25 * LUT_SCALE)]
        ]


class TestArrowEncodeKernel:
    def test_arrow_matches_expr(self, corpus):
        """The vectorized encode kernel must produce the same codes as
        the deterministic expression kernel (divergence is bounded to
        exact round-6 half boundaries — empirically empty here, as for
        the assignment kernels)."""
        books = train_pq_codebooks(corpus, m=4, n_codes=8)
        expr = {
            r.vec_id: list(r.pq_code)
            for r in pq_encode(corpus, books).collect()
        }
        arrow = {
            r.vec_id: list(r.pq_code)
            for r in pq_encode(corpus, books, kernel="arrow").collect()
        }
        assert expr == arrow and len(expr) == 40

    def test_unknown_kernel_raises(self, corpus):
        books = train_pq_codebooks(corpus, m=4, n_codes=8)
        with pytest.raises(ValueError, match="kernel"):
            pq_encode(corpus, books, kernel="bogus")


class TestPqCli:
    def test_index_and_topk_commands(self, spark, corpus, tmp_path):
        from click.testing import CliRunner

        from lotad_spark.cli import cli

        src = str(tmp_path / "emb")
        corpus.write.mode("overwrite").parquet(src)
        idx = str(tmp_path / "idx")
        r1 = CliRunner().invoke(
            cli,
            [
                "pq-index", "--embeddings", src, "--output", idx,
                "--centroids", "4", "--subspaces", "4", "--codes", "8",
            ],
        )
        assert r1.exit_code == 0, r1.output
        assert "40 vectors encoded" in r1.output
        out = str(tmp_path / "out")
        r2 = CliRunner().invoke(
            cli,
            [
                "pq-topk", "--index", idx, "--queries", src,
                "--output", out, "--k", "3", "--nprobe", "2",
            ],
        )
        assert r2.exit_code == 0, r2.output
        landed = spark.read.parquet(f"{out}/topk")
        assert landed.columns == ["query_id", "vec_id", "sim"]
        assert landed.count() == 40 * 3


class TestIvfPq:
    def test_build_probe_prunes_and_scans_codes_only(
        self, spark, corpus, tmp_path
    ):
        """The IVF-PQ layout must serve probes off a STATIC
        partition-filtered scan of (id, codes): only the probed
        cent_id partitions are touched and the embedding column never
        appears in the index ReadSchema."""
        from lotad_spark.pipeline.pq import build_ivf_pq_index, ivf_pq_topk

        path = str(tmp_path / "ivfpq")
        build_ivf_pq_index(
            corpus, path, n_centroids=4, m=4, n_codes=8
        )
        q = corpus.filter(F.col("vec_id") < 2)
        out = ivf_pq_topk(spark, path, q, k=3, nprobe=1)
        rows = out.collect()
        assert len(rows) == 6
        assert all(r.query_id != r.vec_id for r in rows)
        plan = _plan(out)
        # the only file scan in the output plan is the index data dir
        # (centroids/codebooks were collected during planning)
        data_scans = [
            line for line in plan.splitlines() if "ReadSchema" in line
        ]
        assert data_scans
        for line in data_scans:
            assert "pq_code" in line and "embedding" not in line, line
            assert "PartitionFilters" in line and "cent_id" in line, line

    def test_residual_scoring_matches_independent_replay(
        self, spark, corpus, tmp_path
    ):
        """The IVFADC arithmetic, replayed bit-for-bit from the index
        artifacts alone: sim(q, v̂=a+r̂) where every term is a scaled
        integer — ip = ⟨q,a⟩·S + Σ lut, |v̂|²·S = |a|²·S + 2Σ⟨a,r̂⟩ + Σdcc.
        Every returned sim must equal the replay exactly, and each
        query's sims must be the top-k of the full replayed score set."""
        import numpy as np

        from lotad_spark.pipeline.pq import (
            _quantized_luts,
            build_ivf_pq_index,
            fold_dot,
            ivf_pq_topk,
            self_dot,
        )

        path = str(tmp_path / "ivfpq_res")
        build_ivf_pq_index(
            corpus, path, n_centroids=4, m=4, n_codes=8, residual=True
        )
        cb = spark.read.parquet(f"{path}/codebooks").collect()
        books = [[], [], [], []]
        for r in sorted(cb, key=lambda r: (r["m"], r["code"])):
            books[r["m"]].append([float(x) for x in r["cv"]])
        anchors = {
            int(r["cent_id"]): [float(x) for x in r["anchor_vec"]]
            for r in spark.read.parquet(f"{path}/anchors").collect()
        }
        data = {
            int(r["vec_id"]): (list(r["pq_code"]), int(r["cent_id"]))
            for r in spark.read.parquet(f"{path}/data").collect()
        }
        dcc = pq_dcc_lut(books)
        sub = len(books[0][0])
        qrows = corpus.filter(F.col("vec_id") < 3).collect()
        expected = {}
        for qr in qrows:
            qid, qv = int(qr["vec_id"]), [float(x) for x in qr["embedding"]]
            luts, q2 = _quantized_luts(qv, books)
            for vid, (code, cid) in data.items():
                if vid == qid:
                    continue
                a = anchors[cid]
                qc = int(np.round(fold_dot(qv, a) * LUT_SCALE))
                c2 = int(np.round(self_dot(a) * LUT_SCALE))
                cdot = sum(
                    int(np.round(
                        fold_dot(a[j * sub:(j + 1) * sub], books[j][code[j]])
                        * LUT_SCALE))
                    for j in range(4)
                )
                ip = qc + sum(luts[j][code[j]] for j in range(4))
                vn = c2 + 2 * cdot + sum(dcc[j][code[j]] for j in range(4))
                expected[(qid, vid)] = round(
                    (ip / LUT_SCALE) / np.sqrt(q2 * (vn / LUT_SCALE)), 6
                )
        out = ivf_pq_topk(
            spark, path, corpus.filter(F.col("vec_id") < 3), k=4, nprobe=4
        ).collect()
        assert len(out) == 12
        by_q = {}
        for r in out:
            assert r["sim"] == pytest.approx(
                expected[(int(r["query_id"]), int(r["vec_id"]))], abs=0
            )
            by_q.setdefault(int(r["query_id"]), []).append(float(r["sim"]))
        for qid, sims in by_q.items():
            full = sorted(
                (s for (q, _), s in expected.items() if q == qid),
                reverse=True,
            )
            assert sorted(sims, reverse=True) == full[:4]

    def test_residual_beats_plain_on_clustered_corpus(self, spark, tmp_path):
        """On a clustered corpus (the realistic embedding shape) the
        residual codes must recall at least as well as plain codes at
        every nprobe — the IVFADC premise. Deterministic fixture, so
        the comparison is stable."""
        import numpy as np

        from lotad_spark.pipeline.pq import build_ivf_pq_index, ivf_pq_topk

        rng = np.random.default_rng(7)
        centers = rng.normal(0, 1.0, (8, 8))
        pts = [
            (i, (centers[i % 8] + rng.normal(0, 0.2, 8)).tolist())
            for i in range(200)
        ]
        emb = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
        V = {i: np.asarray(v) for i, v in pts}
        Mn = np.stack([V[i] / np.linalg.norm(V[i]) for i in sorted(V)])
        qids = list(range(10))
        truth = {}
        for qid in qids:
            sims = Mn @ (V[qid] / np.linalg.norm(V[qid]))
            truth[qid] = set(
                [i for i in np.argsort(-sims) if i != qid][:5]
            )
        qdf = emb.filter(F.col("vec_id") < 10)
        recalls = {}
        for resid in (False, True):
            path = str(tmp_path / f"ivfpq_{resid}")
            build_ivf_pq_index(
                emb, path, n_centroids=4, m=4, n_codes=8, residual=resid
            )
            got = {}
            for r in ivf_pq_topk(spark, path, qdf, k=5, nprobe=4).collect():
                got.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
            recalls[resid] = np.mean(
                [len(got.get(q, set()) & truth[q]) / 5 for q in qids]
            )
        assert recalls[True] >= recalls[False], recalls

    def test_residual_probe_still_prunes_partitions(
        self, spark, corpus, tmp_path
    ):
        """The residual path must keep the serving contract: static
        cent_id partition filter, codes-only ReadSchema."""
        from lotad_spark.pipeline.pq import build_ivf_pq_index, ivf_pq_topk

        path = str(tmp_path / "ivfpq_res_plan")
        build_ivf_pq_index(
            corpus, path, n_centroids=4, m=4, n_codes=8, residual=True
        )
        out = ivf_pq_topk(
            spark, path, corpus.filter(F.col("vec_id") < 2), k=3, nprobe=1
        )
        assert len(out.collect()) == 6
        plan = _plan(out)
        data_scans = [
            line for line in plan.splitlines() if "ReadSchema" in line
        ]
        assert data_scans
        for line in data_scans:
            assert "pq_code" in line and "embedding" not in line, line
            assert "PartitionFilters" in line and "cent_id" in line, line

    def test_pre_meta_layout_reads_as_plain(self, spark, corpus, tmp_path):
        """An index written before the meta file existed must keep
        serving as a plain (non-residual) layout."""
        import shutil

        from lotad_spark.pipeline.pq import build_ivf_pq_index, ivf_pq_topk

        path = str(tmp_path / "ivfpq_premeta")
        build_ivf_pq_index(corpus, path, n_centroids=4, m=4, n_codes=8)
        with_meta = sorted(
            map(tuple, ivf_pq_topk(
                spark, path, corpus.filter(F.col("vec_id") < 2), k=3
            ).collect())
        )
        shutil.rmtree(f"{path}/meta")
        without_meta = sorted(
            map(tuple, ivf_pq_topk(
                spark, path, corpus.filter(F.col("vec_id") < 2), k=3
            ).collect())
        )
        assert with_meta == without_meta

    @pytest.mark.parametrize("residual", [False, True])
    def test_append_serves_new_vectors_and_freezes_old_scores(
        self, spark, corpus, tmp_path, residual
    ):
        """Appending must (a) leave every existing data file untouched,
        (b) make the new vectors retrievable, and (c) keep every
        previously-served (query, old-vector) score byte-identical —
        stored centroids/anchors/codebooks never change."""
        import glob
        import os

        from lotad_spark.pipeline.pq import (
            append_to_ivf_pq_index,
            build_ivf_pq_index,
            ivf_pq_topk,
        )

        path = str(tmp_path / f"ivfpq_app_{residual}")
        build_ivf_pq_index(
            corpus, path, n_centroids=4, m=4, n_codes=8, residual=residual
        )
        files_before = {
            f: os.path.getmtime(f)
            for f in glob.glob(f"{path}/data/**/*.parquet", recursive=True)
        }
        q = corpus.filter(F.col("vec_id") < 2)
        before = {
            (r.query_id, r.vec_id): r.sim
            for r in ivf_pq_topk(spark, path, q, k=30, nprobe=4).collect()
        }
        # duplicates of existing vectors under new ids: their codes are
        # forced identical, so they MUST surface as reconstruction ties
        dup = corpus.filter(F.col("vec_id") >= 35).select(
            (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
        )
        append_to_ivf_pq_index(dup, path)
        for f, mtime in files_before.items():
            assert os.path.getmtime(f) == mtime, f"rewrote {f}"
        after_rows = ivf_pq_topk(spark, path, q, k=35, nprobe=4).collect()
        after = {(r.query_id, r.vec_id): r.sim for r in after_rows}
        for key, sim in before.items():
            assert after[key] == sim, key
        new_ids = {vid for (_, vid) in after if vid >= 1000}
        assert new_ids == {1035, 1036, 1037, 1038, 1039}
        for (qid, vid), sim in after.items():
            if vid >= 1000:
                assert sim == after[(qid, vid - 1000)]

    def test_probe_matches_full_pq_when_probing_everything(
        self, spark, corpus, tmp_path
    ):
        """nprobe == n_centroids must reduce IVF-PQ to plain PQ over the
        whole corpus (same codebooks, same scoring) — the recall knob
        only drops buckets, never changes arithmetic."""
        from lotad_spark.pipeline.pq import build_ivf_pq_index, ivf_pq_topk

        path = str(tmp_path / "ivfpq_all")
        build_ivf_pq_index(corpus, path, n_centroids=4, m=4, n_codes=8)
        cb = spark.read.parquet(f"{path}/codebooks").collect()
        books = [[], [], [], []]
        for r in sorted(cb, key=lambda r: (r["m"], r["code"])):
            books[r["m"]].append(list(r["cv"]))
        q = corpus.filter(F.col("vec_id") < 3)
        via_ivf = sorted(
            map(tuple, ivf_pq_topk(spark, path, q, k=4, nprobe=4).collect())
        )
        via_pq = sorted(
            map(tuple, pq_topk(q, corpus, books, k=4).collect())
        )
        assert via_ivf == via_pq
