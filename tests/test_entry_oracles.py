"""Pure-DuckDB pins for the driver-contract oracle builders in
__spark_entry__.py — no Spark session needed. These guard the ORACLE
side of a driver row: the Spark side is pinned by the operator tests,
and scripts/check_oracle.py compares the two end-to-end at sf0.01."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

from tests.test_bpe import ref_bpe  # noqa: E402


def _docs_con(corpus):
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, '{t}')" for i, t in corpus
    )
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM (VALUES {vals}) t(doc_id, text)"
    )
    return con


class TestApplyBpeOracle:
    def test_matches_reference_on_rich_corpus(self):
        corpus = [
            (1, "low low low low low"),
            (2, "lower lower newest newest"),
            (3, "newest newest newest newest widest widest"),
            (4, "widest newest low"),
        ]
        _, vocab, _ = ref_bpe([t for _, t in corpus], 8)
        rows = _docs_con(corpus).execute(
            entry._apply_bpe_oracle(8)
        ).fetchall()
        got = {doc_id: (n, s) for doc_id, n, s in rows}
        for doc_id, text in corpus:
            expected = [s for w in text.split() for s in vocab[w]]
            assert got[doc_id] == (len(expected), " ".join(expected))

    def test_early_stop_passes_symbols_through(self):
        # A corpus with fewer learnable merges than the unroll depth:
        # the empty-round replace() must pass the symbol string through
        # (COALESCE), never NULL every document.
        corpus = [(1, "ab ab"), (2, "ab")]
        rows = _docs_con(corpus).execute(
            entry._apply_bpe_oracle(8)
        ).fetchall()
        got = {doc_id: (n, s) for doc_id, n, s in rows}
        assert got[1] == (2, "ab</w> ab</w>")
        assert got[2] == (1, "ab</w>")


class TestAnnIndexOracles:
    """Pure-DuckDB execution pins for the late-r10 ANN oracle builders
    (the Spark≡oracle value check runs in scripts/check_oracle.py)."""

    @pytest.fixture(autouse=True)
    def _sf(self, monkeypatch):
        monkeypatch.setenv(
            "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001"
        )

    def _run(self, sql):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            "'/root/testdata/sf0.001/embeddings.parquet'"
        )
        return con.execute(sql).fetchall()

    @pytest.mark.parametrize(
        "builder", ["_ann_ivfpq_residual_sql", "_ann_sq8_sql"]
    )
    def test_topk_shape(self, builder):
        rows = self._run(getattr(entry, builder)())
        # 5 queries × top-5, no self-matches, unique pairs, sims in [-1,1]
        assert len(rows) == 25
        assert len({(q, v) for q, v, _ in rows}) == 25
        assert all(q != v for q, v, _ in rows)
        assert all(-1.0 <= s <= 1.0 for _, _, s in rows)
        per_q = {}
        for q, _, _ in rows:
            per_q[q] = per_q.get(q, 0) + 1
        assert per_q == {q: 5 for q in range(5)}

    def test_residual_embeds_shared_anchor_literals(self):
        # The anchors in the SQL must come from the SAME helper the
        # Spark index build uses (pq.train_residual_models) — a drift
        # in either side breaks the literal match.
        import duckdb as d

        from lotad_spark.pipeline import kmeans, pq

        con = d.connect()
        n = con.execute(
            "SELECT count(*) FROM "
            "'/root/testdata/sf0.001/embeddings.parquet'"
        ).fetchone()[0]
        # mirror the r12 rule-derived defaults the build now uses
        k = kmeans.default_n_centroids(int(n))
        sample = [
            list(r[0])
            for r in con.execute(
                "SELECT embedding FROM "
                "'/root/testdata/sf0.001/embeddings.parquet' "
                "ORDER BY vec_id ASC "
                f"LIMIT {kmeans.default_sample_size(k)}"
            ).fetchall()
        ]
        cents = kmeans.train_centroids(sample, k)
        anchors, _ = pq.train_residual_models(sample, cents)
        sql = entry._ann_ivfpq_residual_sql()
        assert repr(anchors[0][0]) in sql
        assert repr(anchors[-1][-1]) in sql


class TestFileScanOracle:
    @pytest.mark.parametrize("fmt", ["orc", "csv", "jsonl"])
    def test_generated_from_shared_spec(self, fmt):
        # The oracle string must embed the same moduli/prefix as the
        # Spark side's spec — both read _FILE_SCAN_SPECS, so a spec
        # edit reaches both; this pins the generator wiring.
        spec = entry._FILE_SCAN_SPECS[fmt]
        sql = entry._file_scan_oracle(fmt)
        assert f"% {spec['ren_mod']} = 0" in sql
        assert f"% {spec['drop_mod']} != 0" in sql
        assert spec["prefix"] in sql
        assert ("c_acctbal" in sql) == spec["double"]


class TestHtmlTemplateParity:
    def test_python_render_matches_catalyst(self, spark):
        """_doc_html_py (r17, the WARC-fixture render) must stay
        byte-identical to _doc_html_frame's Catalyst concat — the
        DuckDB oracle replays the same _HTML_PARTS, so a divergence
        here silently splits fixture from oracle."""
        sf = "/root/testdata/sf0.001"
        frame = {
            r.doc_id: r.html
            for r in entry._doc_html_frame(spark, sf).collect()
        }
        docs = (
            entry._t(spark, sf, "documents")
            .select("doc_id", "text")
            .collect()
        )
        assert len(docs) == len(frame)
        for r in docs:
            assert entry._doc_html_py(r.doc_id, r.text) == frame[r.doc_id]

    def test_cjk_warc_phrases_roundtrip(self):
        """Every _CJK_WARC phrase must survive its Python codec
        round-trip (the oracle replay depends on decode-back ==
        injected template); the big5 phrase must carry HKSCS-only
        chars so the r17 Big5-HKSCS routing is in the checked row."""
        for label, codec, phrase in entry._CJK_WARC:
            assert phrase.encode(codec).decode(codec) == phrase, label
        big5 = dict(
            (label, (codec, phrase))
            for label, codec, phrase in entry._CJK_WARC
        )["big5"]
        assert big5[0] == "big5hkscs"
        hkscs_only = [
            ch
            for ch in big5[1]
            if not _encodable(ch, "big5")
        ]
        assert len(hkscs_only) >= 3, hkscs_only


def _encodable(ch: str, codec: str) -> bool:
    try:
        ch.encode(codec)
        return True
    except UnicodeEncodeError:
        return False
