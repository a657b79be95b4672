"""BM25 retrieval: reference parity, determinism, index face, plan pins."""

import math
import shutil
import tempfile
from decimal import Decimal

import pytest

from lotad_spark.pipeline.retrieval import (
    append_to_bm25_index,
    bm25_against_index,
    bm25_topk,
    write_bm25_index,
)

DOCS = [
    (1, "hash join beats sort merge join on small tables"),
    (2, "window agg over a sliding window of events"),
    (3, "broadcast hash join avoids the shuffle entirely"),
    (4, "sort merge join shuffles both sides by key"),
    (5, "the scan reads parquet row groups with pushdown"),
    (6, ""),  # zero-token doc: counts in avgdl, never matches
    (7, "join join join join join"),  # tf saturation case
]

QUERIES = [
    (10, "hash join"),
    (11, "window events"),
    (12, "parquet scan pushdown"),
]


def ref_bm25(docs, queries, k=5, k1=1.2, b=0.75):
    """Independent plain-Python BM25 with the operator's determinism
    contract: per-term contribution rounded to 6 decimals, summed as
    exact decimals, ties to the lowest doc_id."""
    toks = {d: t.lower().split() for d, t in docs}
    n = len(docs)
    dl = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dl.values()) / n
    df = {}
    for ts in toks.values():
        for term in set(ts):
            df[term] = df.get(term, 0) + 1
    out = {}
    for qid, q in queries:
        scores = {}
        for term in set(q.lower().split()):
            if term not in df:
                continue
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            for d, ts in toks.items():
                tf = ts.count(term)
                if not tf:
                    continue
                norm = tf + k1 * (1.0 - b + b * dl[d] / avgdl)
                c = Decimal(
                    f"{round(idf * tf * (k1 + 1.0) / norm, 6):.6f}"
                )
                scores[d] = scores.get(d, Decimal(0)) + c
        ranked = sorted(
            scores.items(), key=lambda kv: (-kv[1], kv[0])
        )[:k]
        out[qid] = [(d, float(s)) for d, s in ranked]
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    queries = spark.createDataFrame(
        QUERIES, "query_id bigint, query string"
    )
    return docs, queries


class TestBm25:
    def test_matches_reference(self, spark, frames):
        docs, queries = frames
        got = {}
        for r in bm25_topk(docs, queries, k=5).collect():
            got.setdefault(r.query_id, []).append((r.doc_id, r.score))
        want = ref_bm25(DOCS, QUERIES, k=5)
        assert got.keys() == {q for q, v in want.items() if v}
        for qid, ranked in got.items():
            assert ranked == want[qid]

    def test_topk_bound_and_tiebreak(self, spark, frames):
        docs, queries = frames
        rows = bm25_topk(docs, queries, k=2).collect()
        per_q = {}
        for r in rows:
            per_q.setdefault(r.query_id, []).append(r)
        for qid, rs in per_q.items():
            assert len(rs) <= 2
            # sorted by score desc then doc_id asc
            keys = [(-r.score, r.doc_id) for r in rs]
            assert keys == sorted(keys)

    def test_query_term_frequency_ignored(self, spark, frames):
        docs, _ = frames
        q1 = spark.createDataFrame(
            [(1, "hash join")], "query_id bigint, query string"
        )
        q2 = spark.createDataFrame(
            [(1, "hash join join hash JOIN")],
            "query_id bigint, query string",
        )
        assert (
            bm25_topk(docs, q1).collect()
            == bm25_topk(docs, q2).collect()
        )

    def test_unknown_terms_yield_no_rows(self, spark, frames):
        docs, _ = frames
        q = spark.createDataFrame(
            [(1, "zzz qqq")], "query_id bigint, query string"
        )
        assert bm25_topk(docs, q).count() == 0

    def test_empty_doc_counts_in_avgdl(self, spark, frames):
        # Dropping the empty doc changes avgdl and therefore scores —
        # pinning that avgdl follows the textbook all-docs definition.
        docs, queries = frames
        no_empty = [d for d in DOCS if d[1]]
        docs2 = spark.createDataFrame(
            no_empty, "doc_id bigint, text string"
        )
        want = ref_bm25(no_empty, QUERIES)
        got = {}
        for r in bm25_topk(docs2, queries).collect():
            got.setdefault(r.query_id, []).append((r.doc_id, r.score))
        for qid, ranked in got.items():
            assert ranked == want[qid]
        # and the two corpora disagree on at least one score
        full = ref_bm25(DOCS, QUERIES)
        assert any(full[q] != want[q] for q in want)

    def test_index_probe_equals_direct(self, spark, frames):
        docs, queries = frames
        path = tempfile.mkdtemp(prefix="lotad_bm25_")
        try:
            write_bm25_index(docs, path)
            direct = sorted(
                map(tuple, bm25_topk(docs, queries, k=5).collect())
            )
            probed = sorted(
                map(
                    tuple,
                    bm25_against_index(
                        spark, path, queries, k=5
                    ).collect(),
                )
            )
            assert probed == direct
        finally:
            shutil.rmtree(path, ignore_errors=True)

    def test_append_probe_equals_union_rebuild(self, spark, frames, tmp_path):
        """Probe after append ≡ direct BM25 over the union corpus: df
        derives at probe time, so appended docs shift every score
        exactly as a rebuild would."""
        import os

        _, queries = frames
        first = [d for d in DOCS if d[0] <= 4]
        rest = [d for d in DOCS if d[0] > 4]
        docs1 = spark.createDataFrame(first, "doc_id bigint, text string")
        docs2 = spark.createDataFrame(rest, "doc_id bigint, text string")
        path = str(tmp_path / "bm25_inc")
        write_bm25_index(docs1, path)
        pre = {}
        for root, _dirs, files in os.walk(f"{path}/postings"):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    pre[p] = os.path.getmtime(p)
        assert pre  # partitioned layout produced parquet files
        append_to_bm25_index(docs2, path)
        # existing posting files untouched
        for p, mt in pre.items():
            assert os.path.getmtime(p) == mt
        union = spark.createDataFrame(DOCS, "doc_id bigint, text string")
        direct = sorted(map(tuple, bm25_topk(union, queries, k=5).collect()))
        probed = sorted(
            map(
                tuple,
                bm25_against_index(spark, path, queries, k=5).collect(),
            )
        )
        assert probed == direct
        m = spark.read.parquet(f"{path}/meta").collect()[0]
        assert m["n_docs"] == len(DOCS)

    def test_probe_partition_prunes(self, spark, frames, tmp_path):
        """Two pins on the static bucket filter. (a) The layout + filter
        shape partition-prunes (PartitionFilters on term_bucket in the
        scan plan — asserted on the pre-checkpoint scan, because the
        probe's localCheckpoint hides its upstream plan). (b) The probe
        BEHAVIORALLY touches only the probed buckets: with every other
        partition deleted from disk, results are unchanged."""
        import shutil as _sh
        import os

        import pyspark.sql.functions as F

        from lotad_spark.pipeline.retrieval import _term_bucket_py

        docs, _ = frames
        path = str(tmp_path / "bm25_prune")
        write_bm25_index(docs, path)
        q = spark.createDataFrame(
            [(1, "hash join")], "query_id bigint, query string"
        )
        want = sorted({_term_bucket_py("hash"), _term_bucket_py("join")})
        scan_plan = (
            spark.read.parquet(f"{path}/postings")
            .filter(F.col("term_bucket").isin(want))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters" in scan_plan
        assert "term_bucket" in scan_plan.split("PartitionFilters", 1)[1]
        before = sorted(
            map(tuple, bm25_against_index(spark, path, q, k=5).collect())
        )
        assert before
        removed = 0
        for d in os.listdir(f"{path}/postings"):
            if d.startswith("term_bucket="):
                b = int(d.split("=", 1)[1])
                if b not in want:
                    _sh.rmtree(os.path.join(f"{path}/postings", d))
                    removed += 1
        assert removed  # the fixture populates other buckets
        after = sorted(
            map(tuple, bm25_against_index(spark, path, q, k=5).collect())
        )
        assert after == before

    def test_shared_query_terms_df_not_doubled(self, spark, frames, tmp_path):
        # Two queries sharing a term must not double its derived df.
        docs, _ = frames
        path = str(tmp_path / "bm25_shared")
        write_bm25_index(docs, path)
        q = spark.createDataFrame(
            [(1, "join"), (2, "join shuffle")],
            "query_id bigint, query string",
        )
        direct = sorted(map(tuple, bm25_topk(docs, q, k=5).collect()))
        probed = sorted(
            map(tuple, bm25_against_index(spark, path, q, k=5).collect())
        )
        assert probed == direct

    def test_partitioning_invariant_scores(self, spark, sf_dir):
        # Decimal-exact contribution sums: no reduction-order drift.
        from lotad_spark.sources.parquet import ParquetDatabase

        docs = ParquetDatabase(spark, sf_dir, "db").table("documents")
        queries = docs.sparkSession.createDataFrame(
            [(0, "hash join"), (1, "window scan")],
            "query_id bigint, query string",
        )
        a = sorted(map(tuple, bm25_topk(docs, queries, k=10).collect()))
        b = sorted(
            map(
                tuple,
                bm25_topk(docs.repartition(17), queries, k=10).collect(),
            )
        )
        assert a == b

    def test_cli_index_and_topk(self, spark, sf_dir, tmp_path):
        from click.testing import CliRunner

        from lotad_spark.cli import cli

        idx = str(tmp_path / "bm25_idx")
        out = str(tmp_path / "bm25_out")
        qpath = str(tmp_path / "queries.parquet")
        spark.createDataFrame(
            QUERIES, "query_id bigint, query string"
        ).coalesce(1).write.parquet(qpath)
        r = CliRunner().invoke(
            cli,
            [
                "bm25-index",
                "--docs", f"{sf_dir}/documents.parquet",
                "--output", idx,
            ],
            catch_exceptions=False,
        )
        assert r.exit_code == 0, r.output
        assert "postings ->" in r.output
        r = CliRunner().invoke(
            cli,
            [
                "bm25-topk",
                "--index", idx,
                "--queries", qpath,
                "--output", out,
                "--k", "3",
            ],
            catch_exceptions=False,
        )
        assert r.exit_code == 0, r.output
        res = spark.read.parquet(f"{out}/topk")
        assert set(res.columns) == {"query_id", "doc_id", "score"}
        assert 0 < res.count() <= 3 * len(QUERIES)

    def test_plan_broadcasts_queries_no_cartesian(self, spark, frames):
        docs, queries = frames
        plan = (
            bm25_topk(docs, queries)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan
        # decimal-exact scoring sum survives into the physical plan
        assert "decimal(18,6)" in plan.lower() or "DecimalType" in plan
