"""Count-min sketch: hand-replay, guarantees, mergeability, plan shape."""

import hashlib

import pytest
from pyspark.sql import functions as F

from lotad_spark.pipeline import cms_build, cms_estimate, cms_merge


def ref_bucket(tok: str, row: int, width: int) -> int:
    return int(hashlib.md5(f"{row}:{tok}".encode()).hexdigest()[:8], 16) % width


def ref_sketch(tokens, depth, width):
    grid = {}
    for t in tokens:
        for d in range(depth):
            key = (d, ref_bucket(t, d, width))
            grid[key] = grid.get(key, 0) + 1
    return grid


class TestCmsBuild:
    CORPUS = [
        (1, "spark spark join merge"),
        (2, "join the gap"),
        (3, None),
        (4, "  SPARK\tmerge  "),
    ]
    TOKENS = ["spark", "spark", "join", "merge", "join", "the", "gap",
              "spark", "merge"]

    def test_matches_reference_grid(self, spark):
        df = spark.createDataFrame(self.CORPUS, "doc_id bigint, text string")
        got = {
            (r.row, r.bucket): r.cnt
            for r in cms_build(df, depth=3, width=64).collect()
        }
        assert got == ref_sketch(self.TOKENS, 3, 64)

    def test_state_bounded_by_grid(self, spark, sf_dir):
        from lotad_spark.sources.parquet import ParquetDatabase

        docs = ParquetDatabase(spark, sf_dir, "db").table("documents")
        sk = cms_build(docs, depth=4, width=32)
        assert sk.count() <= 4 * 32

    def test_partial_aggregation_before_exchange(self, spark):
        df = spark.createDataFrame(self.CORPUS, "doc_id bigint, text string")
        plan = (
            cms_build(df)._jdf.queryExecution().executedPlan().toString()
        )
        # map-side combine: a HashAggregate below the exchange keeps the
        # shuffle at <= partitions * depth * width rows
        assert plan.index("HashAggregate") < plan.index("Exchange")


class TestCmsEstimate:
    def test_never_undercounts_and_exact_without_collisions(self, spark):
        df = spark.createDataFrame(
            TestCmsBuild.CORPUS, "doc_id bigint, text string"
        )
        exact = {}
        for t in TestCmsBuild.TOKENS:
            exact[t] = exact.get(t, 0) + 1
        sk = cms_build(df, depth=4, width=1024)
        terms = spark.createDataFrame(
            [(t,) for t in [*exact, "absent"]], "term string"
        )
        got = {
            r.term: r.est
            for r in cms_estimate(sk, terms, depth=4, width=1024).collect()
        }
        for t, c in exact.items():
            assert got[t] >= c  # the CMS guarantee
        # 5 distinct terms in a 4x1024 grid: no collisions, estimates exact
        assert got == {**exact, "absent": 0}

    def test_overcount_only_from_forced_collisions(self, spark):
        # width=1: every term shares one cell per row -> est = N for all
        df = spark.createDataFrame(
            [(1, "a b c")], "doc_id bigint, text string"
        )
        sk = cms_build(df, depth=2, width=1)
        terms = spark.createDataFrame([("a",), ("b",)], "term string")
        got = {r.term: r.est for r in cms_estimate(sk, terms, depth=2, width=1).collect()}
        assert got == {"a": 3, "b": 3}


class TestCmsMerge:
    def test_merge_equals_sketch_of_union(self, spark):
        a = spark.createDataFrame(
            [(1, "x y z x"), (2, "y")], "doc_id bigint, text string"
        )
        b = spark.createDataFrame(
            [(3, "z z q")], "doc_id bigint, text string"
        )
        merged = {
            (r.row, r.bucket): r.cnt
            for r in cms_merge(
                cms_build(a, depth=3, width=16),
                cms_build(b, depth=3, width=16),
            ).collect()
        }
        whole = {
            (r.row, r.bucket): r.cnt
            for r in cms_build(a.unionByName(b), depth=3, width=16).collect()
        }
        assert merged == whole

    def test_merge_empty_raises(self):
        with pytest.raises(ValueError):
            cms_merge()
