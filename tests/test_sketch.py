"""Sketches (count-min, Bloom): hand-replay, guarantees, merge laws."""

import hashlib

import pytest
from pyspark.sql import functions as F

from lotad_spark.pipeline import (
    bloom_build,
    bloom_contains,
    cms_build,
    cms_estimate,
    cms_merge,
)


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


def ref_bloom(tokens, n_bits, n_hashes):
    words = {}
    for t in tokens:
        for d in range(n_hashes):
            pos = ref_bucket(t, d, n_bits)
            w, b = pos // 32, pos % 32
            words[w] = words.get(w, 0) | (1 << b)
    return words


class TestBloom:
    def test_matches_reference_words(self, spark):
        df = spark.createDataFrame(
            TestCmsBuild.CORPUS, "doc_id bigint, text string"
        )
        got = {
            r.word: r.bits
            for r in bloom_build(df, n_bits=256, n_hashes=3).collect()
        }
        assert got == ref_bloom(TestCmsBuild.TOKENS, 256, 3)

    def test_no_false_negatives_ever(self, spark, sf_dir):
        from lotad_spark.sources.parquet import ParquetDatabase

        docs = ParquetDatabase(spark, sf_dir, "db").table("documents")
        bloom = bloom_build(docs)
        # every distinct token actually in the stream must test present
        from lotad_spark.pipeline.sketch import _token_stream

        vocab = _token_stream(docs, "text").distinct().select(
            F.col("_tok").alias("term")
        )
        out = bloom_contains(bloom, vocab)
        assert out.filter(~F.col("present")).isEmpty()
        assert bloom.count() <= 8192 // 32

    def test_absent_and_forced_false_positive(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta")], "doc_id bigint, text string"
        )
        # roomy filter: an absent term is (with these sizes) not present
        bloom = bloom_build(df, n_bits=4096, n_hashes=4)
        terms = spark.createDataFrame(
            [("alpha",), ("gamma-not-in-stream",)], "term string"
        )
        got = {
            r.term: r.present
            for r in bloom_contains(
                bloom, terms, n_bits=4096, n_hashes=4
            ).collect()
        }
        assert got["alpha"] is True
        assert got["gamma-not-in-stream"] is False
        # n_bits=32 → one word saturates → EVERYTHING reads present:
        # the false-positive face, deterministic given the hashes
        tiny = bloom_build(df, n_bits=32, n_hashes=4)
        got2 = {
            r.term: r.present
            for r in bloom_contains(
                tiny, terms, n_bits=32, n_hashes=4
            ).collect()
        }
        assert got2["alpha"] is True  # guarantee holds even saturated

    def test_merge_equals_bloom_of_union(self, spark):
        a = spark.createDataFrame(
            [(1, "x y z")], "doc_id bigint, text string"
        )
        b = spark.createDataFrame(
            [(2, "z q")], "doc_id bigint, text string"
        )
        from lotad_spark.pipeline.sketch import bloom_merge

        merged = {
            r.word: r.bits
            for r in bloom_merge(
                bloom_build(a, n_bits=256), bloom_build(b, n_bits=256)
            ).collect()
        }
        whole = {
            r.word: r.bits
            for r in bloom_build(a.unionByName(b), n_bits=256).collect()
        }
        assert merged == whole

    def test_partial_aggregation_before_exchange(self, spark):
        df = spark.createDataFrame(
            TestCmsBuild.CORPUS, "doc_id bigint, text string"
        )
        plan = (
            bloom_build(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.index("HashAggregate") < plan.index("Exchange")


class TestBloomPrefilter:
    def test_output_identical_even_with_forced_false_positives(self, spark):
        """Composed in front of the exact containment check, the
        prefilter must NEVER change the output — even with a tiny,
        saturated filter (worst-case false positives)."""
        from lotad_spark.pipeline import contamination_pairs

        train = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "unrelated text about spark physical plans here"),
                (3, "quick brown fox jumps over something else today"),
            ],
            "doc_id bigint, text string",
        )
        ev = spark.createDataFrame(
            [(100, "quick brown fox jumps over")],
            "doc_id bigint, text string",
        )
        exact = sorted(
            map(tuple, contamination_pairs(train, ev, threshold=0.4).collect())
        )
        for bits in (64, 4096):  # saturated and roomy
            pre = sorted(
                map(
                    tuple,
                    contamination_pairs(
                        train, ev, threshold=0.4,
                        prefilter="bloom", prefilter_bits=bits,
                    ).collect(),
                )
            )
            assert pre == exact, bits
        assert exact  # the fixture really contains a contaminated pair

    def test_prefilter_keeps_might_members_only(self, spark):
        from lotad_spark.pipeline import bloom_build_terms, bloom_prefilter

        ev = spark.createDataFrame(
            [("a b c",), ("d e f",)], "shingle string"
        )
        corpus = spark.createDataFrame(
            [(1, "a b c"), (2, "x y z"), (3, "d e f")],
            "doc_id bigint, shingle string",
        )
        bloom = bloom_build_terms(ev, "shingle", n_bits=4096)
        kept = {
            r.doc_id
            for r in bloom_prefilter(
                corpus, bloom, "shingle", n_bits=4096
            ).collect()
        }
        assert kept == {1, 3}

    def test_prefilter_adds_no_shuffle_on_the_corpus_side(self, spark):
        """The membership test must live INSIDE the corpus scan stage:
        the only exchanges in the prefiltered plan are the ones the
        bloom AGGREGATION itself needs (grid-bounded), never a shuffle
        keyed by the probed column."""
        from lotad_spark.pipeline import bloom_build_terms, bloom_prefilter

        ev = spark.createDataFrame([("a b c",)], "shingle string")
        corpus = spark.createDataFrame(
            [(1, "a b c")], "doc_id bigint, shingle string"
        )
        bloom = bloom_build_terms(ev, "shingle")
        plan = (
            bloom_prefilter(corpus, bloom, "shingle")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        import re

        keys = re.findall(r"hashpartitioning\((\w+)", plan)
        assert all(k.startswith("word") for k in keys), keys

    def test_null_terms_dropped_and_prefilter_survives(self, spark):
        """A NULL in the term column must not poison the filter: it
        hashes to a NULL position and would surface as a null map key
        inside bloom_prefilter (r11 review finding)."""
        from lotad_spark.pipeline import bloom_build_terms, bloom_prefilter

        ev = spark.createDataFrame(
            [("a b c",), (None,), ("d e f",)], "shingle string"
        )
        bloom = bloom_build_terms(ev, "shingle", n_bits=4096)
        assert not any(r.word is None for r in bloom.collect())
        corpus = spark.createDataFrame(
            [(1, "a b c"), (2, "zzz"), (3, None)],
            "doc_id bigint, shingle string",
        )
        kept = {
            r.doc_id
            for r in bloom_prefilter(
                corpus, bloom, "shingle", n_bits=4096
            ).collect()
        }
        assert kept == {1}  # NULL probe row: NULL checks -> filtered out
