"""Deterministic sampling, contamination, and the composed curation
pipeline."""

import pyspark.sql.functions as F
import pytest

from lotad_spark.pipeline import (
    contaminated_ids,
    contamination_pairs,
    curate_corpus,
    exact_dedup_rows,
    hash_sample,
    stratified_cap,
    train_eval_split,
)
from lotad_spark.pipeline.text import tokens
from lotad_spark.sources.parquet import ParquetDatabase


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return ParquetDatabase(spark, sf_dir, "db").table("documents")


@pytest.fixture(scope="module")
def snippets(docs):
    """First-30-token snippets of every 25th doc — guaranteed containment
    hits against their source docs."""
    return docs.filter(F.col("doc_id") % 25 == 0).select(
        "doc_id",
        F.array_join(F.slice(tokens(F.col("text")), 1, 30), " ").alias("text"),
    )


class TestHashSample:
    def test_deterministic_and_partitioning_invariant(self, docs):
        a = sorted(r.doc_id for r in hash_sample(docs, 0.25).select("doc_id").collect())
        b = sorted(
            r.doc_id
            for r in hash_sample(docs.repartition(7), 0.25).select("doc_id").collect()
        )
        assert a == b and len(a) > 0

    def test_rate_zero_and_one(self, docs):
        assert hash_sample(docs, 0.0).count() == 0
        assert hash_sample(docs, 1.0).count() == docs.count()

    def test_monotone_in_rate(self, docs):
        """A row sampled at rate r stays sampled at any r' > r — the
        property that makes hash samples nest (subsample ⊂ sample)."""
        small = {r.doc_id for r in hash_sample(docs, 0.1).select("doc_id").collect()}
        big = {r.doc_id for r in hash_sample(docs, 0.4).select("doc_id").collect()}
        assert small <= big

    def test_bad_rate_rejected(self, docs):
        with pytest.raises(ValueError):
            hash_sample(docs, 1.5)


class TestTrainEvalSplit:
    def test_partition_of_corpus(self, docs):
        out = train_eval_split(docs, 0.2)
        counts = dict(
            (r.split, r.n)
            for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
        )
        assert sum(counts.values()) == docs.count()
        assert set(counts) <= {"train", "eval"} and counts.get("eval", 0) > 0

    def test_split_stable_under_corpus_growth(self, docs):
        """A document's split must not change when new rows arrive."""
        half = docs.filter(F.col("doc_id") % 2 == 0)
        full_assign = {
            r.doc_id: r.split
            for r in train_eval_split(docs, 0.2).select("doc_id", "split").collect()
        }
        half_assign = {
            r.doc_id: r.split
            for r in train_eval_split(half, 0.2).select("doc_id", "split").collect()
        }
        assert all(full_assign[d] == s for d, s in half_assign.items())


class TestStratifiedCap:
    def test_cap_respected_and_deterministic(self, docs):
        out = stratified_cap(docs, "source", 5)
        per = out.groupBy("source").agg(F.count("*").alias("n")).collect()
        assert per and all(r.n <= 5 for r in per)
        again = stratified_cap(docs.repartition(13), "source", 5)
        assert sorted(r.doc_id for r in out.select("doc_id").collect()) == sorted(
            r.doc_id for r in again.select("doc_id").collect()
        )

    def test_priority_keeps_best(self, docs):
        """With a priority column, every kept row dominates (or ties) every
        dropped row of the same group."""
        out = stratified_cap(docs, "source", 3, priority=F.col("n_chars"))
        kept = out.groupBy("source").agg(F.min("n_chars").alias("kmin"))
        dropped = docs.join(out.select("doc_id"), "doc_id", "left_anti")
        worst_kept = {r.source: r.kmin for r in kept.collect()}
        for r in dropped.groupBy("source").agg(F.max("n_chars").alias("dmax")).collect():
            assert r.dmax <= worst_kept[r.source]

    def test_window_group_limit_in_plan(self, docs):
        """Spark ≥3.5 must plan rank≤k as WindowGroupLimit (map-side
        partial top-k before the exchange) — the property that makes the
        window shape THE scale shape for per-group caps."""
        out = stratified_cap(docs, "source", 5)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan, plan


class TestExactDedupRows:
    def test_keeps_min_id_full_row(self, spark):
        df = spark.createDataFrame(
            [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")],
            ["doc_id", "text", "extra"],
        )
        out = {(r.doc_id, r.extra) for r in exact_dedup_rows(df).collect()}
        assert out == {(1, "x"), (3, "z")}


class TestContamination:
    def test_snippet_fully_contained_in_source(self, docs, snippets):
        pairs = contamination_pairs(docs, snippets, threshold=0.5)
        hits = {
            (r.train_id, r.eval_id): r.containment for r in pairs.collect()
        }
        # Every snippet long enough to shingle must be found inside its own
        # source doc with containment exactly 1.0.
        long_enough = {
            r.doc_id
            for r in snippets.filter(F.size(tokens(F.col("text"))) >= 3)
            .select("doc_id")
            .collect()
        }
        assert long_enough
        for eid in long_enough:
            assert hits.get((eid, eid)) == pytest.approx(1.0)

    def test_threshold_filters(self, docs, snippets):
        lo = contamination_pairs(docs, snippets, threshold=0.5).count()
        hi = contamination_pairs(docs, snippets, threshold=0.99).count()
        assert hi <= lo

    def test_contaminated_ids_distinct(self, docs, snippets):
        ids = contaminated_ids(docs, snippets, threshold=0.5)
        rows = [r.train_id for r in ids.collect()]
        assert len(rows) == len(set(rows)) and len(rows) > 0

    def test_eval_side_broadcast(self, docs, snippets):
        """The eval shingles must join broadcast — the 100 TB train side
        is never shuffled by shingle."""
        pairs = contamination_pairs(docs, snippets, threshold=0.5)
        pairs.collect()
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan


class TestCurateCorpus:
    def test_end_to_end_properties(self, docs, snippets):
        out = curate_corpus(
            docs, snippets, cap_per_source=10, sample_rate=1.0
        )
        rows = out.collect()
        assert rows
        # Cap respected per source.
        by_source = {}
        for r in rows:
            by_source[r.source] = by_source.get(r.source, 0) + 1
        assert all(n <= 10 for n in by_source.values())
        # Gate respected.
        assert all(r.quality >= 0.5 and r.n_tokens >= 5 for r in rows)
        # No contaminated doc survives.
        bad = {
            r.train_id
            for r in contaminated_ids(docs, snippets, threshold=0.5).collect()
        }
        assert not bad & {r.doc_id for r in rows}

    def test_sampling_nests(self, docs):
        full = {
            r.doc_id
            for r in curate_corpus(docs, None, cap_per_source=10,
                                   sample_rate=1.0).collect()
        }
        half = {
            r.doc_id
            for r in curate_corpus(docs, None, cap_per_source=10,
                                   sample_rate=0.5).collect()
        }
        assert half <= full and half < full
