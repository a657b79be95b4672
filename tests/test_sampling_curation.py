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

    def test_r12_gates_compose(self, spark, docs):
        """Optional URL-dedup / blocklist / domain-cap stages: defaults
        OFF leave the base composition identical; ON they drop exactly
        the rows their standalone operators flag."""
        import pytest as _pytest
        from pyspark.sql import functions as F

        from lotad_spark.pipeline import (
            blocklist_filter,
            domain_cap,
            url_dedup,
        )

        base = {
            r.doc_id
            for r in curate_corpus(docs, None, cap_per_source=50).collect()
        }
        # give every doc a URL: ids sharing id % 7 collide on the
        # canonical form; two domains split on id % 2
        withurl = docs.withColumn(
            "url",
            F.concat(
                F.lit("https://www."),
                F.when(F.col("doc_id") % 2 == 0, F.lit("a")).otherwise(
                    F.lit("b")
                ),
                F.lit(".example.com/p/"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit("?utm_x=1"),
            ),
        )
        url_dups = {
            r.doc_id
            for r in url_dedup(withurl).filter("is_dup").collect()
        }
        got = {
            r.doc_id
            for r in curate_corpus(
                withurl, None, cap_per_source=50, url_col="url"
            ).collect()
        }
        assert got == base - url_dups
        # blocklist gate drops exactly the standalone-flagged ids
        terms = ["the"]
        blocked = {
            r.doc_id
            for r in blocklist_filter(docs, terms).filter("blocked").collect()
        }
        got_bl = {
            r.doc_id
            for r in curate_corpus(
                docs, None, cap_per_source=50, blocklist_terms=terms
            ).collect()
        }
        assert got_bl == base - blocked
        # domain cap ranks the SURVIVORS, and needs url_col
        with _pytest.raises(ValueError, match="needs url_col"):
            curate_corpus(docs, None, max_per_domain=3)
        capped_out = curate_corpus(
            withurl, None, cap_per_source=50, url_col="url",
            max_per_domain=3,
        ).collect()
        survivors = [r.doc_id for r in capped_out]
        ranked = {
            r.doc_id
            for r in domain_cap(
                withurl.join(
                    spark.createDataFrame(
                        [(i,) for i in base - url_dups], "doc_id bigint"
                    ),
                    "doc_id",
                ),
                3,
            )
            .filter("capped")
            .collect()
        }
        assert not set(survivors) & ranked
        per_domain: dict = {}
        for d in survivors:
            per_domain[d % 2] = per_domain.get(d % 2, 0) + 1
        assert all(n <= 3 for n in per_domain.values())

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


class TestMixtureSample:
    def test_per_source_rates_and_nesting(self, docs):
        from lotad_spark.pipeline import mixture_sample

        m = mixture_sample(
            docs.select("doc_id", "source"),
            {"src0": 1.0, "src1": 0.0},
            default_rate=0.5,
        )
        by_src = {
            r.source: r.n
            for r in m.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        totals = {
            r.source: r.n
            for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert by_src["src0"] == totals["src0"]  # rate 1.0 keeps all
        assert "src1" not in by_src  # rate 0.0 drops all
        # default-rate sources are the hash_sample of themselves → nested
        other = {r.doc_id for r in m.filter("source = 'src2'").collect()}
        full = {
            r.doc_id
            for r in mixture_sample(
                docs.select("doc_id", "source"), {}, default_rate=0.9
            )
            .filter("source = 'src2'")
            .collect()
        }
        assert other <= full

    def test_partitioning_invariant(self, docs):
        from lotad_spark.pipeline import mixture_sample

        rates = {"src0": 0.3, "src3": 0.7}
        a = sorted(
            r.doc_id
            for r in mixture_sample(docs.select("doc_id", "source"), rates).collect()
        )
        b = sorted(
            r.doc_id
            for r in mixture_sample(
                docs.repartition(7).select("doc_id", "source"), rates
            ).collect()
        )
        assert a == b


class TestTemperatureRates:
    def test_flattens_skew_and_caps_at_one(self, spark):
        from lotad_spark.pipeline import temperature_rates

        rows = [(i, "big") for i in range(90)] + [
            (100 + i, "small") for i in range(10)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = {r.source: r for r in temperature_rates(df, alpha=0.5).collect()}
        # α=0.5: shares ∝ sqrt(p) → big 0.75, small 0.25
        assert abs(out["big"].p_temp - 0.75) < 1e-6
        assert abs(out["small"].p_temp - 0.25) < 1e-6
        # no upsampling: the binding source (small: 10 docs for a 0.25
        # share → T = 40) keeps everything; big keeps 30/90
        assert out["small"].keep_rate == 1.0
        assert abs(out["big"].keep_rate - (30 / 90)) < 1e-6

    def test_alpha_one_is_identity_mix(self, spark):
        from lotad_spark.pipeline import temperature_rates

        rows = [(i, "a") for i in range(60)] + [(100 + i, "b") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = {r.source: r for r in temperature_rates(df, alpha=1.0).collect()}
        # α=1 keeps the raw mix: every source keeps rate 1.0
        assert out["a"].p_temp == out["a"].p_raw
        assert all(r.keep_rate == 1.0 for r in out.values())

    def test_rates_feed_mixture_sample(self, spark):
        from lotad_spark.pipeline import mixture_sample, temperature_rates

        rows = [(i, "big") for i in range(400)] + [
            (1000 + i, "small") for i in range(25)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        rates = {
            r.source: r.keep_rate
            for r in temperature_rates(df, alpha=0.3).collect()
        }
        kept = mixture_sample(df, rates)
        by = {
            r.source: r.n
            for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        # the scarce source survives whole; the head is cut toward it
        assert by["small"] == 25
        assert by["big"] < 400


class TestUpsampleByWeight:
    def test_copies_and_epochs(self, docs):
        from lotad_spark.pipeline import upsample_by_weight

        u = upsample_by_weight(
            docs.select("doc_id", "source"), {"src0": 2.0, "src1": 0.0}
        )
        per_doc = (
            u.filter("source = 'src0'")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n"), F.max("epoch").alias("mx"))
            .collect()
        )
        assert per_doc and all(r.n == 2 and r.mx == 2 for r in per_doc)
        assert u.filter("source = 'src1'").count() == 0
        # default weight 1.0: exactly one copy, epoch 1
        rest = u.filter("source = 'src2'").groupBy("doc_id").count().collect()
        assert rest and all(r["count"] == 1 for r in rest)

    def test_fractional_weight_expected_multiplicity(self, docs):
        from lotad_spark.pipeline import upsample_by_weight

        u = upsample_by_weight(docs.select("doc_id", "source"), {}, default_weight=1.5)
        n_in, n_out = docs.count(), u.count()
        assert n_in < n_out < 2 * n_in  # ~1.5× in expectation

    def test_negative_weight_rejected(self, docs):
        from lotad_spark.pipeline import upsample_by_weight

        with pytest.raises(ValueError):
            upsample_by_weight(docs, {"src0": -1.0})


class TestSlidingTokenWindows:
    @staticmethod
    def ref_windows(corpus, size, stride):
        out = []
        for d, t in corpus:
            w = [x for x in t.split() if x]
            n = len(w)
            if n == 0:
                continue
            last = max(n - size + 1, 1)
            starts = list(range(1, last + 1, stride))
            if starts[-1] != last:
                starts.append(last)
            for i, s in enumerate(starts):
                chunk = w[s - 1 : s - 1 + size]
                out.append((d, i, s, len(chunk), " ".join(chunk)))
        return sorted(out)

    CORPUS = [
        (1, "a b c d e f g h i j"),   # n=10
        (2, "a b c"),                 # shorter than size
        (3, ""),                      # no rows
        (4, "a b c d e f g"),         # tail not stride-aligned
    ]

    def test_matches_reference(self, spark):
        from lotad_spark.pipeline import sliding_token_windows

        docs = spark.createDataFrame(self.CORPUS, "doc_id bigint, text string")
        got = sorted(
            map(tuple, sliding_token_windows(docs, 4, 3).collect())
        )
        assert got == self.ref_windows(self.CORPUS, 4, 3)

    def test_full_coverage_and_overlap(self, spark):
        from lotad_spark.pipeline import sliding_token_windows

        docs = spark.createDataFrame(self.CORPUS, "doc_id bigint, text string")
        rows = sliding_token_windows(docs, 4, 3).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        # every token position covered; every window full-size (or doc len)
        for d, t in self.CORPUS:
            n = len(t.split())
            if n == 0:
                assert d not in by_doc
                continue
            covered = set()
            for r in by_doc[d]:
                assert r.n_window_tokens == min(4, n)
                covered.update(
                    range(r.start_pos, r.start_pos + r.n_window_tokens)
                )
            assert covered == set(range(1, n + 1))

    def test_rejects_nonpositive_params(self, spark):
        import pytest as _pt

        from lotad_spark.pipeline import sliding_token_windows

        docs = spark.createDataFrame(self.CORPUS, "doc_id bigint, text string")
        with _pt.raises(ValueError):
            sliding_token_windows(docs, 0, 1)
        with _pt.raises(ValueError):
            sliding_token_windows(docs, 4, 0)

    def test_no_shuffle(self, spark, sf_dir):
        from lotad_spark.pipeline import sliding_token_windows
        from lotad_spark.sources.parquet import ParquetDatabase

        docs = ParquetDatabase(spark, sf_dir, "db").table("documents")
        plan = (
            sliding_token_windows(docs, 64, 48)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestShuffleBatches:
    def test_positions_contiguous_and_batches_full(self, docs):
        from lotad_spark.pipeline import shuffle_batches

        s = shuffle_batches(docs.select("doc_id"), 64)
        n = docs.count()
        pos = sorted(r.shuffle_pos for r in s.collect())
        assert pos == list(range(n))  # exact 0..n-1, no gaps or dups
        sizes = {
            r.batch_id: r.n
            for r in s.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
        }
        full, last = divmod(n, 64)
        assert all(sizes[b] == 64 for b in range(full))
        if last:
            assert sizes[full] == last

    def test_salt_changes_permutation_not_membership(self, docs):
        from lotad_spark.pipeline import shuffle_batches

        a = shuffle_batches(docs.select("doc_id"), 64, salt="e1")
        b = shuffle_batches(docs.select("doc_id"), 64, salt="e2")
        ma = {r.doc_id: r.shuffle_pos for r in a.collect()}
        mb = {r.doc_id: r.shuffle_pos for r in b.collect()}
        assert set(ma) == set(mb)
        assert ma != mb  # different epoch → different order

    def test_no_single_partition_exchange_on_data(self, docs):
        """The rank must come from the bucketed two-phase shape: the only
        SinglePartition exchange allowed is the 256-row offsets branch
        (child is the bucket-count aggregate), never the data relation."""
        from lotad_spark.pipeline import shuffle_batches

        plan = (
            shuffle_batches(docs.select("doc_id"), 64)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "hashpartitioning(_b" in plan


class TestTokenChunkPlan:
    def test_offsets_contiguous_and_blocks_cover(self, docs):
        from lotad_spark.pipeline import token_chunk_plan

        plan = token_chunk_plan(docs.select("doc_id", "text"), 128).collect()
        rows = sorted(plan, key=lambda r: r.chunk_start)
        # offsets tile the token stream exactly: each doc starts where
        # the previous one ended
        expect = 0
        for r in rows:
            assert r.chunk_start == expect
            expect += r.n_tokens
        # block bounds consistent with offsets
        for r in rows:
            assert r.first_chunk == r.chunk_start // 128
            assert r.last_chunk == (r.chunk_start + r.n_tokens - 1) // 128
            assert r.last_chunk >= r.first_chunk

    def test_partitioning_invariant(self, docs):
        from lotad_spark.pipeline import token_chunk_plan

        a = {
            r.doc_id: r.chunk_start
            for r in token_chunk_plan(docs.select("doc_id", "text"), 64).collect()
        }
        b = {
            r.doc_id: r.chunk_start
            for r in token_chunk_plan(
                docs.repartition(13).select("doc_id", "text"), 64
            ).collect()
        }
        assert a == b


class TestChunkManifest:
    def test_blocks_assemble_to_exact_size(self, docs):
        from lotad_spark.pipeline import chunk_manifest

        m = chunk_manifest(docs.select("doc_id", "text"), 128)
        sizes = {
            r.chunk_id: r.total
            for r in m.groupBy("chunk_id")
            .agg(F.sum("slice_len").alias("total"))
            .collect()
        }
        last = max(sizes)
        assert all(sizes[c] == 128 for c in sizes if c != last)
        assert 0 < sizes[last] <= 128
        # chunk ids are contiguous from 0
        assert sorted(sizes) == list(range(last + 1))

    def test_slices_tile_each_document(self, docs):
        from lotad_spark.pipeline import chunk_manifest, token_chunk_plan

        m = chunk_manifest(docs.select("doc_id", "text"), 128).collect()
        plan = {
            r.doc_id: r.n_tokens
            for r in token_chunk_plan(docs.select("doc_id", "text"), 128).collect()
        }
        by_doc = {}
        for r in m:
            by_doc.setdefault(r.doc_id, []).append(r)
        for doc_id, rows in by_doc.items():
            rows.sort(key=lambda r: r.chunk_id)
            expect = 0
            for r in rows:
                assert r.slice_start == expect
                expect += r.slice_len
            assert expect == plan[doc_id]  # slices cover the whole doc

    def test_edge_document_shapes(self, spark):
        """Empty/whitespace docs vanish; exact-block and multi-block docs
        still tile and assemble."""
        from lotad_spark.pipeline import chunk_manifest, token_chunk_plan

        docs = spark.createDataFrame(
            [
                (1, ""),
                (2, "   "),
                (3, "tok " * 128),   # exactly one block of tokens
                (4, "word " * 300),  # spans >= 3 blocks
                (5, "single"),
            ],
            ["doc_id", "text"],
        )
        plan = {r.doc_id: r for r in token_chunk_plan(docs, 128).collect()}
        assert set(plan) == {3, 4, 5}
        assert plan[3].n_tokens == 128 and plan[4].n_tokens == 300
        total = sum(r.n_tokens for r in plan.values())
        m = chunk_manifest(docs, 128)
        sizes = {
            r.chunk_id: r.t
            for r in m.groupBy("chunk_id").agg(F.sum("slice_len").alias("t")).collect()
        }
        assert sum(sizes.values()) == total
        last = max(sizes)
        assert all(sizes[c] == 128 for c in sizes if c != last)
        # doc 4 appears in at least 3 consecutive chunks
        d4 = sorted(r.chunk_id for r in m.collect() if r.doc_id == 4)
        assert len(d4) >= 3 and d4 == list(range(d4[0], d4[-1] + 1))


class TestPlanTrainingCorpus:
    def test_end_to_end_blocks_and_epochs(self, docs, snippets):
        from lotad_spark.pipeline import curate_corpus, plan_training_corpus

        out = plan_training_corpus(
            docs,
            snippets,
            mixture_rates={"src0": 1.0, "src1": 0.25},
            upsample_weights={"src2": 2.0},
            block_size=256,
            cap_per_source=40,
            sample_rate=0.5,
        ).collect()
        assert out
        # offsets tile the packed token stream
        rows = sorted(out, key=lambda r: r.chunk_start)
        expect = 0
        for r in rows:
            assert r.chunk_start == expect
            expect += r.n_tokens
        # every src2 survivor packs exactly twice, others once
        curated = curate_corpus(
            docs, snippets, cap_per_source=40, sample_rate=0.5
        ).collect()
        kept_src2 = {r.doc_id for r in curated if r.source == "src2"}
        packs_by_doc = {}
        for r in out:
            d, _, e = r.pack_id.partition("#")
            packs_by_doc.setdefault(int(d), set()).add(int(e))
        for d, epochs in packs_by_doc.items():
            if d in kept_src2:
                assert epochs == {1, 2}
            else:
                assert epochs == {1}


class TestWeightedSample:
    def test_deterministic_across_partitionings(self, spark, docs):
        from lotad_spark.pipeline import weighted_sample

        d = docs.select("doc_id", "n_chars")
        a = sorted(
            r["doc_id"]
            for r in weighted_sample(
                d, 20, weight_col="n_chars", salt="s"
            ).collect()
        )
        b = sorted(
            r["doc_id"]
            for r in weighted_sample(
                d.repartition(7), 20, weight_col="n_chars", salt="s"
            ).collect()
        )
        assert a == b and len(a) == 20

    def test_inclusion_tracks_weight(self, spark):
        """Across many salts, a weight-10 row must be selected far more
        often than a weight-1 row (A-ES gives P ∝ w for k=1)."""
        from pyspark.sql import functions as F

        from lotad_spark.pipeline import weighted_sample

        rows = [(i, 10.0 if i < 5 else 1.0) for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id bigint, weight double")
        heavy = 0
        for s in range(30):
            got = weighted_sample(df, 1, salt=f"t{s}").collect()
            heavy += got[0]["weight"] == 10.0
        # heavy mass = 50/95 ≈ 53% of total weight; binomial(30, .53)
        # below 6 has p < 1e-4 — a loose but meaningful bound.
        assert heavy >= 6

    def test_nonpositive_weights_excluded_and_k_bounds(self, spark):
        import pytest

        from lotad_spark.pipeline import weighted_sample

        df = spark.createDataFrame(
            [(1, 2.0), (2, 0.0), (3, -1.0), (4, None)],
            "doc_id bigint, weight double",
        )
        got = weighted_sample(df, 10).collect()
        assert [r["doc_id"] for r in got] == [1]
        with pytest.raises(ValueError):
            weighted_sample(df, 0)

    def test_topk_is_take_ordered_not_global_sort(self, spark, docs):
        from lotad_spark.pipeline import weighted_sample

        d = docs.select("doc_id", "n_chars")
        plan = (
            weighted_sample(d, 5, weight_col="n_chars")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan

    def test_nan_weight_cannot_hijack_sample(self, spark):
        from lotad_spark.pipeline import weighted_sample

        df = spark.createDataFrame(
            [(1, 5.0), (2, float("nan")), (3, 500.0)],
            "doc_id bigint, weight double",
        )
        got = weighted_sample(df, 2).collect()
        assert sorted(r["doc_id"] for r in got) == [1, 3]


class TestSpanStrippedTrainingPlan:
    def test_eval_passages_excised_from_survivors(self, spark):
        """strip_eval_spans removes eval text from documents that
        survive doc-level decontamination; total planned tokens drop
        and the default plan is unchanged when off."""
        from lotad_spark.pipeline.curate import plan_training_corpus

        # english filler so the lang-id gate keeps the docs
        filler_a = " ".join(
            f"the quick word{i} of a story and it is here" for i in range(5)
        )
        filler_b = " ".join(
            f"a calm tale{i} of the sea and it is old" for i in range(5)
        )
        eval_text = (
            "alpha beta gamma delta epsilon zeta eta theta "
            "iota kappa lam mu nu xi omicron pi"
        )
        # embed only the first 7 eval tokens: containment stays under
        # the 0.5 doc-level threshold, so the doc SURVIVES doc-level
        # decontamination and span stripping must excise the fragment
        fragment = " ".join(eval_text.split()[:7])
        docs = spark.createDataFrame(
            [
                (1, f"{filler_a} {fragment} {filler_b}", "en", "web"),
                (2, f"{filler_b} clean text only here {filler_a}", "en", "web"),
            ],
            "doc_id long, text string, lang string, source string",
        )
        ev = spark.createDataFrame(
            [(900, eval_text)], "doc_id long, text string"
        )

        def total_tokens(plan):
            return sum(r.n_tokens for r in plan.select("n_tokens").collect())

        base = plan_training_corpus(
            docs, ev, min_quality=0.0, sample_rate=1.0, cap_per_source=10,
        )
        stripped = plan_training_corpus(
            docs, ev, min_quality=0.0, sample_rate=1.0, cap_per_source=10,
            strip_eval_spans=True,
        )
        n_base, n_stripped = total_tokens(base), total_tokens(stripped)
        # the 7-token eval fragment vanishes from doc 1; doc 2 untouched
        assert n_base > 0
        assert n_base - n_stripped == 7

        import pytest as _pytest

        with _pytest.raises(ValueError, match="eval_df"):
            plan_training_corpus(docs, None, strip_eval_spans=True)


class TestPackPlan:
    """No-split packing: block capacity, exactly-once coverage,
    NFD replay vs an independent Python reference, overflow honesty."""

    def _reference(self, rows, block_size, salt="pack", n_buckets=256):
        import hashlib

        width = len(format(n_buckets - 1, "x")) if n_buckets > 1 else 1
        by_bucket = {}
        out = {}
        for did, text in rows:
            n = len([t for t in (text or "").strip().split() if t])
            if n == 0:
                continue
            key = hashlib.md5(f"{salt}:{did}".encode()).hexdigest()[:8]
            if n_buckets == 16**width:
                b = key[:width]
            else:
                b = format(int(key, 16) % n_buckets, f"0{width}x")
            if n > block_size:
                out[did] = (n, None, True)
            else:
                by_bucket.setdefault(b, []).append((n, did))
        for b, docs in by_bucket.items():
            docs.sort(key=lambda t: (-t[0], t[1]))
            idx, fill, first = 0, 0, True
            for n, did in docs:
                if first:
                    fill, first = n, False
                elif fill + n <= block_size:
                    fill += n
                else:
                    idx, fill = idx + 1, n
                out[did] = (n, f"{b}-{idx}", False)
        return out

    def test_matches_reference_and_block_capacity(self, spark):
        import random

        from lotad_spark.pipeline import pack_plan

        rng = random.Random(29)
        rows = [
            (i, " ".join("w" for _ in range(rng.randint(0, 140))))
            for i in range(300)
        ]
        rows.append((300, None))
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        want = self._reference(rows, 100)
        for parts in (1, 8):
            got = {
                r.doc_id: (r.n_tokens, r.pack_id, r.overflow)
                for r in pack_plan(
                    df.repartition(parts), 100
                ).collect()
            }
            assert got == want, parts
        # block capacity: sum of tokens per pack_id <= block_size
        fills = {}
        for did, (n, pid, ov) in want.items():
            if pid is not None:
                fills[pid] = fills.get(pid, 0) + n
        assert fills and max(fills.values()) <= 100
        # overflow rows: > block, NULL pack_id, flagged
        overs = [d for d, (n, p, ov) in want.items() if ov]
        assert overs and all(want[d][0] > 100 for d in overs)
        # zero-token/NULL docs absent
        assert 300 not in want and all(
            want[d][0] > 0 for d in want
        )

    def test_small_bucket_count_mod_path(self, spark):
        from lotad_spark.pipeline import pack_plan

        rows = [(i, " ".join("w" for _ in range(i % 7 + 1))) for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        want = self._reference(rows, 12, n_buckets=10)
        got = {
            r.doc_id: (r.n_tokens, r.pack_id, r.overflow)
            for r in pack_plan(df, 12, n_buckets=10).collect()
        }
        assert got == want

    def test_validation(self, spark):
        from lotad_spark.pipeline import pack_plan

        df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
        with pytest.raises(ValueError, match="block_size"):
            pack_plan(df, 0)
        with pytest.raises(ValueError, match="n_buckets"):
            pack_plan(df, 10, n_buckets=0)

    def test_shuffle_budget_one_exchange(self, spark):
        """The documented exchange count: packing shuffles ONLY the
        (id, n_tokens, bucket) projection into buckets — exactly one
        hashpartitioning exchange in the whole plan (the overflow arm
        is a scan-side filter union, no exchange)."""
        import re

        from lotad_spark.pipeline import pack_plan

        df = spark.createDataFrame(
            [(1, "a b c"), (2, "d e")], "doc_id bigint, text string"
        )
        plan = (
            pack_plan(df, 10)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


class TestPlanTrainingCorpusNosplit:
    def test_nosplit_packing_backend(self, docs, snippets):
        from lotad_spark.pipeline import curate_corpus, plan_training_corpus

        out = plan_training_corpus(
            docs,
            snippets,
            upsample_weights={"src2": 2.0},
            block_size=200,
            cap_per_source=40,
            sample_rate=0.5,
            packing="nosplit",
            packing_buckets=4,
        ).collect()
        assert out and set(out[0].asDict()) == {
            "item_id", "n_tokens", "pack_id", "overflow",
        }
        # block capacity: no pack exceeds block_size; overflow items
        # (none expected at this block size — max doc is 100 tokens)
        # would carry NULL pack_id, never a truncation
        fills = {}
        for r in out:
            if r.overflow:
                assert r.pack_id is None and r.n_tokens > 200
            else:
                fills[r.pack_id] = fills.get(r.pack_id, 0) + r.n_tokens
        assert fills and max(fills.values()) <= 200
        # NFD actually packs: at least one block holds 2+ items
        assert len(fills) < sum(1 for r in out if not r.overflow)
        # exactly-once coverage of the upsampled item set: same items
        # as the chunk-mode plan for the same inputs
        chunk = plan_training_corpus(
            docs,
            snippets,
            upsample_weights={"src2": 2.0},
            block_size=200,
            cap_per_source=40,
            sample_rate=0.5,
        ).collect()
        assert {r.item_id for r in out} == {r.pack_id for r in chunk}
        # src2 survivors appear at two epochs here too
        curated = curate_corpus(
            docs, snippets, cap_per_source=40, sample_rate=0.5
        ).collect()
        kept_src2 = {r.doc_id for r in curated if r.source == "src2"}
        if kept_src2:
            d = next(iter(kept_src2))
            eps = {r.item_id.split("#")[1] for r in out
                   if r.item_id.split("#")[0] == str(d)}
            assert len(eps) == 2

    def test_bad_packing_value(self, docs):
        import pytest

        from lotad_spark.pipeline import plan_training_corpus

        with pytest.raises(ValueError, match="packing"):
            plan_training_corpus(docs, block_size=64, packing="bestfit")
