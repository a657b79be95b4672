"""Exact duplicate-substring span detection (pipeline/spandedup.py)."""

import pytest
from pyspark.sql import functions as F

from lotad_spark.pipeline.spandedup import (
    duplicate_spans,
    positional_ngrams,
    strip_duplicate_spans,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (2, "intro words then the quick brown fox jumps over the lazy dog ends here"),
    (3, "totally unrelated text with nothing shared at all among these words"),
    (4, ""),
    (5, "short doc"),
    (6, "aa bb cc dd ee ff aa bb cc dd ee ff tail"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


class TestPositionalNgrams:
    def test_positions_and_counts(self, spark, corpus):
        rows = positional_ngrams(corpus, n=6).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r.pos)
        # doc 1 has 14 tokens -> 9 hexagrams at pos 0..8
        assert sorted(by_doc[1]) == list(range(9))
        # short / empty docs emit nothing
        assert 4 not in by_doc and 5 not in by_doc

    def test_gram_hash_is_16_hex(self, spark, corpus):
        r = positional_ngrams(corpus, n=6).first()
        assert len(r.gh) == 16
        int(r.gh, 16)  # parses as hex


class TestDuplicateSpans:
    def test_cross_doc_shared_passage(self, spark, corpus):
        spans = {
            r.doc_id: (r.span_start, r.span_end, r.n_dup_grams)
            for r in duplicate_spans(corpus, n=6).collect()
        }
        # the 9-token shared passage: tokens 0..8 of doc1, 3..11 of doc2
        assert spans[1] == (0, 8, 4)
        assert spans[2] == (3, 11, 4)
        # self-repetition inside one doc is found too
        assert spans[6] == (0, 11, 2)
        # unrelated / empty / short docs have no spans
        assert 3 not in spans and 4 not in spans and 5 not in spans

    def test_spans_are_maximal(self, spark, corpus):
        # islands merged: no two spans of one doc overlap or touch
        rows = duplicate_spans(corpus, n=6).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
        for doc, sp in by_doc.items():
            sp.sort()
            for (s1, e1), (s2, e2) in zip(sp, sp[1:]):
                assert s2 > e1 + 1

    def test_min_count_threshold(self, spark, corpus):
        # min_count=3: the passage appears twice only -> nothing survives
        assert duplicate_spans(corpus, n=6, min_count=3).count() == 0


class TestSpanPlans:
    def test_no_cartesian_and_hash_only_shuffle(self, spark, corpus):
        """The dup-key detection groups by the 16-byte gram hash with
        map-side partial aggregation, and nothing in the plan is an
        all-pairs join; the islands window partitions by doc_id (never a
        global single-partition window)."""
        df = duplicate_spans(corpus, n=6)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "partial_count" in plan  # map-side combine before exchange
        # the gaps-and-islands window is keyed by doc_id
        assert "windowspecdefinition(doc_id" in plan


class TestRandomizedVsBruteForce:
    def test_random_corpora_match_reference(self, spark):
        """Seeded random corpora vs an independent O(n·m) in-memory
        reference: same gram-repeat detection, same island merge."""
        import random

        rng = random.Random(20240814)
        vocab = [f"w{i}" for i in range(12)]  # small vocab -> collisions
        n = 4
        docs = []
        for doc_id in range(40):
            length = rng.randint(0, 20)
            docs.append(
                (doc_id, " ".join(rng.choice(vocab) for _ in range(length)))
            )

        # reference: positional n-grams, global count >= 2, merge islands
        from collections import Counter

        grams = {}  # doc -> [(pos, gram)]
        counts = Counter()
        for doc_id, text in docs:
            toks = text.split()
            g = [
                (p, " ".join(toks[p:p + n]))
                for p in range(len(toks) - n + 1)
            ]
            grams[doc_id] = g
            counts.update(gr for _, gr in g)
        expected = set()
        for doc_id, g in grams.items():
            dup_pos = sorted(p for p, gr in g if counts[gr] >= 2)
            if not dup_pos:
                continue
            start = prev = dup_pos[0]
            n_g = 1
            for p in dup_pos[1:]:
                if p - prev > n:
                    expected.add((doc_id, start, prev + n - 1, n_g))
                    start, n_g = p, 0
                prev = p
                n_g += 1
            expected.add((doc_id, start, prev + n - 1, n_g))

        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r.doc_id, r.span_start, r.span_end, r.n_dup_grams)
            for r in duplicate_spans(df, n=n).collect()
        }
        assert got == expected


class TestSpanIndex:
    def test_incremental_equals_batch_over_union(self, spark, corpus, tmp_path):
        """Probe against the stored index == batch spans over
        corpus ∪ batch, restricted to batch docs — the oracle contract,
        here on a corpus with cross-batch AND within-batch repeats."""
        from lotad_spark.pipeline.spandedup import (
            duplicate_spans_against_index,
            write_span_index,
        )

        idx = str(tmp_path / "span_index")
        write_span_index(corpus, idx, n=6)
        batch = spark.createDataFrame(
            [
                # shares the doc-1 passage with the corpus
                (100, "prefix the quick brown fox jumps over the lazy dog"),
                # repeats only within the batch itself
                (101, "x1 x2 x3 x4 x5 x6 end"),
                (102, "x1 x2 x3 x4 x5 x6 other"),
                (103, "nothing shared here at all with anyone truly"),
            ],
            "doc_id long, text string",
        )
        inc = {
            (r.doc_id, r.span_start, r.span_end, r.n_dup_grams)
            for r in duplicate_spans_against_index(batch, idx, n=6).collect()
        }
        union_spans = {
            (r.doc_id, r.span_start, r.span_end, r.n_dup_grams)
            for r in duplicate_spans(
                corpus.unionByName(batch), n=6
            ).collect()
            if r.doc_id >= 100
        }
        assert inc == union_spans
        assert any(d == 100 for d, *_ in inc)  # cross-batch repeat found
        assert any(d == 101 for d, *_ in inc)  # within-batch repeat found
        assert not any(d == 103 for d, *_ in inc)

        # mismatched gram length fails loudly instead of silently
        # missing every stored gram
        with pytest.raises(ValueError, match="n=6"):
            duplicate_spans_against_index(batch, idx, n=8)


class TestStripDuplicateSpans:
    def test_strip(self, spark, corpus):
        out = {
            r.doc_id: (r.text, r.n_tokens_removed)
            for r in strip_duplicate_spans(corpus, n=6).collect()
        }
        assert out[1] == ("and runs far away home", 9)
        assert out[2] == ("intro words then ends here", 9)
        assert out[3][1] == 0  # untouched
        assert out[4] == ("", 0)
        assert out[5] == ("short doc", 0)
        assert out[6] == ("tail", 12)

    def test_supplied_spans_out_of_bounds_raise(self, spark, corpus):
        # Stale spans (built against another corpus snapshot) must fail
        # loudly, not silently remove the wrong tokens.
        bad = spark.createDataFrame(
            [(5, 0, 999, 1)],
            "doc_id long, span_start long, span_end long, n_dup_grams long",
        )
        with pytest.raises(Exception, match="token range"):
            strip_duplicate_spans(corpus, spans=bad).collect()
        # the guard survives column pruning: a consumer reading ONLY the
        # removal counts (text column pruned away) must still raise
        with pytest.raises(Exception, match="token range"):
            strip_duplicate_spans(corpus, spans=bad).select(
                "doc_id", "n_tokens_removed"
            ).collect()

    def test_supplied_spans_in_bounds_match_internal(self, spark, corpus):
        # Supplying the spans the detector would compute is identical to
        # letting the strip compute them.
        spans = duplicate_spans(corpus, n=6)
        a = sorted(
            (r.doc_id, r.text, r.n_tokens_removed)
            for r in strip_duplicate_spans(corpus, spans=spans).collect()
        )
        b = sorted(
            (r.doc_id, r.text, r.n_tokens_removed)
            for r in strip_duplicate_spans(corpus, n=6).collect()
        )
        assert a == b

    def test_token_conservation(self, spark, corpus):
        # kept tokens + removed tokens == original tokens, per doc
        stripped = strip_duplicate_spans(corpus, n=6)
        joined = (
            corpus.select("doc_id", F.col("text").alias("orig"))
            .join(stripped, "doc_id")
            .select(
                F.when(
                    F.length(F.trim("orig")) == 0, F.lit(0)
                ).otherwise(F.size(F.split(F.trim("orig"), r"\s+"))).alias("n0"),
                F.when(
                    F.length(F.trim("text")) == 0, F.lit(0)
                ).otherwise(F.size(F.split(F.trim("text"), r"\s+"))).alias("n1"),
                "n_tokens_removed",
            )
            .collect()
        )
        for r in joined:
            assert r.n0 == r.n1 + r.n_tokens_removed


class TestSpanCli:
    def test_dedup_spans_command(self, spark, tmp_path):
        from click.testing import CliRunner

        from lotad_spark.cli import cli

        src = str(tmp_path / "docs")
        spark.createDataFrame(
            CORPUS, "doc_id long, text string"
        ).write.mode("overwrite").parquet(src)
        out = str(tmp_path / "out")
        result = CliRunner().invoke(
            cli,
            ["dedup-spans", "--docs", src, "--output", out, "--strip"],
            catch_exceptions=False,
        )
        assert result.exit_code == 0, result.output
        assert "wrote 3 spans" in result.output
        assert "3 docs touched" in result.output
        stripped = {
            r.doc_id: r.n_tokens_removed
            for r in spark.read.parquet(f"{out}/stripped").collect()
        }
        assert stripped[6] == 12

    def test_dedup_spans_eval_set_mode(self, spark, tmp_path):
        from click.testing import CliRunner

        from lotad_spark.cli import cli

        src = str(tmp_path / "docs_decon")
        spark.createDataFrame(
            CORPUS, "doc_id long, text string"
        ).write.mode("overwrite").parquet(src)
        ev = str(tmp_path / "evalset")
        spark.createDataFrame(
            [(900, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        ).write.mode("overwrite").parquet(ev)
        out = str(tmp_path / "out_decon")
        result = CliRunner().invoke(
            cli,
            ["dedup-spans", "--docs", src, "--output", out,
             "--eval-set", ev, "--strip"],
            catch_exceptions=False,
        )
        assert result.exit_code == 0, result.output
        # only the two docs carrying the benchmark passage are touched;
        # the within-corpus repeat (doc 6) is NOT contamination
        touched = {
            r.doc_id
            for r in spark.read.parquet(f"{out}/stripped")
            .filter("n_tokens_removed > 0")
            .collect()
        }
        assert touched == {1, 2}

    def test_bpe_train_command(self, spark, tmp_path):
        from click.testing import CliRunner

        from lotad_spark.cli import cli

        src = str(tmp_path / "docs_bpe")
        spark.createDataFrame(
            [(1, "low low lower lowest")], "doc_id long, text string"
        ).write.mode("overwrite").parquet(src)
        out = str(tmp_path / "merges")
        result = CliRunner().invoke(
            cli,
            ["bpe-train", "--docs", src, "--output", out, "--merges", "4"],
            catch_exceptions=False,
        )
        assert result.exit_code == 0, result.output
        assert "learned 4 merges" in result.output
        rows = spark.read.parquet(out).orderBy("rank").collect()
        assert [r.rank for r in rows] == [0, 1, 2, 3]
        assert rows[0].left == "l" and rows[0].right == "o"  # 'lo' ×4


class TestContaminationSpans:
    def test_eval_grams_located_and_strippable(self, spark, corpus):
        from lotad_spark.pipeline.spandedup import (
            contamination_spans,
            strip_duplicate_spans,
        )

        # "benchmark" = the shared passage from doc 1
        ev = spark.createDataFrame(
            [(900, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        )
        spans = contamination_spans(corpus, ev, n=6)
        got = {
            r.doc_id: (r.span_start, r.span_end)
            for r in spans.collect()
        }
        # located in BOTH docs carrying the passage, nowhere else
        assert got[1] == (0, 8)
        assert got[2] == (3, 11)
        assert set(got) == {1, 2}

        # surgical removal via the spans= hook
        stripped = {
            r.doc_id: r.n_tokens_removed
            for r in strip_duplicate_spans(corpus, n=6, spans=spans).collect()
        }
        assert stripped[1] == 9 and stripped[2] == 9
        assert stripped[3] == 0 and stripped[6] == 0  # dup-but-not-contaminated untouched
