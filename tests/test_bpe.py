"""Distributed BPE training (pipeline/bpe.py) vs an independent
in-memory reference implementation."""

from collections import Counter

import pytest

from lotad_spark.pipeline.bpe import (
    END_MARK,
    apply_bpe,
    pair_counts,
    symbolize,
    train_bpe,
    word_histogram,
)

CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest widest widest"),
    (4, "widest newest low"),
]


def ref_bpe(texts, num_merges):
    """Reference BPE (Sennrich-style) on a word histogram, greedy
    left-to-right merging, ties broken by (left, right) ascending."""
    hist = Counter(w for t in texts for w in t.split() if w)
    vocab = {w: [*w, END_MARK] for w in hist}
    merges = []
    for rank in range(num_merges):
        pc = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += hist[w]
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, c))
        for w, syms in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab, hist


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


class TestWordHistogram:
    def test_counts(self, docs):
        got = {r.word: r.freq for r in word_histogram(docs).collect()}
        assert got == {"low": 6, "lower": 2, "newest": 7, "widest": 3}


class TestPairCounts:
    def test_round0_matches_reference(self, docs):
        ref, _, _ = ref_bpe([t for _, t in CORPUS], 1)
        got = {
            (r.left, r.right): r.pair_count
            for r in pair_counts(symbolize(word_histogram(docs))).collect()
        }
        # reference round-0 top pair agrees with the distributed count
        _, l, r, c = ref_bpe([t for _, t in CORPUS], 1)[0][0]
        assert got[(l, r)] == c
        # spot-check a full count: 'w' precedes 'e' in lower and newest
        assert got[("w", "e")] == 2 + 7


class TestTrainBpe:
    def test_merge_table_matches_reference(self, docs):
        ref, _, _ = ref_bpe([t for _, t in CORPUS], 8)
        got = [
            (r.rank, r.left, r.right, r.pair_count)
            for r in train_bpe(docs, num_merges=8).orderBy("rank").collect()
        ]
        assert got == ref

    def test_early_stop_on_exhaustion(self, spark):
        tiny = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
        # "ab</w>" has 2 pairs; merging eventually leaves 1 symbol
        got = train_bpe(tiny, num_merges=10).collect()
        assert 0 < len(got) < 10


class TestApplyBpe:
    def test_tokenization_matches_reference(self, docs):
        ref_merges, ref_vocab, _ = ref_bpe([t for _, t in CORPUS], 8)
        merge_list = [(l, r) for _, l, r, _ in ref_merges]
        got = {
            r.doc_id: (r.n_tokens, list(r.tokens))
            for r in apply_bpe(docs, merge_list).collect()
        }
        for doc_id, text in CORPUS:
            expected = [s for w in text.split() for s in ref_vocab[w]]
            assert got[doc_id] == (len(expected), expected)


class TestBpeFertility:
    def test_matches_hand_computation(self, spark):
        from lotad_spark.pipeline import bpe_fertility

        # merges: (a, b) then (ab, </w>) — "ab" becomes ONE token
        merges = [("a", "b"), ("ab", "</w>")]
        docs = spark.createDataFrame(
            [
                (1, "en", "ab ab cd"),
                (2, "en", "ab"),
                (3, "de", "xyz"),
                (4, "fr", None),      # no words: zero counts, doc counted
            ],
            "doc_id bigint, lang string, text string",
        )
        got = {
            r.lang: (r.n_docs, r.n_words, r.n_chars, r.n_tokens,
                     r.fertility, r.chars_per_token)
            for r in bpe_fertility(docs, merges).collect()
        }
        # en: words ab, ab, cd, ab -> tokens: ab</w> x3 (1 each),
        # c d </w> (3); n_words 4, n_chars 8, n_tokens 6
        assert got["en"] == (2, 4, 8, 6, round(6 / 4, 6), round(8 / 6, 6))
        # de: xyz -> x y z </w> = 4 tokens, 3 chars, 1 word
        assert got["de"] == (1, 1, 3, 4, 4.0, 0.75)
        # fr: no words at all -> zeros with guarded ratios
        assert got["fr"] == (1, 0, 0, 0, 0.0, 0.0)

    def test_group_keyed_aggregation_only(self, spark, sf_dir):
        """No doc-keyed shuffle and no token-array assembly: the only
        hashpartitioning key is the group column."""
        import re

        from lotad_spark.pipeline import bpe_fertility
        from lotad_spark.sources.parquet import ParquetDatabase

        docs = ParquetDatabase(spark, sf_dir, "db").table("documents")
        plan = (
            bpe_fertility(docs, [("a", "b")])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        keys = set(re.findall(r"hashpartitioning\((\w+)", plan))
        # both aggregates key on the group column (the n_docs face
        # partitions on its original name) — never on doc_id
        assert keys and keys <= {"_grp", "lang"}, keys
        assert "collect_list" not in plan

    def test_null_group_keeps_its_stats(self, spark):
        """A NULL lang (unclassified docs) must report its REAL word
        stats, not zero-fill: the n_docs/agg join is null-safe."""
        from lotad_spark.pipeline import bpe_fertility

        docs = spark.createDataFrame(
            [(1, None, "ab ab"), (2, "en", "ab")],
            "doc_id bigint, lang string, text string",
        )
        got = {
            r.lang: (r.n_docs, r.n_words, r.n_tokens)
            for r in bpe_fertility(docs, [("a", "b")]).collect()
        }
        # merges: (a,b) only -> "ab" = tokens [ab, </w>] = 2 per word
        assert got[None] == (1, 2, 4)
        assert got["en"] == (1, 1, 2)
