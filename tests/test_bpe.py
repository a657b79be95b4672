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
