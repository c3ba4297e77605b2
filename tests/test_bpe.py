"""Distributed BPE trainer tests: parity against a from-scratch
sequential reference (dict-based, no Spark), tie-break determinism,
replace-scan semantics pinning, and the map-only tokenizer."""

import re

import pytest

pyspark = pytest.importorskip("pyspark")

from anytomd_spark.analysis.bpe import (  # noqa: E402
    END,
    apply_bpe,
    train_bpe,
    word_counts,
)
from anytomd_spark.pipeline import build_session  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    s = build_session(master="local[2]", shuffle_partitions=4)
    yield s
    s.stop()


def _ref_train(texts: list[str], n_merges: int):
    """Sequential reference BPE: word-frequency dict, pair counting,
    (count DESC, pair ASC) argmax, str.replace merge application — the
    same scan semantics both engines' replace() implement."""
    counts: dict[str, int] = {}
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if w:
                counts[w] = counts.get(w, 0) + 1
    syms = {
        " " + " ".join(list(w)) + f" {END} ": c for w, c in counts.items()
    }
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for s, c in syms.items():
            toks = [x for x in s.split(" ") if x]
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (l, r), pc = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, pc))
        syms = {
            s.replace(f" {l} {r} ", f" {l}{r} "): c for s, c in syms.items()
        }
    return merges


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the dog barks at the quick fox",
    "lazy dogs and quick foxes, quick quick!",
    "Brown bears are not foxes; the bear sleeps.",
]


class TestTrainer:
    def test_matches_sequential_reference(self, spark):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
        )
        got = [
            (r["rank"], r["left"], r["right"], r["pair_count"])
            for r in train_bpe(docs, n_merges=10).collect()
        ]
        assert got == _ref_train(CORPUS, 10)

    def test_tie_break_is_lexicographic(self, spark):
        # round 1: (a,b) (b,</w>) (c,d) (d,</w>) all tie at 2 ->
        # lexicographic ASC picks (a,b); round 2: (ab,</w>) (c,d)
        # (d,</w>) tie at 2 -> 'ab' < 'c' picks (ab,</w>)
        docs = spark.createDataFrame(
            [(0, "ab ab cd cd")], "doc_id int, text string"
        )
        rows = train_bpe(docs, n_merges=2).collect()
        assert (rows[0]["left"], rows[0]["right"]) == ("a", "b")
        assert (rows[1]["left"], rows[1]["right"]) == ("ab", "</w>")

    def test_merged_symbols_pair_in_later_rounds(self, spark):
        # 'aaaa': round 1 merges (a,a); the replace scan turns
        # " a a a a </w> " into " aa a a </w> " (resume-after-match
        # consumes the shared delimiter — the pinned contract), so
        # round 2 ties (aa,a)/(a,a)/(a,</w>) at 3 and lexicographic
        # ASC picks (a,</w>) ('<' < 'a')
        docs = spark.createDataFrame(
            [(0, "aaaa aaaa aaaa")], "doc_id int, text string"
        )
        rows = train_bpe(docs, n_merges=2).collect()
        assert (rows[0]["left"], rows[0]["right"]) == ("a", "a")
        assert rows[0]["pair_count"] == 9
        assert (rows[1]["left"], rows[1]["right"]) == ("a", "</w>")

    def test_exhausted_corpus_stops_early(self, spark):
        docs = spark.createDataFrame([(0, "a b")], "doc_id int, text string")
        # only pairs with END remain; after 2 merges nothing is left
        rows = train_bpe(docs, n_merges=10).collect()
        assert 0 < len(rows) <= 4

    def test_word_counts(self, spark):
        docs = spark.createDataFrame(
            [(0, "The the THE fox!"), (1, "fox")], "doc_id int, text string"
        )
        got = {r["word"]: r["count"] for r in word_counts(docs).collect()}
        assert got == {"the": 3, "fox": 2}


class TestReplaceScanSemantics:
    def test_six_run_documented_deviation(self, spark):
        """For >= 6 identical symbols the replace-scan pairs differently
        than textbook leftmost-greedy — pin the CONTRACT semantics so a
        regression (or an engine change) is caught."""
        docs = spark.createDataFrame(
            [(0, "aaaaaa")], "doc_id int, text string"
        )
        out = apply_bpe(docs, [("a", "a")]).collect()[0]["bpe_tokens"]
        # replace-scan: (aa) a (aa) a </w>
        assert out == ["aa", "a", "aa", "a", END]


class TestTokenizer:
    def test_apply_matches_training_segmentation(self, spark):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
        )
        merges = [
            (r["left"], r["right"])
            for r in train_bpe(docs, n_merges=8).collect()
        ]
        toks = apply_bpe(docs, merges).select("doc_id", "bpe_tokens").collect()
        # reference tokenization of doc 0
        ref = []
        for w in re.split(r"[^a-z]+", CORPUS[0].lower()):
            if not w:
                continue
            s = " " + " ".join(list(w)) + f" {END} "
            for l, r in merges:
                s = s.replace(f" {l} {r} ", f" {l}{r} ")
            ref += [x for x in s.split(" ") if x]
        got = next(r["bpe_tokens"] for r in toks if r["doc_id"] == 0)
        assert got == ref
        # every token is either a learned merge product or a base symbol
        learned = {l + r for l, r in merges}
        for r in toks:
            for t in r["bpe_tokens"]:
                assert t == END or len(t) == 1 or t in learned or any(
                    t == l + r for l, r in merges
                )

    def test_apply_is_map_only(self, spark):
        docs = spark.createDataFrame(
            [(0, "hello world")], "doc_id int, text string"
        )
        plan = apply_bpe(docs, [("l", "l"), ("h", "e")])._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
