"""Distributed BPE training (operators/bpe.py): bit-for-bit differential
against a pure-Python reference trainer, segment round trips, vocabulary
weights, and determinism under repartitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asterlake.operators.bpe import (
    EOW,
    bpe_segment,
    bpe_train,
    bpe_vocab,
    word_counts,
)


# BPE trainer differential — excluded from the -m "not slow" inner loop (r9 verdict ask #3)
pytestmark = [pytest.mark.slow, pytest.mark.deep]


def ref_train(wc: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Reference BPE (Sennrich et al.): max-count pair per round,
    lexicographic tiebreak, greedy leftmost-first replace, stop when the
    best pair occurs < 2 times."""
    words = {tuple(list(w) + [EOW]): c for w, c in wc.items()}
    merges = []
    for _ in range(n_merges):
        pc: dict = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + c
        if not pc:
            break
        best = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] < 2:
            break
        (a, b) = best[0]
        merges.append((a, b))
        nxt = {}
        for syms, c in words.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        words = nxt
    return merges


def ref_segment(word: str, merges: list[tuple[str, str]]) -> list[str]:
    ranks = {p: i for i, p in enumerate(merges)}
    syms = list(word) + [EOW]
    while len(syms) > 1:
        cand = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cand:
            break
        _, i = min(cand)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


CORPUS = [
    "the theme of the thesis is the theory",
    "lower lowest low lowering slower slowest",
    "running runner run runs rerun running",
    "the lower theme runs the slower theory",
    "a aa aaa aaaa ab",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "body"]
    )


def test_train_matches_python_reference_exactly(spark, docs):
    wc_df = word_counts(docs)
    wc = {r.word: r.n for r in wc_df.collect()}
    # independent count check against plain Python
    want_wc: dict = {}
    for t in CORPUS:
        for w in t.split():
            want_wc[w] = want_wc.get(w, 0) + 1
    assert wc == want_wc
    got = bpe_train(wc_df, n_merges=40)
    want = ref_train(wc, 40)
    assert got == want  # every merge, in order, incl. the early stop
    assert len(got) > 10  # the corpus genuinely supports many merges


def test_train_deterministic_under_repartitioning(spark, docs):
    wc_df = word_counts(docs)
    m1 = bpe_train(wc_df, n_merges=12)
    m2 = bpe_train(wc_df.repartition(7), n_merges=12)
    assert m1 == m2


def test_segment_matches_reference_and_round_trips(spark, docs):
    wc_df = word_counts(docs)
    merges = bpe_train(wc_df, n_merges=25)
    segged = {
        r.doc_id: list(r.bpe_tokens)
        for r in bpe_segment(docs, merges).collect()
    }
    for i, text in enumerate(CORPUS):
        want = []
        for w in text.split():
            want.extend(ref_segment(w, merges))
        assert segged[i] == want, i
        # round trip: pieces concatenate back to the words
        joined = "".join(segged[i]).replace(EOW, " ").split()
        assert joined == text.split(), i


def test_vocab_weights_sum_to_corpus_piece_counts(spark, docs):
    wc_df = word_counts(docs)
    merges = bpe_train(wc_df, n_merges=25)
    vocab = {r.piece: r.n for r in bpe_vocab(wc_df, merges).collect()}
    want: dict = {}
    for t in CORPUS:
        for w in t.split():
            for p in ref_segment(w, merges):
                want[p] = want.get(p, 0) + 1
    assert vocab == want
    # frequent subwords actually emerged (not a char-only vocab)
    assert any(len(p.replace(EOW, "")) >= 3 for p in vocab)


def test_no_repeating_pair_stops_training(spark):
    df = spark.createDataFrame([("x y z",)], ["body"])
    merges = bpe_train(word_counts(df), n_merges=10)
    # single-occurrence words: only the (char, EOW) pairs exist once each
    assert merges == []


def test_train_plan_shape(spark, docs):
    """The per-round pair count must be a map-side-combinable aggregate
    over the word table; the corpus never re-enters the loop."""
    from asterlake.plans.inspect import plan_string

    wc_df = word_counts(docs)
    plan = plan_string(wc_df)
    assert "HashAggregate" in plan
    assert "BatchEvalPython" not in plan