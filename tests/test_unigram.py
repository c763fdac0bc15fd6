"""Unigram-LM tokenizer training (operators/unigram.py): bit-for-bit
differential vs the pure-Python replay, partitioning invariance,
coverage/round-trip guarantees, vocabulary budget, and plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from asterlake.operators.bpe import word_counts
from asterlake.operators.unigram import (
    replay_unigram_train,
    seed_vocab,
    unigram_segment,
    unigram_train,
    viterbi_segment,
)

# unigram-LM trainer differential — excluded from the -m "not slow" inner loop (r9 verdict ask #3)
pytestmark = [pytest.mark.slow, pytest.mark.deep]


WORDS = [
    ("lower", 40), ("lowest", 25), ("newer", 30), ("newest", 18),
    ("wider", 12), ("widest", 9), ("low", 55), ("new", 61),
    ("slow", 20), ("slower", 14), ("flow", 8), ("flower", 6),
    ("er", 3), ("est", 2), ("stow", 4), ("tower", 7),
]


@pytest.fixture(scope="module")
def words_df(spark):
    return spark.createDataFrame(WORDS, "word string, n long").cache()


def test_seed_vocab_matches_replay_seed(spark, words_df):
    """The distributed substring seed (explode + sum + top-k by the
    (n DESC, piece ASC) total order, single chars always in) equals the
    replay's dictionary seed exactly."""
    got = {
        r.piece: r.n for r in seed_vocab(words_df, 4, 24).collect()
    }
    sub: dict[str, int] = {}
    for w, n in WORDS:
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + 4) + 1):
                sub[w[i:j]] = sub.get(w[i:j], 0) + n
    ranked = dict(sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))[:24])
    for p, c in sub.items():
        if len(p) == 1:
            ranked[p] = max(ranked.get(p, 0), c)
    assert got == ranked


def test_train_matches_python_replay_bitwise(spark, words_df):
    """Full Viterbi-EM training distributed vs single-process: the
    piece sets AND the log-prob doubles must agree bit-for-bit (counts
    are exact integers; every float derives from them identically)."""
    dist = unigram_train(
        words_df, vocab_size=24, max_piece_len=4, seed_size=48, n_iters=3
    )
    rep = replay_unigram_train(
        WORDS, vocab_size=24, max_piece_len=4, seed_size=48, n_iters=3
    )
    assert dist == rep  # keys and float64 values, exact


def test_train_is_partitioning_invariant(spark, words_df):
    one = unigram_train(
        words_df.coalesce(1), vocab_size=24, max_piece_len=4,
        seed_size=48, n_iters=2,
    )
    many = unigram_train(
        words_df.repartition(13), vocab_size=24, max_piece_len=4,
        seed_size=48, n_iters=2,
    )
    assert one == many


def test_vocab_budget_and_coverage_floor(spark, words_df):
    """Pruning respects the vocab budget but never drops single chars,
    so every word (even with characters unseen in training) segments."""
    model = unigram_train(
        words_df, vocab_size=16, max_piece_len=4, seed_size=64, n_iters=4
    )
    chars = {c for w, _ in WORDS for c in w}
    assert chars <= set(model)  # coverage floor intact
    n_multi = sum(1 for p in model if len(p) > 1)
    assert len(model) <= max(16, len(chars)) + n_multi  # sane budget
    # unseen characters fall back to the finite unk penalty
    segs = viterbi_segment("lowxyz", model, 4)
    assert "".join(segs) == "lowxyz"
    assert all(math.isfinite(model[p]) for p in model)


def test_viterbi_prefers_higher_probability_parse():
    """The DP picks the max-log-prob decomposition, not greedy-longest:
    with 'lowes'+'t' cheap but 'low'+'est' cheaper, the split wins."""
    logp = {"low": -1.0, "est": -1.0, "lowes": -3.5, "t": -1.5,
            "l": -6.0, "o": -6.0, "w": -6.0, "e": -6.0, "s": -6.0}
    assert viterbi_segment("lowest", logp, 6) == ["low", "est"]
    # tie contract: strict > with ascending start scan means the
    # EARLIEST start index wins each cell — the longest-final-piece
    # parse survives an exact float tie
    tie = {"ab": -2.0, "a": -1.0, "b": -1.0}
    assert viterbi_segment("ab", tie, 2) == ["ab"]


def test_segment_round_trips_documents(spark, sf_dir):
    """Applying a trained model to the documents corpus reproduces
    every document's words on concat (minus segmentation boundaries) —
    the tokenizer never loses or invents characters."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    wc = word_counts(docs, text_col="text")
    model = unigram_train(
        wc, vocab_size=64, max_piece_len=5, seed_size=128, n_iters=2
    )
    out = unigram_segment(
        docs, model, max_piece_len=5, text_col="text", out_col="pieces"
    ).select(
        "doc_id",
        F.array_join("pieces", "").alias("glued"),
        F.regexp_replace("text", " ", "").alias("squashed"),
    )
    bad = out.where(F.col("glued") != F.col("squashed")).count()
    assert bad == 0


def test_estep_plan_is_rowlocal_before_count_shuffle(spark, words_df):
    """The E-step plan: one ArrowEvalPython (the Viterbi UDF) feeding a
    hash aggregate — no join, no extra exchange beyond the count
    aggregation's own, never a row-at-a-time BatchEvalPython."""
    from asterlake.operators.unigram import _estep_counts

    model = {"lo": -1.0, "w": -2.0, "e": -2.0, "r": -2.0}
    plan = _estep_counts(
        words_df, model, 4
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1
