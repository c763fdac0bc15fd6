"""WordPiece trainer/segmenter (operators/wordpiece) differential tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

pytestmark = pytest.mark.deep

from asterlake.operators.bpe import bpe_train
from asterlake.operators.wordpiece import (
    CONT,
    UNK,
    replay_wordpiece_train,
    wordpiece_segment,
    wordpiece_train,
)

WC = {
    "hugging": 5,
    "hugs": 8,
    "hug": 12,
    "bug": 4,
    "bun": 6,
    "pug": 3,
    "pun": 7,
    "gun": 2,
    "un": 9,
    "running": 4,
    "runner": 3,
}


def _words_df(spark, wc=None):
    return spark.createDataFrame(
        list((wc or WC).items()), "word string, n long"
    )


def test_trainer_matches_python_replay(spark):
    m_s, v_s = wordpiece_train(_words_df(spark), n_merges=12)
    m_p, v_p = replay_wordpiece_train(WC, n_merges=12)
    assert m_s == m_p
    assert v_s == v_p


def test_trainer_partitioning_invariance(spark):
    df = _words_df(spark)
    m1, v1 = wordpiece_train(df.coalesce(1), n_merges=8)
    m2, v2 = wordpiece_train(df.repartition(7), n_merges=8)
    assert (m1, v1) == (m2, v2)


def test_vocab_keeps_full_alphabet(spark):
    """Single characters stay in the vocab even when every occurrence
    merged away — greedy segmentation needs the fallback (HF/BERT)."""
    _, vocab = wordpiece_train(_words_df(spark), n_merges=12)
    alphabet = {w[0] for w in WC} | {
        CONT + c for w in WC for c in w[1:]
    }
    assert alphabet <= set(vocab)


def test_likelihood_score_differs_from_bpe(spark):
    """WordPiece's likelihood gain and BPE's raw frequency pick
    different first merges on this corpus: (u, g) is the most FREQUENT
    pair but u and g are themselves everywhere, so the rarer-parts
    pair wins the ratio."""
    df = _words_df(spark)
    wp_first = wordpiece_train(df, n_merges=1)[0][0]
    bpe_first = bpe_train(df, n_merges=1)[0]
    assert bpe_first == ("u", "g")
    assert wp_first != bpe_first


def test_segment_greedy_longest_match_and_unk(spark):
    vocab = ["a", "ab", "abc", "##c", "##d", "##cd", "b"]
    docs = spark.createDataFrame(
        [(1, "abcd abc ab a b zq"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.wp_tokens
        for r in wordpiece_segment(docs, vocab, text_col="text").collect()
    }
    # 'abcd' -> longest prefix 'abc' then continuation '##d'
    assert got[1] == ["abc", "##d", "abc", "ab", "a", "b", UNK]
    assert got[2] == []
    assert got[3] == []


def test_segment_round_trip_without_unk(spark):
    """Concatenating pieces (minus ##) reproduces each word exactly
    whenever no [UNK] fired."""
    _, vocab = wordpiece_train(_words_df(spark), n_merges=12)
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(WC)], "doc_id long, text string"
    )
    for r in wordpiece_segment(docs, vocab, text_col="text").collect():
        word = list(WC)[r.doc_id]
        assert UNK not in r.wp_tokens
        rebuilt = "".join(
            p[len(CONT):] if p.startswith(CONT) else p for p in r.wp_tokens
        )
        assert rebuilt == word, (word, r.wp_tokens)


def test_segment_partitioning_invariance(spark):
    _, vocab = wordpiece_train(_words_df(spark), n_merges=8)
    docs = spark.createDataFrame(
        [(i, " ".join(list(WC)[i % len(WC):]) ) for i in range(20)],
        "doc_id long, text string",
    )
    one = {
        (r.doc_id, tuple(r.wp_tokens))
        for r in wordpiece_segment(
            docs.coalesce(1), vocab, text_col="text"
        ).collect()
    }
    many = {
        (r.doc_id, tuple(r.wp_tokens))
        for r in wordpiece_segment(
            docs.repartition(9), vocab, text_col="text"
        ).collect()
    }
    assert one == many
