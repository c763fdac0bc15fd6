"""Semantic unit tests for the text-analysis operator family.

Hand-computable fixtures — the oracle parity test (test_oracle_parity.py)
covers engine-vs-DuckDB agreement on the real testdata; these pin the
*intended* semantics so both engines can't drift together.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asterlake.operators.textstats import (
    bpe_ish_token_count,
    classify_language,
    fingerprint_table,
    language_profiles,
    quality_features,
    rolling_hash,
)

MOD = 1_000_000_007


def _tok_hash(t: str) -> int:
    acc = 0
    for ch in t:
        acc = (acc * 31 + ord(ch)) % MOD
    return acc


def _doc_hash(text: str) -> int:
    acc = 0
    for t in text.split(" "):
        acc = (acc * 131 + _tok_hash(t)) % MOD
    return acc


def test_rolling_hash_matches_python_model(spark):
    texts = ["ab cd ef", "cd ab ef", "ab cd ef "]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    got = {r.doc_id: r.fingerprint for r in df.select("doc_id", rolling_hash("text").alias("fingerprint")).collect()}
    assert got == {i: _doc_hash(t) for i, t in enumerate(texts)}
    # order-sensitive: swapped tokens change the fingerprint
    assert got[0] != got[1]


def test_quality_features_hand_values(spark):
    df = spark.createDataFrame([(1, "a a the bb!")], "doc_id int, text string")
    row = quality_features(df).collect()[0]
    assert row.n_tokens == 4
    assert row.n_distinct_tokens == 3
    assert row.stopword_ratio == pytest.approx(3 / 4)
    assert row.distinct_ratio == pytest.approx(3 / 4)
    assert row.mean_token_len == pytest.approx((1 + 1 + 3 + 3) / 4)  # 'bb!' is 3 chars
    assert row.punct_ratio == pytest.approx(1 / 11)  # the '!' of 11 chars
    assert row.quality_score == pytest.approx((3 / 4) * (1 - 3 / 4))


def test_bpe_ish_token_count(spark):
    # 'ab', '3', 'c', '!' -> 4; whitespace itself never tokenizes
    df = spark.createDataFrame([("ab 3 c!",)], "text string")
    assert df.select(bpe_ish_token_count("text").alias("n")).collect()[0].n == 4


def test_langid_separable_vocab(spark):
    rows = [
        (1, "uno dos tres uno dos", "es"),
        (2, "ein zwei drei ein zwei", "de"),
        (3, "uno dos tres dos uno", "es"),
        (4, "ein zwei drei zwei ein", "de"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    prof = language_profiles(docs, top_n=5)
    pred = {r.doc_id: r.pred_lang for r in classify_language(docs, prof).collect()}
    assert pred == {1: "es", 2: "de", 3: "es", 4: "de"}
    # a doc sharing no profile token classifies as 'und' with overlap 0
    unknown = spark.createDataFrame([(9, "xyz qqq", "en")], "doc_id int, text string, lang string")
    out = classify_language(unknown, prof).collect()[0]
    assert (out.pred_lang, out.overlap) == ("und", 0)


def test_fingerprint_digest_detects_exact_dup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other text")],
        "doc_id int, text string",
    )
    fp = fingerprint_table(df).collect()
    by_id = {r.doc_id: (r.fingerprint, r.digest) for r in fp}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[3]


def test_repetition_single_token_doc_is_null_not_crash(spark):
    """A 1-token doc has zero bigrams: its dup_bigram_frac must be NULL
    (no evidence) — DuckDB's zero-division semantics — instead of an
    ANSI DIVIDE_BY_ZERO crashing the whole scan (r6 hazard sweep)."""
    from asterlake.operators.textstats import repetition_features

    docs = spark.createDataFrame(
        [(1, "hello"), (2, "a a b")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in repetition_features(docs).collect()}
    assert rows[1].dup_bigram_frac is None
    assert rows[1].n_tokens == 1
    assert rows[2].dup_bigram_frac == 0.0
