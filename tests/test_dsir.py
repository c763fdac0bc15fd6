"""DSIR importance-weighted data selection (operators/dsir.py):
bit-for-bit trainer differential vs the pure-Python replay, weight
scoring vs a reference fold, partitioning invariance, the full-table
contract, and NULL/empty/one-token edges."""

from __future__ import annotations

import hashlib
import math

import pytest

from asterlake.operators.dsir import (
    MICROS,
    dsir_train,
    dsir_weights,
    hashed_gram_counts,
    replay_dsir_train,
)

TARGET = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown cat sleeps",
    "brown fox quick moves",
]
RAW = [
    "the quick brown fox jumps over the lazy dog",
    "stock market prices fell sharply today",
    "quarterly earnings report shows growth",
    "the lazy dog sleeps all day",
    "",
    "   ",
    "single",
    None,
]
B = 64


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % B


def _grams(text: str | None) -> list[str]:
    toks = (text or "").split()
    return [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _tgt(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TARGET)], "doc_id bigint, text string"
    )


def _raw(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(RAW)], "doc_id bigint, text string"
    )


def test_hashed_counts_match_python_hash(spark):
    got = {
        r["bucket"]: r["n"]
        for r in hashed_gram_counts(_raw(spark), buckets=B).collect()
    }
    want: dict[int, int] = {}
    for t in RAW:
        for g in _grams(t):
            want[_bucket(g)] = want.get(_bucket(g), 0) + 1
    assert got == want


def test_train_matches_pure_python_replay(spark):
    got = dsir_train(_tgt(spark), _raw(spark), buckets=B)
    want = replay_dsir_train(TARGET, RAW, buckets=B)
    assert got == want
    # full table: every bucket present, incl. zero-count ones at the
    # constant smoothed floor
    assert set(got) == set(range(B))
    t_grams = sum(len(_grams(t)) for t in TARGET)
    r_grams = sum(len(_grams(t)) for t in RAW)
    floor = math.floor(
        MICROS * math.log((r_grams * 2 + B) / (t_grams * 2 + B))
    )
    zero_buckets = set(range(B)) - {
        _bucket(g) for t in TARGET + RAW for g in _grams(t)
    }
    assert zero_buckets and all(got[b] == floor for b in zero_buckets)


def test_train_invariant_under_repartitioning(spark):
    one = dsir_train(_tgt(spark).coalesce(1), _raw(spark).coalesce(1), buckets=B)
    many = dsir_train(
        _tgt(spark).repartition(7), _raw(spark).repartition(13), buckets=B
    )
    assert one == many


def test_weights_match_reference_fold_and_rank_target_docs_higher(spark):
    ratios = dsir_train(_tgt(spark), _raw(spark), buckets=B)
    got = {
        r["doc_id"]: (r["n_grams"], r["weight_micros"])
        for r in dsir_weights(_raw(spark), ratios, buckets=B).collect()
    }
    for i, t in enumerate(RAW):
        gs = _grams(t)
        assert got[i] == (len(gs), sum(ratios[_bucket(g)] for g in gs)), (i, t)
    # every doc came back, incl. NULL/empty/one-token ones at (0, 0)
    assert set(got) == set(range(len(RAW)))
    assert got[4] == (0, 0) and got[5] == (0, 0)
    assert got[6] == (0, 0) and got[7] == (0, 0)
    # the target-looking raw doc out-scores the out-of-domain ones
    # per gram (the selection signal DSIR exists for)
    per_gram = {
        i: got[i][1] / got[i][0] for i in range(4) if got[i][0]
    }
    assert per_gram[0] > per_gram[1] and per_gram[0] > per_gram[2]


def test_full_table_contract_enforced(spark):
    ratios = dsir_train(_tgt(spark), _raw(spark), buckets=B)
    ratios.pop(0)
    with pytest.raises(AssertionError):
        dsir_weights(_raw(spark), ratios, buckets=B)
