"""Reciprocal-rank fusion (operators/fusion) vs a pure-Python replay.
R13 query candidate (fuses the gated bm25/cosine legs; the oracle
replays ranks with ROW_NUMBER and the reciprocal as integer div)."""

from __future__ import annotations

from asterlake.operators.fusion import rrf_fuse

MICROS = 1_000_000_000_000


def _ref_rrf(legs, k=60):
    fused = {}
    n = {}
    for leg in legs:
        ranked = sorted(leg, key=lambda sv: (-sv[1], sv[0]))
        for rank, (doc, _s) in enumerate(ranked, 1):
            fused[doc] = fused.get(doc, 0) + MICROS // (k + rank)
            n[doc] = n.get(doc, 0) + 1
    return fused, n


def test_rrf_matches_python_replay_with_ties_and_partial_overlap(spark):
    lex = [(1, 9.5), (2, 9.5), (3, 4.0), (7, 1.0)]   # tie on top score
    sem = [(3, 0.99), (1, 0.50), (9, 0.10)]           # 9 only here
    got = {
        r.doc_id: (r.rrf_micros, r.n_legs)
        for r in rrf_fuse(
            [
                (spark.createDataFrame(lex, "doc_id long, s double"), "s"),
                (spark.createDataFrame(sem, "doc_id long, s double"), "s"),
            ]
        ).collect()
    }
    fused, n = _ref_rrf([lex, sem])
    assert got == {d: (fused[d], n[d]) for d in fused}
    # the score-tied pair (1, 2) breaks deterministically by id: doc 1
    # outranks doc 2 in the lexical leg
    assert got[1][0] > got[2][0]


def test_rrf_top_truncation_and_order(spark):
    leg = [(i, float(100 - i)) for i in range(10)]
    df = spark.createDataFrame(leg, "doc_id long, s double")
    rows = rrf_fuse([(df, "s")], top=3).collect()
    assert [r.doc_id for r in rows] == [0, 1, 2]
    assert rows[0].rrf_micros == MICROS // 61


def test_rrf_dedupes_ids_within_a_leg(spark):
    """A duplicate id inside one leg collapses to its best score before
    ranking (r12 ADVICE): it gets ONE rank and one contribution, and
    n_legs stays bounded by the leg count."""
    leg = [(1, 5.0), (1, 9.0), (2, 7.0)]  # id 1 appears twice
    df = spark.createDataFrame(leg, "doc_id long, s double")
    got = {
        r.doc_id: (r.rrf_micros, r.n_legs)
        for r in rrf_fuse([(df, "s")]).collect()
    }
    # dedup keeps (1, 9.0): id 1 ranks first, id 2 second
    assert got == {
        1: (MICROS // 61, 1),
        2: (MICROS // 62, 1),
    }


def test_rrf_top_zero_means_zero_rows(spark):
    df = spark.createDataFrame([(1, 2.0)], "doc_id long, s double")
    assert rrf_fuse([(df, "s")], top=0).count() == 0
    assert rrf_fuse([(df, "s")], top=None).count() == 1


def test_rrf_rejects_empty_input(spark):
    import pytest

    with pytest.raises(ValueError, match="at least one ranking"):
        rrf_fuse([])


def test_rrf_empty_legs_yield_empty_fusion(spark):
    empty = spark.createDataFrame([], "doc_id long, s double")
    assert rrf_fuse([(empty, "s"), (empty, "s")]).count() == 0
