"""Boundary semantics for incremental aggregate maintenance
(operators/incremental.py); exact agreement with a one-pass recompute on
real data is pinned by oracle parity (q_incremental_agg_merge)."""

from __future__ import annotations

from asterlake.operators.incremental import merge_aggregates


def _tables(spark):
    base = spark.createDataFrame(
        [("a", 10, 2, 1.0, 5.0), ("b", 20, 3, 2.0, 6.0)],
        "k string, s long, n long, lo double, hi double",
    )
    delta = spark.createDataFrame(
        [("b", 5, 1, 0.5, 9.0), ("c", 7, 2, 3.0, 4.0)],
        "k string, s long, n long, lo double, hi double",
    )
    return base, delta


def test_merge_combines_shared_and_passes_through_disjoint(spark):
    base, delta = _tables(spark)
    got = {
        r.k: (r.s, r.n, r.lo, r.hi)
        for r in merge_aggregates(
            base, delta, ["k"],
            sum_cols=["s"], count_cols=["n"],
            min_cols=["lo"], max_cols=["hi"],
        ).collect()
    }
    assert got == {
        "a": (10, 2, 1.0, 5.0),      # base only: passthrough
        "b": (25, 4, 0.5, 9.0),      # shared: sum/count add, min/max fold
        "c": (7, 2, 3.0, 4.0),       # delta only: passthrough
    }


def test_merge_empty_delta_is_identity(spark):
    base, delta = _tables(spark)
    empty = delta.filter("1=0")
    got = sorted(
        map(tuple, merge_aggregates(
            base, empty, ["k"],
            sum_cols=["s"], count_cols=["n"],
            min_cols=["lo"], max_cols=["hi"],
        ).collect())
    )
    assert got == sorted(map(tuple, base.collect()))


def test_merge_null_key_groups_combine(spark):
    # a NULL group key (eqNullSafe) must merge, not duplicate
    base = spark.createDataFrame([(None, 1)], "k string, s long")
    delta = spark.createDataFrame([(None, 2)], "k string, s long")
    got = merge_aggregates(base, delta, ["k"], sum_cols=["s"]).collect()
    assert len(got) == 1 and got[0].s == 3 and got[0].k is None


def test_merge_all_null_partials_stay_null(spark):
    """Round-3 advice: SUM partials that are NULL on BOTH sides (all-NULL
    input values for that key in every batch) must merge to NULL — a
    one-pass recompute yields NULL, and the merge is contractually
    bit-identical to it. A NULL partial on ONE side still folds as 0
    against the other side's value, matching the recompute."""
    base = spark.createDataFrame([("a", None), ("b", None), ("c", 5)],
                                 "k string, s long")
    delta = spark.createDataFrame([("a", None), ("b", 3)],
                                  "k string, s long")
    got = {r.k: r.s for r in
           merge_aggregates(base, delta, ["k"], sum_cols=["s"]).collect()}
    # recompute-equivalent: a=NULL (all inputs NULL), b=3, c=5
    assert got == {"a": None, "b": 3, "c": 5}
