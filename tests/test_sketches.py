"""Mergeable HLL sketch maintenance: determinism contracts + plan shape.

The operator's promise is incremental distinct counting WITHOUT fact
rescans; these tests pin the properties that make that safe to rely on:
coupon-regime exactness under any row split, bounded (and cross-split-
consistent) dense-regime error, parquet round-trip of the binary state,
advance==rebuild, loud failure on mixed precision, inclusion-exclusion
overlap estimates, and a rollup plan that provably never touches the
fact table.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from asterlake.operators.sketches import (
    advance_sketch_state,
    distinct_sketches,
    rollup_sketches,
    sketch_estimates,
    sketch_overlap,
)
from asterlake.plans.inspect import has_node, plan_string, scans


def _rows(n, groups, card, days):
    # deterministic, mildly adversarial: values cycle so every (g, day)
    # cell sees an overlapping-but-distinct slice of the value domain
    return [
        (i % groups, f"d{(i * 7) % days}", (i * 131 + (i % groups)) % card)
        for i in range(n)
    ]


def _estimates(spark, rows, split_cols):
    df = spark.createDataFrame(rows, "g int, day string, v int")
    daily = distinct_sketches(df, split_cols, "v")
    monthly = rollup_sketches(daily, ["g"])
    return {
        r.g: r.est
        for r in sketch_estimates(monthly, out="est").collect()
    }


def test_low_cardinality_rollup_is_exact(spark):
    # below the sparse->dense promotion the sketch stores explicit
    # coupons and unions preserve them: the estimate IS the exact
    # count, for ANY partitioning of the rows into sketches
    rows = _rows(4000, groups=13, card=60, days=9)
    exact = {}
    for g, _, v in rows:
        exact.setdefault(g, set()).add(v)
    want = {g: len(vs) for g, vs in exact.items()}
    assert _estimates(spark, rows, ["g", "day"]) == want
    rebucketed = [(g, f"b{v % 7}", v) for g, _, v in rows]
    assert _estimates(spark, rebucketed, ["g", "day"]) == want


def test_any_split_stays_within_bound(spark):
    # past promotion the estimate depends (slightly) on the split —
    # cell sketches promote at different points and unions drop HIP —
    # but every split must stay inside the 3-sigma bound of exact,
    # and unrelated splits of the same rows must agree closely
    rows = _rows(30000, groups=7, card=8000, days=11)
    by_day = _estimates(spark, rows, ["g", "day"])
    rebucketed = [(g, f"b{v % 23}", v) for g, _, v in rows]
    by_bucket = _estimates(spark, rebucketed, ["g", "day"])
    exact = {}
    for g, _, v in rows:
        exact.setdefault(g, set()).add(v)
    for g, vs in exact.items():
        x = len(vs)
        assert abs(by_day[g] - x) <= 0.05 * x, (g, by_day[g], x)
        assert abs(by_bucket[g] - x) <= 0.05 * x, (g, by_bucket[g], x)
        assert abs(by_day[g] - by_bucket[g]) <= 0.03 * x


def test_dense_regime_error_bound(spark):
    # past promotion the estimate is approximate: rse = 1.04/sqrt(2^12)
    # ~= 1.6%; assert a 3-sigma bound per group
    rows = _rows(30000, groups=5, card=9000, days=11)
    got = _estimates(spark, rows, ["g", "day"])
    exact = {}
    for g, _, v in rows:
        exact.setdefault(g, set()).add(v)
    for g, x in exact.items():
        assert abs(got[g] - len(x)) <= 0.05 * len(x), (g, got[g], len(x))


def test_state_parquet_round_trip(spark, tmp_path):
    rows = _rows(12000, groups=6, card=3000, days=8)
    df = spark.createDataFrame(rows, "g int, day string, v int")
    daily = distinct_sketches(df, ["g", "day"], "v")
    path = str(tmp_path / "sketch_state")
    daily.write.parquet(path)
    stored = spark.read.parquet(path)
    assert dict(stored.dtypes)["sketch"] == "binary"
    live = {
        r.g: r.est
        for r in sketch_estimates(
            rollup_sketches(daily, ["g"]), out="est"
        ).collect()
    }
    reread = {
        r.g: r.est
        for r in sketch_estimates(
            rollup_sketches(stored, ["g"]), out="est"
        ).collect()
    }
    assert live == reread


def test_advance_equals_rebuild(spark):
    rows = _rows(15000, groups=5, card=4000, days=6)
    df = spark.createDataFrame(rows, "g int, day string, v int")
    days = sorted({d for _, d, _ in rows})
    state = distinct_sketches(
        df.filter(F.col("day") == days[0]), ["g"], "v"
    )
    for d in days[1:]:
        state = advance_sketch_state(
            state, df.filter(F.col("day") == d), ["g"], "v"
        )
    incremental = {
        r.g: r.est for r in sketch_estimates(state, out="est").collect()
    }
    oneshot = {
        r.g: r.est
        for r in sketch_estimates(
            rollup_sketches(distinct_sketches(df, ["g", "day"], "v"), ["g"]),
            out="est",
        ).collect()
    }
    assert incremental == oneshot


def test_mixed_lgk_state_fails_loudly(spark):
    df = spark.createDataFrame(
        [(1, i) for i in range(100)], "g int, v int"
    )
    mixed = distinct_sketches(df, ["g"], "v", lgk=12).unionByName(
        distinct_sketches(df, ["g"], "v", lgk=11)
    )
    with pytest.raises(Exception, match="lgConfigK|HLL_UNION"):
        rollup_sketches(mixed, ["g"]).collect()


def test_rollup_plan_never_scans_the_fact(spark, tmp_path):
    # the range-query path must read ONLY the stored sketch table: one
    # parquet scan (the sketches), object-hash aggregation, no join back
    # to raw values
    rows = _rows(8000, groups=4, card=2000, days=7)
    df = spark.createDataFrame(rows, "g int, day string, v int")
    path = str(tmp_path / "daily_sketches")
    distinct_sketches(df, ["g", "day"], "v").write.parquet(path)
    stored = spark.read.parquet(path)
    answer = sketch_estimates(rollup_sketches(stored, ["g"]), out="est")
    plan = plan_string(answer)
    sc = scans(plan)
    assert len(sc) == 1 and "daily_sketches" in sc[0].location
    assert set(sc[0].read_columns) == {"g", "sketch"}
    # sketch aggregation runs in ObjectHashAggregate with a map-side
    # partial union (two instances bracketing one exchange), so at any
    # scale the shuffle carries one merged sketch per (task, group)
    tree = plan.split("\n\n", 1)[0]
    assert tree.count("ObjectHashAggregate") == 2
    assert tree.count("Exchange") == 1
    assert "partial_hll_union_agg" in plan


def test_build_aggregate_is_map_side_combinable(spark):
    rows = _rows(5000, groups=3, card=1000, days=5)
    df = spark.createDataFrame(rows, "g int, day string, v int")
    plan = plan_string(distinct_sketches(df, ["g"], "v"))
    tree = plan.split("\n\n", 1)[0]
    # partial sketch per task, final merge after the exchange: the
    # ObjectHashAggregate appears twice bracketing one shuffle
    assert tree.count("ObjectHashAggregate") == 2
    assert tree.count("Exchange") == 1


def test_overlap_exact_in_coupon_regime(spark):
    # inclusion-exclusion over exact coupon-mode sketches is exact;
    # keys present on one side only are dropped by the inner join
    la = [(1, v) for v in range(40)] + [(2, v) for v in range(10)] + [
        (9, 0)
    ]
    rb = [(1, v) for v in range(20, 70)] + [(2, v) for v in range(100, 105)]
    A = distinct_sketches(
        spark.createDataFrame(la, "k int, v int"), ["k"], "v"
    )
    B = distinct_sketches(
        spark.createDataFrame(rb, "k int, v int"), ["k"], "v"
    )
    got = {
        r.k: (r.est_left, r.est_right, r.est_union, r.est_overlap)
        for r in sketch_overlap(A, B, ["k"]).collect()
    }
    # k=1: [0,40) vs [20,70) -> overlap [20,40); k=2 disjoint -> clamp 0
    assert got == {1: (40, 50, 70, 20), 2: (10, 5, 15, 0)}


def test_overlap_is_a_pure_projection_after_the_join(spark):
    # no aggregate runs on the overlap path: hll_union is a two-column
    # scalar function, so the plan is join + project only
    df = spark.createDataFrame([(1, v) for v in range(50)], "k int, v int")
    A = distinct_sketches(df, ["k"], "v")
    plan = plan_string(sketch_overlap(A, A, ["k"]))
    tree = plan.split("\n\n", 1)[0]
    # the only aggregates are the two sketch BUILDS under the join
    assert tree.count("ObjectHashAggregate") == 4  # 2 builds x (partial+final)
    assert "hll_union(" in plan
