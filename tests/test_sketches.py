"""Mergeable sketch maintenance (HLL, Theta, KLL): determinism
contracts + plan shape.

The family's promise is incremental distinct counts / set algebra /
quantiles WITHOUT fact rescans; these tests pin the properties that
make that safe to rely on: exact-mode equality to Python set/order-
statistic oracles under any row split, bounded (and cross-split-
consistent) error past capacity, parquet round-trips of the binary
states, advance==rebuild, loud failure on mixed precision, and rollup
plans that provably never touch the fact table (map-side-combinable
ObjectHashAggregates throughout).
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


# ---------------------------------------------------------------------------
# Theta: distinct-set algebra
# ---------------------------------------------------------------------------


def test_theta_set_algebra_exact_below_k(spark):
    from asterlake.operators.sketches import theta_set_estimates, theta_sketches

    la = [(1, v) for v in range(60)] + [(2, v) for v in range(20)]
    rb = [(1, v) for v in range(30, 100)] + [(2, v) for v in range(200, 205)]
    A = theta_sketches(spark.createDataFrame(la, "k int, v int"), ["k"], "v")
    B = theta_sketches(spark.createDataFrame(rb, "k int, v int"), ["k"], "v")
    got = {
        r.k: (
            r.est_left,
            r.est_right,
            r.est_union,
            r.est_intersection,
            r.est_difference,
        )
        for r in theta_set_estimates(A, B, ["k"]).collect()
    }
    # exact mode: every estimate is the true set cardinality, including
    # the intersection HLL inclusion-exclusion can only approximate and
    # the difference it cannot express at all
    assert got == {
        1: (60.0, 70.0, 100.0, 30.0, 30.0),
        2: (20.0, 5.0, 25.0, 0.0, 20.0),
    }


def test_theta_rollup_matches_direct_below_k(spark):
    from asterlake.operators.sketches import theta_rollup, theta_sketches

    rows = _rows(4000, groups=7, card=900, days=6)
    df = spark.createDataFrame(rows, "g int, day string, v int")
    merged = theta_rollup(theta_sketches(df, ["g", "day"], "v"), ["g"])
    got = {
        r.g: r.est
        for r in merged.select(
            "g", F.theta_sketch_estimate("sketch").alias("est")
        ).collect()
    }
    exact = {}
    for g, _, v in rows:
        exact.setdefault(g, set()).add(v)
    assert got == {g: float(len(vs)) for g, vs in exact.items()}


def test_theta_large_cardinality_error_bound(spark):
    from asterlake.operators.sketches import theta_rollup, theta_sketches

    n = 40000
    df = spark.createDataFrame(
        [(0, f"d{i % 5}", i * 7 % 20011) for i in range(n)],
        "g int, day string, v int",
    )
    merged = theta_rollup(theta_sketches(df, ["g", "day"], "v"), ["g"])
    est = merged.select(
        F.theta_sketch_estimate("sketch").alias("e")
    ).first().e
    exact = len({i * 7 % 20011 for i in range(n)})
    assert abs(est - exact) <= 0.05 * exact, (est, exact)


# ---------------------------------------------------------------------------
# KLL: mergeable quantiles
# ---------------------------------------------------------------------------


def test_quantile_rollup_exact_mode(spark):
    from asterlake.operators.sketches import (
        quantile_estimates,
        quantile_rollup,
        quantile_sketches,
    )

    import math

    vals = [(i % 3, f"d{i % 4}", float((i * 37) % 150)) for i in range(120)]
    df = spark.createDataFrame(vals, "g int, day string, v double")
    daily = quantile_sketches(df, ["g", "day"], "v")
    merged = quantile_rollup(daily, ["g"])
    got = {
        r.g: (r.q00, r.q50, r.q95, r.q100, r.q_n)
        for r in quantile_estimates(
            merged,
            [0.0, 0.5, 0.95, 1.0],
            ["q00", "q50", "q95", "q100"],
        ).collect()
    }
    by_g: dict = {}
    for g, _, v in vals:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        vs.sort()
        n = len(vs)
        want = tuple(
            vs[max(0, math.ceil(q * n) - 1)] for q in (0.0, 0.5, 0.95, 1.0)
        ) + (n,)
        assert got[g] == want, (g, got[g], want)


def test_quantile_merge_order_independent_in_exact_mode(spark):
    from asterlake.operators.sketches import (
        quantile_estimates,
        quantile_rollup,
        quantile_sketches,
    )

    vals = [(0, f"c{i % 7}", float(i)) for i in range(150)]
    df = spark.createDataFrame(vals, "g int, cell string, v double")
    a = quantile_estimates(
        quantile_rollup(quantile_sketches(df, ["g", "cell"], "v"), ["g"]),
        [0.25, 0.5, 0.75],
    ).select("q25", "q50", "q75").first()
    resplit = spark.createDataFrame(
        [(g, f"x{int(v) % 11}", v) for g, _, v in vals],
        "g int, cell string, v double",
    )
    b = quantile_estimates(
        quantile_rollup(
            quantile_sketches(resplit, ["g", "cell"], "v"), ["g"]
        ),
        [0.25, 0.5, 0.75],
    ).select("q25", "q50", "q75").first()
    assert tuple(a) == tuple(b)


def test_quantile_rank_error_bound_past_capacity(spark):
    from asterlake.operators.sketches import quantile_estimates, quantile_sketches

    n = 30000
    df = spark.createDataFrame(
        [(0, float((i * 101) % n)) for i in range(n)], "g int, v double"
    )
    r = quantile_estimates(
        quantile_sketches(df, ["g"], "v"), [0.5, 0.9]
    ).first()
    # values are a permutation of 0..n-1: value/(n-1) ~= its rank; KLL
    # k=200 guarantees ~1.65% rank error at 99% confidence — assert 5%
    assert abs(r.q50 / (n - 1) - 0.5) <= 0.05
    assert abs(r.q90 / (n - 1) - 0.9) <= 0.05
    assert r.q_n == n


def test_sketch_tables_parquet_round_trip_theta_and_kll(spark, tmp_path):
    from asterlake.operators.sketches import (
        quantile_estimates,
        quantile_rollup,
        quantile_sketches,
        theta_rollup,
        theta_sketches,
    )

    rows = [(i % 2, f"d{i % 3}", float(i % 70)) for i in range(300)]
    df = spark.createDataFrame(rows, "g int, day string, v double")
    tpath, kpath = str(tmp_path / "theta"), str(tmp_path / "kll")
    theta_sketches(df, ["g", "day"], "v").write.parquet(tpath)
    quantile_sketches(df, ["g", "day"], "v").write.parquet(kpath)
    import math

    by_g: dict = {}
    for g, _, v in rows:
        by_g.setdefault(g, []).append(v)
    t_est = {
        r.g: float(r.est)
        for r in theta_rollup(spark.read.parquet(tpath), ["g"])
        .select("g", F.theta_sketch_estimate("sketch").alias("est"))
        .collect()
    }
    assert t_est == {g: float(len(set(vs))) for g, vs in by_g.items()}
    k_est = {
        r.g: r.q50
        for r in quantile_estimates(
            quantile_rollup(spark.read.parquet(kpath), ["g"]), [0.5]
        ).collect()
    }
    want_q50 = {
        g: sorted(vs)[math.ceil(0.5 * len(vs)) - 1] for g, vs in by_g.items()
    }
    assert k_est == want_q50


def test_theta_and_kll_builds_are_map_side_combinable(spark):
    from asterlake.operators.sketches import quantile_sketches, theta_sketches

    df = spark.createDataFrame(
        [(1, float(i)) for i in range(100)], "g int, v double"
    )
    for built in (
        theta_sketches(df, ["g"], "v"),
        quantile_sketches(df, ["g"], "v"),
    ):
        tree = plan_string(built).split("\n\n", 1)[0]
        assert tree.count("ObjectHashAggregate") == 2
        assert tree.count("Exchange") == 1


def test_empty_inputs_yield_empty_or_zero(spark):
    """Empty frames flow through every sketch path without raising:
    builds yield zero groups, rollups of empty states stay empty, and a
    group whose values are all NULL keeps its row with estimate 0."""
    from asterlake.operators.sketches import (
        quantile_estimates,
        quantile_rollup,
        quantile_sketches,
        theta_rollup,
        theta_set_estimates,
        theta_sketches,
    )

    empty = spark.createDataFrame([], "g int, day string, v int")
    assert distinct_sketches(empty, ["g", "day"], "v").count() == 0
    assert rollup_sketches(
        distinct_sketches(empty, ["g", "day"], "v"), ["g"]
    ).count() == 0
    assert theta_rollup(
        theta_sketches(empty, ["g", "day"], "v"), ["g"]
    ).count() == 0
    emptyd = spark.createDataFrame([], "g int, v double")
    assert quantile_rollup(
        quantile_sketches(emptyd, ["g"], "v"), ["g"]
    ).count() == 0
    some = theta_sketches(
        spark.createDataFrame([(1, 5)], "k int, v int"), ["k"], "v"
    )
    none = theta_sketches(
        spark.createDataFrame([], "k int, v int"), ["k"], "v"
    )
    assert theta_set_estimates(some, none, ["k"]).count() == 0

    nulls = spark.createDataFrame(
        [(1, None), (1, None)], "g int, v int"
    )
    r = sketch_estimates(
        distinct_sketches(nulls, ["g"], "v"), out="est"
    ).first()
    assert (r.g, r.est) == (1, 0)


def test_quantile_name_collisions_fail_loudly(spark):
    from asterlake.operators.sketches import quantile_estimates, quantile_sketches

    sk = quantile_sketches(
        spark.createDataFrame([(1, 2.0)], "g int, v double"), ["g"], "v"
    )
    with pytest.raises(ValueError, match="collide"):
        quantile_estimates(sk, [0.375, 0.379])


def test_theta_similarity_pairs_exact_regime_matches_python_sets(spark):
    """Set-similarity join over a stored Theta relation: in the exact
    regime every pair's sizes/intersection/union and the integer-div
    ppm measures equal the Python-set ground truth; the min_jaccard
    prune keeps exactly the qualifying pairs."""
    from asterlake.operators.sketches import (
        theta_similarity_pairs,
        theta_sketches,
    )

    groups = {
        "a": set(range(0, 100)),
        "b": set(range(50, 150)),   # jaccard 1/3 vs a
        "c": set(range(0, 100)),    # identical to a
        "d": set(range(500, 520)),  # disjoint from all
    }
    rows = [(k, v) for k, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, val long")
    th = theta_sketches(df, ["grp"], "val", lg_k=14)
    got = {
        (r.key_a, r.key_b): r
        for r in theta_similarity_pairs(
            th, "grp", lg_union=14
        ).collect()
    }
    keys = sorted(groups)
    want_pairs = [
        (x, y) for i, x in enumerate(keys) for y in keys[i + 1 :]
    ]
    assert sorted(got) == want_pairs
    for ka, kb in want_pairs:
        A, B = groups[ka], groups[kb]
        r = got[(ka, kb)]
        inter, union = len(A & B), len(A | B)
        assert (r.est_a, r.est_b) == (len(A), len(B)), (ka, kb)
        assert (r.est_intersection, r.est_union) == (inter, union)
        assert r.jaccard_ppm == inter * 10**6 // union
        assert r.containment_a_ppm == inter * 10**6 // len(A)
        assert r.containment_b_ppm == inter * 10**6 // len(B)
    # identical sets: full similarity; disjoint: zero
    assert got[("a", "c")].jaccard_ppm == 1_000_000
    assert got[("a", "d")].jaccard_ppm == 0
    # the prune keeps exactly the pairs at/above the threshold
    kept = {
        (r.key_a, r.key_b)
        for r in theta_similarity_pairs(
            th, "grp", min_jaccard_ppm=300_000, lg_union=14
        ).collect()
    }
    assert kept == {("a", "b"), ("a", "c"), ("b", "c")}


def test_theta_similarity_pairs_plan_is_broadcast_over_sketches(spark):
    from asterlake.operators.sketches import (
        theta_similarity_pairs,
        theta_sketches,
    )

    df = spark.createDataFrame(
        [(str(i % 3), i) for i in range(60)], "grp string, val long"
    )
    sim = theta_similarity_pairs(
        theta_sketches(df, ["grp"], "val", lg_k=14), "grp", lg_union=14
    )
    plan = plan_string(sim)
    # non-equi pair expansion broadcasts the bounds-sized sketch side
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
