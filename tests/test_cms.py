"""Count-min sketch relation: one-sided error guarantee vs exact
counts, bit-identical merge/advance/rollup vs one-shot rebuild, bounded
state, NULL hygiene, join-size estimation, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asterlake.operators.cms import (
    cms_advance,
    cms_build,
    cms_estimate,
    cms_join_size,
    cms_merge,
)

DEPTH, WIDTH = 4, 256


@pytest.fixture(scope="module")
def tokens(spark):
    """Zipf-ish token stream with a known exact histogram: token t_k
    appears k times (k = 1..40), total 820 rows, plus a month column
    splitting the stream 60/40."""
    rows = []
    i = 0
    for k in range(1, 41):
        for _ in range(k):
            rows.append((i, f"t_{k}", "m1" if i % 5 < 3 else "m2"))
            i += 1
    return spark.createDataFrame(rows, "id long, tok string, month string").cache()


def _exact(tokens):
    return {
        r.tok: r.cnt
        for r in tokens.groupBy("tok").agg(F.count("*").alias("cnt")).collect()
    }


def test_estimate_upper_bounds_exact_and_is_tight(spark, tokens):
    """The CM contract on real keys: every estimate >= the true count,
    and with width >> distinct keys the total overestimate stays tiny
    (40 keys in 4x256 rows collide rarely)."""
    sk = cms_build(tokens, [], "tok", DEPTH, WIDTH)
    probes = tokens.select("tok")
    est = {
        r.tok: r.estimate
        for r in cms_estimate(sk, probes, "tok", None, DEPTH, WIDTH).collect()
    }
    exact = _exact(tokens)
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)
    over = sum(est[t] - exact[t] for t in exact)
    assert over <= 0.05 * sum(exact.values()), over  # e/width*N ~ 0.01N


def test_absent_keys_mostly_estimate_zero(spark, tokens):
    sk = cms_build(tokens, [], "tok", DEPTH, WIDTH)
    ghosts = spark.range(200).select(
        F.concat(F.lit("ghost_"), F.col("id")).alias("tok")
    )
    est = [
        r.estimate
        for r in cms_estimate(sk, ghosts, "tok", None, DEPTH, WIDTH).collect()
    ]
    assert len(est) == 200
    assert all(e >= 0 for e in est)
    # absent keys need ALL depth slots to collide to over-count
    assert sum(1 for e in est if e > 0) <= 10


def test_merge_equals_one_shot_rebuild_bitwise(spark, tokens):
    """Counters add exactly: sketch(A) + sketch(B) must equal
    sketch(A union B) ROW FOR ROW — integer sums, no tolerance."""
    a = tokens.filter(F.col("id") % 2 == 0)
    b = tokens.filter(F.col("id") % 2 == 1)
    merged = cms_merge(
        cms_build(a, [], "tok", DEPTH, WIDTH).unionByName(
            cms_build(b, [], "tok", DEPTH, WIDTH)
        ),
        [],
    )
    whole = cms_build(tokens, [], "tok", DEPTH, WIDTH)
    got = sorted((r.slot, r.cnt) for r in merged.collect())
    want = sorted((r.slot, r.cnt) for r in whole.collect())
    assert got == want


def test_advance_equals_rebuild(spark, tokens):
    state = cms_build(
        tokens.filter(F.col("id") < 500), [], "tok", DEPTH, WIDTH
    )
    advanced = cms_advance(
        state, tokens.filter(F.col("id") >= 500), [], "tok", DEPTH, WIDTH
    )
    whole = cms_build(tokens, [], "tok", DEPTH, WIDTH)
    assert sorted((r.slot, r.cnt) for r in advanced.collect()) == sorted(
        (r.slot, r.cnt) for r in whole.collect()
    )


def test_grouped_rollup_matches_direct_global(spark, tokens):
    """Per-month sketches merged to global == the global build —
    the any-range rollup never needs the fact again."""
    monthly = cms_build(tokens, ["month"], "tok", DEPTH, WIDTH)
    rolled = cms_merge(monthly.drop("month"), [])
    whole = cms_build(tokens, [], "tok", DEPTH, WIDTH)
    assert sorted((r.slot, r.cnt) for r in rolled.collect()) == sorted(
        (r.slot, r.cnt) for r in whole.collect()
    )
    # and grouped estimates answer per-month point queries
    est = cms_estimate(
        monthly, tokens.select("month", "tok"), "tok", ["month"],
        DEPTH, WIDTH,
    )
    exact = {
        (r.month, r.tok): r.cnt
        for r in tokens.groupBy("month", "tok")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    got = {(r.month, r.tok): r.estimate for r in est.collect()}
    assert set(got) == set(exact)
    assert all(got[k] >= exact[k] for k in exact)


def test_bounded_state_and_null_hygiene(spark, tokens):
    sk = cms_build(tokens, [], "tok", DEPTH, WIDTH)
    n_slots = sk.count()
    assert n_slots <= DEPTH * 40  # 40 keys, at most depth slots each
    # birthday collisions shave a few slots (40 keys in width 256,
    # ~3 expected per row) but never approach degeneracy
    assert n_slots >= DEPTH * 30
    with_nulls = tokens.withColumn(
        "tok", F.when(F.col("id") % 3 == 0, None).otherwise(F.col("tok"))
    )
    sk_n = cms_build(with_nulls, [], "tok", DEPTH, WIDTH)
    n_nonnull = with_nulls.filter(F.col("tok").isNotNull()).count()
    # total mass per hash row == number of non-null rows
    per_row = (
        sk_n.groupBy((F.col("slot") / WIDTH).cast("int").alias("r"))
        .agg(F.sum("cnt").alias("mass"))
        .collect()
    )
    assert len(per_row) == DEPTH
    assert all(r.mass == n_nonnull for r in per_row)
    # NULL probes vanish rather than estimating the seed-hash slot
    probes = spark.createDataFrame([(None,), ("t_40",)], "tok string")
    est = cms_estimate(sk_n, probes, "tok", None, DEPTH, WIDTH).collect()
    assert len(est) == 1 and est[0].tok == "t_40"


def test_weight_col_counts_preaggregated_rows(spark, tokens):
    pre = tokens.groupBy("tok").agg(F.count("*").alias("w"))
    sk_w = cms_build(pre, [], "tok", DEPTH, WIDTH, weight_col="w")
    sk = cms_build(tokens, [], "tok", DEPTH, WIDTH)
    assert sorted((r.slot, r.cnt) for r in sk_w.collect()) == sorted(
        (r.slot, r.cnt) for r in sk.collect()
    )


def test_join_size_estimate_upper_bounds_exact(spark, tokens):
    """The CM inner product vs the true equi-join row count, plus the
    disjoint-keys and group-spine corners."""
    left = tokens.filter(F.col("id") % 2 == 0).select("tok")
    right = tokens.filter(F.col("id") % 3 == 0).select("tok")
    exact = left.join(right, on="tok").count()
    na, nb = left.count(), right.count()
    noise = na * nb / WIDTH  # expected per-row inner-product inflation
    a = cms_build(left, [], "tok", DEPTH, WIDTH)
    b = cms_build(right, [], "tok", DEPTH, WIDTH)
    est = cms_join_size(a, b, None, DEPTH, WIDTH).collect()[0][0]
    assert est >= exact
    assert est <= exact + 3 * noise, (est, exact, noise)
    # DISJOINT key sets do NOT estimate 0 in general — cross-key
    # collisions add ~na*nb/width per row and the min can't dodge all
    # depth rows at this density; the honest guarantee is the same
    # one-sided band around the true value 0
    ghosts = spark.range(50).select(
        F.concat(F.lit("g_"), F.col("id")).alias("tok")
    )
    g = cms_build(ghosts, [], "tok", DEPTH, WIDTH)
    ghost_est = cms_join_size(a, g, None, DEPTH, WIDTH).collect()[0][0]
    assert 0 <= ghost_est <= 3 * na * 50 / WIDTH
    # grouped: a group present on one side only surfaces with 0
    am = cms_build(
        tokens.filter("month = 'm1'"), ["month"], "tok", DEPTH, WIDTH
    )
    bm = cms_build(
        tokens.filter("month = 'm2'").withColumn("month", F.lit("m9")),
        ["month"], "tok", DEPTH, WIDTH,
    )
    rows = {
        r.month: r.join_size_estimate
        for r in cms_join_size(am, bm, ["month"], DEPTH, WIDTH).collect()
    }
    assert set(rows) == {"m1", "m9"} and rows["m1"] == 0 and rows["m9"] == 0


def test_plan_shapes(spark, tokens):
    """100 TB pins: the build's only exchange carries pre-combined
    (slot) partials; the estimate probes via BroadcastHashJoin; nothing
    drops to Python."""
    build_plan = (
        cms_build(tokens, [], "tok", DEPTH, WIDTH)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial" in build_plan.lower()
    assert "BatchEvalPython" not in build_plan
    est_plan = (
        cms_estimate(
            cms_build(tokens, [], "tok", DEPTH, WIDTH),
            tokens.select("tok"), "tok", None, DEPTH, WIDTH,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in est_plan
    assert "BatchEvalPython" not in est_plan
    assert "CartesianProduct" not in est_plan
