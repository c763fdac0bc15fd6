"""Bloom-filter semi-join reduction (operators/bloomjoin.py): exactness
(identical to the plain join, even with a deliberately tiny bitmap full
of false positives), the no-false-negative contract, bounded bitmap
state, and the plan shape (fact filtered by pure projection before any
exchange; bitmap subtree bounded)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from asterlake.operators.bloomjoin import (
    bloom_bitmap,
    bloom_probe,
    bloom_semi_join,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


@pytest.fixture(scope="module")
def urgent_orders(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )


def _counts(df):
    return {
        r.l_returnflag: r.n
        for r in df.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }


def test_bloom_semi_join_equals_plain_join(lineitem, urgent_orders):
    bloom = bloom_semi_join(lineitem, urgent_orders, "l_orderkey", "o_orderkey")
    plain = lineitem.join(
        urgent_orders, lineitem.l_orderkey == F.col("o_orderkey")
    )
    assert _counts(bloom) == _counts(plain)


def test_exact_even_when_the_bitmap_is_saturated(lineitem, urgent_orders):
    """A 256-bit bitmap over ~hundreds of keys is mostly 1s — nearly
    every probe is a false positive. The exact join must still produce
    the plain-join result: the bitmap is a physical pre-filter only."""
    bloom = bloom_semi_join(
        lineitem, urgent_orders, "l_orderkey", "o_orderkey",
        n_bits=256, n_hashes=2,
    )
    plain = lineitem.join(
        urgent_orders, lineitem.l_orderkey == F.col("o_orderkey")
    )
    assert _counts(bloom) == _counts(plain)


def test_probe_never_drops_a_true_member(lineitem, urgent_orders):
    """The Bloom contract: kept-set is a superset of the true member
    set, at any bitmap size."""
    for n_bits, n_hashes in [(1 << 20, 5), (512, 3)]:
        bm = bloom_bitmap(urgent_orders, "o_orderkey", n_bits, n_hashes)
        kept = bloom_probe(
            lineitem, F.col("l_orderkey"), bm, n_bits, n_hashes
        )
        true_members = lineitem.join(
            urgent_orders,
            lineitem.l_orderkey == F.col("o_orderkey"),
            "leftsemi",
        )
        missed = true_members.join(
            kept.select("l_orderkey").distinct(), "l_orderkey", "left_anti"
        ).count()
        assert missed == 0, (n_bits, n_hashes)


def test_bitmap_prunes_most_non_members(lineitem, urgent_orders):
    """At the default sizing the FP rate is ~(1-e^(-kn/m))^k << 1%: the
    kept set should be essentially the member set, i.e. the probe
    actually removes the non-member shuffle volume it claims to."""
    bm = bloom_bitmap(urgent_orders, "o_orderkey")
    kept = bloom_probe(lineitem, F.col("l_orderkey"), bm).count()
    n_true = lineitem.join(
        urgent_orders, lineitem.l_orderkey == F.col("o_orderkey"), "leftsemi"
    ).count()
    n_total = lineitem.count()
    assert n_true <= kept  # superset (no false negatives)
    # fewer than 1% of non-members survive the probe
    assert kept - n_true <= max(1, (n_total - n_true) // 100)


def test_bitmap_state_is_bounded(urgent_orders):
    """One row; at most n_bits/64 map entries regardless of dim size —
    the driver/broadcast cost is a declared constant, not data-sized."""
    n_bits = 1 << 12
    rows = bloom_bitmap(urgent_orders, "o_orderkey", n_bits=n_bits).collect()
    assert len(rows) == 1
    assert len(rows[0]["_bloom"]) <= n_bits // 64


def test_null_fact_keys_never_match(spark, urgent_orders):
    withnull = spark.createDataFrame(
        [(None,), (1,), (2,)], "l_orderkey bigint"
    )
    bm = bloom_bitmap(urgent_orders, "o_orderkey")
    kept = bloom_probe(withnull, F.col("l_orderkey"), bm)
    assert kept.where(F.col("l_orderkey").isNull()).count() == 0


def test_null_fact_keys_excluded_even_on_saturated_bitmap(spark):
    """NULL exclusion is structural (isNotNull in the membership
    predicate), not false-positive-rate luck: xxhash64 ignores NULL
    inputs, so without the guard a NULL key probes the fixed seed-hash
    positions and PASSES on any bitmap dense enough to have them set.
    Saturate a tiny bitmap so every position is set — NULLs must still
    be dropped (ADVICE r7)."""
    dim = spark.createDataFrame([(i,) for i in range(4096)], "k bigint")
    fact = spark.createDataFrame(
        [(None,), (None,), (7,)], "k bigint"
    )
    # 256 bits for 4096 keys: every word is all-ones with overwhelming
    # probability, and certainly every probed position for ANY input
    bm = bloom_bitmap(dim, "k", n_bits=256, n_hashes=4)
    kept = bloom_probe(fact, F.col("k"), bm, n_bits=256, n_hashes=4)
    rows = kept.collect()
    assert all(r.k is not None for r in rows)
    assert {r.k for r in rows} == {7}  # non-null members still pass


def test_string_keys_roundtrip_no_false_negatives(spark):
    """xxhash64 hashes strings by a different code path than longs; the
    no-false-negative contract must hold for string keys too (the
    'key allowlist' shape is usually string ids), including keys that
    collide visually (case variants, embedded separators)."""
    dim = spark.createDataFrame(
        [(f"user-{i}",) for i in range(0, 300, 3)]
        + [("UPPER",), ("upper",), ("a|b",), ("a}{b",), ("",)],
        "k string",
    )
    fact = spark.createDataFrame(
        [(f"user-{i}",) for i in range(300)]
        + [("UPPER",), ("upper",), ("a|b",), ("a}{b",), ("",), ("absent",)],
        "k string",
    )
    bm = bloom_bitmap(dim, "k", n_bits=1 << 14, n_hashes=4)
    kept = set(
        r.k for r in bloom_probe(
            fact, F.col("k"), bm, n_bits=1 << 14, n_hashes=4
        ).collect()
    )
    members = set(r.k for r in dim.collect())
    facts = set(r.k for r in fact.collect())
    assert members & facts <= kept  # every true member survives
    dim2 = dim.withColumnRenamed("k", "k2")  # join keys need distinct names
    joined = bloom_semi_join(fact, dim2, "k", "k2", n_bits=1 << 14, n_hashes=4)
    # exact join on top: result equals the plain inner join
    plain = fact.join(dim2, F.col("k") == F.col("k2"))
    assert joined.count() == plain.count()


def test_probe_is_projection_before_any_fact_exchange(lineitem, urgent_orders):
    """Plan shape: the fact side reaches the membership filter through a
    BroadcastNestedLoopJoin of the ONE-row bitmap — no exchange of fact
    rows anywhere in the probe. The only exchanges in the plan belong to
    the bitmap subtree (the bounded (word, bits) hash agg + the 1-row
    pack), and the bit_or is map-side combined (partial_bit_or)."""
    from asterlake.plans.inspect import plan_string

    bm = bloom_bitmap(urgent_orders, "o_orderkey")
    plan = plan_string(bloom_probe(lineitem, F.col("l_orderkey"), bm))
    assert "BroadcastNestedLoopJoin" in plan
    assert "partial_bit_or" in plan
    assert "SortMergeJoin" not in plan
    # both exchanges sit under the bitmap build: one hash-partitioned on
    # _word, one SinglePartition for the final pack — none carry fact rows
    import re

    exchanges = re.findall(r"\(\d+\) Exchange\n(?:.*\n)*?Arguments: (.*)", plan)
    assert len(exchanges) == 2, plan
    assert any("_word" in e for e in exchanges)
    assert any("SinglePartition" in e for e in exchanges)


def test_merge_equals_bitmap_of_union_and_round_trips_parquet(
    spark, urgent_orders, tmp_path
):
    """bloom_merge(bitmap(X), bitmap(Y)) must be bit-identical to
    bitmap(X union Y) — the incremental-allowlist property — and a
    bitmap written to parquet must probe identically after reload (the
    persisted cross-job index shape)."""
    from asterlake.operators.bloomjoin import bloom_merge

    x = urgent_orders.limit(300)
    y = urgent_orders.subtract(x)
    merged = bloom_merge(bloom_bitmap(x, "o_orderkey"), bloom_bitmap(y, "o_orderkey"))
    full = bloom_bitmap(urgent_orders, "o_orderkey")
    assert merged.collect()[0]["_bloom"] == full.collect()[0]["_bloom"]
    # parquet round trip: reload and probe — identical kept set
    path = str(tmp_path / "bitmap")
    full.write.parquet(path)
    reloaded = spark.read.parquet(path)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    a = sorted(r.l_orderkey for r in bloom_probe(li, F.col("l_orderkey"), full).collect())
    b = sorted(r.l_orderkey for r in bloom_probe(li, F.col("l_orderkey"), reloaded).collect())
    assert a == b
    # mismatched n_bits refuses loudly
    import pytest as _pytest

    small = bloom_bitmap(x, "o_orderkey", n_bits=1 << 10)
    with _pytest.raises(Exception, match="different n_bits"):
        bloom_merge(full, small).collect()
