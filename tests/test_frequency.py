"""Bounded-state exact frequent items (operators/frequency.py): equality
to the full groupBy/HAVING, the no-false-negative guarantee at exact
threshold boundaries under adversarial partitioning, bounded candidate
output, and the capacity guarantee validation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from asterlake.operators.frequency import frequent_items, mg_candidates
from tests.conftest import SF_DIR


def _exact(df, col, denom):
    n = df.where(F.col(col).isNotNull()).count()
    return {
        (r[col], r.cnt, n)
        for r in df.where(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .where(F.col("cnt") * denom >= n)
        .collect()
    }


def test_matches_full_group_by_on_corpus_tokens(spark):
    from asterlake.operators.textstats import whitespace_tokens

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = d.select(F.explode(whitespace_tokens("text")).alias("token"))
    got = {
        (r.token, r.cnt, r.n_total)
        for r in frequent_items(toks, "token", denom=50).collect()
    }
    assert got == _exact(toks, "token", 50)


def test_exact_threshold_boundary_under_adversarial_partitioning(spark):
    """n=1000, denom=10 -> threshold 100: a key with count EXACTLY 100
    must be kept, 99 must not — across partitionings that concentrate or
    spread the heavy key (the pigeonhole + strict-MG-survival edge)."""
    rows = (
        [("hot",)] * 100
        + [("warm",)] * 99
        + [(f"u{i}",) for i in range(801)]
    )
    for parts in (1, 7, 32):
        df = spark.createDataFrame(rows, "k string").repartition(parts)
        got = {(r.k, r.cnt) for r in frequent_items(df, "k", denom=10).collect()}
        assert got == {("hot", 100)}, parts


def test_candidates_bounded_per_task(spark):
    """High-cardinality input: each task emits at most ``capacity``
    candidates — the bounded-state contract that replaces the
    vocabulary-sized shuffle."""
    uniq = spark.range(20_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    heavy = spark.range(2_000).select(F.lit("hh").alias("k"))
    df = uniq.union(heavy).repartition(8)
    capacity = 50
    cands = mg_candidates(df, "k", capacity)
    total = cands.count()
    assert 1 <= total <= 8 * capacity
    # the heavy key survives every task it appears in; uniques cannot
    # crowd it out (MG decrements all counters equally)
    assert cands.where(F.col("k") == "hh").count() >= 1
    # per-task bound, not just the total
    per_task = (
        cands.withColumn("_p", F.spark_partition_id())
        .groupBy("_p")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per_task <= capacity


def test_null_keys_are_ignored(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), (None,), (None,), ("b",)], "k string"
    )
    got = {(r.k, r.cnt, r.n_total) for r in frequent_items(df, "k", denom=2).collect()}
    # 3 non-null rows; threshold cnt*2 >= 3 -> cnt >= 2: only 'a'
    assert got == {("a", 2, 3)}


def test_capacity_guarantee_validation():
    import pandas as pd  # noqa: F401  (import parity with module)

    from asterlake.operators.frequency import frequent_items as fi

    class _Fake:  # never reached: validation precedes any Spark work
        pass

    with pytest.raises(ValueError, match="capacity 9 cannot guarantee"):
        fi(_Fake(), "k", denom=10, capacity=9)
    with pytest.raises(ValueError, match="denom must be >= 2"):
        fi(_Fake(), "k", denom=1)
