"""Edge-case unit tests for the temporal join operators (the oracle parity
test covers the real-data agreement; these pin boundary semantics)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from asterlake.operators.temporal import asof_join, bucketed_range_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),
            (2, 10, _ts("2024-01-01 11:00:00")),
            (3, 10, _ts("2024-01-01 09:00:00")),  # before any right row
            (4, 20, _ts("2024-01-01 10:30:00")),
        ],
        "id int, k int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 10:00:00"), 1.0),  # simultaneous with left id=1
            (10, _ts("2024-01-01 10:45:00"), 2.0),
            (20, _ts("2024-01-01 10:00:00"), 9.0),
        ],
        "k int, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_semantics(spark, sides):
    left, right = sides
    out = {
        r.id: (r.asof_v, r.asof_ts)
        for r in asof_join(left, right, by="k", ts="ts", value_cols=["v"]).collect()
    }
    # equal timestamps match (l.ts >= r.ts)
    assert out[1] == (1.0, _ts("2024-01-01 10:00:00"))
    # latest-not-future wins
    assert out[2] == (2.0, _ts("2024-01-01 10:45:00"))
    # nothing at-or-before -> nulls, row preserved
    assert out[3] == (None, None)
    assert out[4] == (9.0, _ts("2024-01-01 10:00:00"))


def test_asof_tolerance_voids_stale_matches(spark, sides):
    left, right = sides
    out = {
        r.id: r.asof_v
        for r in asof_join(
            left, right, by="k", ts="ts", value_cols=["v"], tolerance_seconds=600
        ).collect()
    }
    # id=2 matched a 15-min-old row -> voided at 10-min tolerance
    assert out[2] is None
    # id=1's simultaneous match survives
    assert out[1] == 1.0
    # id=4's match is 30 min old -> voided
    assert out[4] is None


def test_asof_null_value_in_matched_row_stays_null(spark, sides):
    """DuckDB ASOF semantics: if the latest matching right row has a NULL
    value column, the output carries THAT row's NULL (and its timestamp) —
    not an older row's non-NULL value. Pins the struct-packed last()."""
    left, _ = sides
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 09:30:00"), 7.0),   # older, non-null
            (10, _ts("2024-01-01 10:30:00"), None),  # newest for id=2, NULL v
        ],
        "k int, ts timestamp, v double",
    )
    out = {
        r.id: (r.asof_v, r.asof_ts)
        for r in asof_join(left, right, by="k", ts="ts", value_cols=["v"]).collect()
    }
    # id=2 (11:00) matches the 10:30 row: NULL value, 10:30 timestamp
    assert out[2] == (None, _ts("2024-01-01 10:30:00"))
    # id=1 (10:00) matches the 09:30 row normally
    assert out[1] == (7.0, _ts("2024-01-01 09:30:00"))


def test_asof_preserves_left_row_count(spark, sides):
    left, right = sides
    assert asof_join(left, right, by="k", ts="ts", value_cols=["v"]).count() == 4


def test_bucketed_range_join_matches_naive_predicate_join(spark):
    # randomized-ish grid crossing bucket boundaries both ways
    rows_l = [
        (i, i % 3, _ts("2024-01-01 10:00:00").replace(minute=(i * 7) % 60))
        for i in range(20)
    ]
    rows_r = [
        (100 + i, i % 3, _ts("2024-01-01 10:00:00").replace(minute=(i * 11) % 60), float(i))
        for i in range(20)
    ]
    left = spark.createDataFrame(rows_l, "id int, k int, ts timestamp")
    right = spark.createDataFrame(rows_r, "id int, k int, ts timestamp, v double")

    got = bucketed_range_join(
        left, right, by="k", window_seconds=300, how="inner"
    ).select("l_id", "r_id")
    naive = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & (F.col("r.ts") >= F.col("l.ts") - F.expr("INTERVAL 300 SECONDS"))
            & (F.col("r.ts") <= F.col("l.ts")),
        )
        .select(F.col("l.id").alias("l_id"), F.col("r.id").alias("r_id"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    # window-edge inclusivity: both endpoints in range
    assert (
        bucketed_range_join(
            spark.createDataFrame([(1, 1, _ts("2024-01-01 10:05:00"))], "id int, k int, ts timestamp"),
            spark.createDataFrame(
                [
                    (2, 1, _ts("2024-01-01 10:00:00"), 1.0),  # exactly l.ts - W
                    (3, 1, _ts("2024-01-01 10:05:00"), 2.0),  # exactly l.ts
                    (4, 1, _ts("2024-01-01 09:59:59"), 3.0),  # just outside
                ],
                "id int, k int, ts timestamp, v double",
            ),
            by="k",
            window_seconds=300,
            how="inner",
        ).count()
        == 2
    )


def test_bucketed_range_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:00:00"))], "id int, k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(2, 2, _ts("2024-01-01 10:00:00"), 1.0)], "id int, k int, ts timestamp, v double"
    )
    rows = bucketed_range_join(
        left, right, by="k", window_seconds=300, how="left"
    ).collect()
    assert len(rows) == 1 and rows[0].r_id is None
