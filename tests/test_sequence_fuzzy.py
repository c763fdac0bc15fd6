"""Boundary semantics for funnel analysis (operators/sequence.py) and
blocked fuzzy matching (dedup.fuzzy_pairs) on hand-built fixtures; real-data
agreement is pinned by oracle parity (q_funnel_conversion,
q_fuzzy_name_pairs)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from asterlake.operators.dedup import fuzzy_pairs
from asterlake.operators.sequence import funnel_timestamps


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        [(uid, eid, _ts(ts), et) for uid, eid, ts, et in rows],
        "user_id long, event_id long, ts timestamp, event_type string",
    )


def test_funnel_requires_order(spark):
    # user 1: purchase BEFORE view/click -> that purchase must not count;
    # a later purchase after the click does
    ev = _events(
        spark,
        [
            (1, 1, "2024-01-01T00:00", "purchase"),
            (1, 2, "2024-01-01T01:00", "view"),
            (1, 3, "2024-01-01T02:00", "click"),
            (1, 4, "2024-01-01T03:00", "purchase"),
            # user 2: click before view -> funnel stalls at view
            (2, 5, "2024-01-01T00:00", "click"),
            (2, 6, "2024-01-01T01:00", "view"),
        ],
    )
    got = {
        r.user_id: (r.t_view, r.t_click, r.t_purchase, r.converted)
        for r in funnel_timestamps(
            ev, ["view", "click", "purchase"], tiebreak_col="event_id"
        ).collect()
    }
    assert got[1] == (
        _ts("2024-01-01T01:00"),
        _ts("2024-01-01T02:00"),
        _ts("2024-01-01T03:00"),
        True,
    )
    assert got[2] == (_ts("2024-01-01T01:00"), None, None, False)


def test_funnel_uses_earliest_inorder_not_earliest_overall(spark):
    # two views; the click sits between them — it must anchor to the FIRST
    # view, and the purchase between click and second view still converts
    ev = _events(
        spark,
        [
            (1, 1, "2024-01-01T00:00", "view"),
            (1, 2, "2024-01-01T00:30", "click"),
            (1, 3, "2024-01-01T00:45", "purchase"),
            (1, 4, "2024-01-01T01:00", "view"),
        ],
    )
    row = funnel_timestamps(
        ev, ["view", "click", "purchase"], tiebreak_col="event_id"
    ).collect()[0]
    assert row.t_view == _ts("2024-01-01T00:00")
    assert row.t_click == _ts("2024-01-01T00:30")
    assert row.t_purchase == _ts("2024-01-01T00:45")


def test_funnel_same_timestamp_tiebreak(spark):
    # view and click at the SAME ts: click's event_id sorts after the view,
    # so it counts as in-order
    ev = _events(
        spark,
        [
            (1, 1, "2024-01-01T00:00", "view"),
            (1, 2, "2024-01-01T00:00", "click"),
        ],
    )
    row = funnel_timestamps(
        ev, ["view", "click"], tiebreak_col="event_id"
    ).collect()[0]
    assert row.t_click == _ts("2024-01-01T00:00")
    assert row.converted


def test_funnel_within_bound(spark):
    # click 13h after the first view: outside a 12h bound, inside none
    ev = _events(
        spark,
        [
            (1, 1, "2024-01-01T00:00", "view"),
            (1, 2, "2024-01-01T13:00", "click"),
        ],
    )
    bounded = funnel_timestamps(
        ev, ["view", "click"], tiebreak_col="event_id", within="12 hours"
    ).collect()[0]
    assert bounded.t_click is None and not bounded.converted
    unbounded = funnel_timestamps(
        ev, ["view", "click"], tiebreak_col="event_id"
    ).collect()[0]
    assert unbounded.t_click == _ts("2024-01-01T13:00") and unbounded.converted


def test_fuzzy_pairs_blocked_and_thresholded(spark):
    df = spark.createDataFrame(
        [
            (1, "red widget"),
            (2, "rad widget"),   # distance 1 from red widget
            (3, "blue widget"),  # distance 3 from red widget
            (4, "red gadget"),   # different block entirely
        ],
        "id long, name string",
    )
    block = F.regexp_extract(F.col("name"), "[^ ]+$", 0)
    got = {
        (r.id_a, r.id_b): r.distance
        for r in fuzzy_pairs(df, "name", "id", block, max_distance=2).collect()
    }
    # only the within-block, within-threshold pair survives; the cross-block
    # red-widget/red-gadget pair (distance 2!) is never even a candidate
    assert got == {(1, 2): 1}
