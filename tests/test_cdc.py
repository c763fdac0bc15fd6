"""Boundary semantics for batch CDC application (operators/cdc.py);
real-data agreement is pinned by oracle parity (q_cdc_apply)."""

from __future__ import annotations

from asterlake.operators.cdc import apply_changes


def _apply(spark, base_rows, change_rows):
    base = spark.createDataFrame(base_rows, "k long, v string")
    ch = spark.createDataFrame(change_rows, "k long, v string, op string, seq long")
    return {
        r.k: r.v
        for r in apply_changes(base, ch, ["k"], "seq").collect()
    }


def test_cdc_insert_update_delete(spark):
    got = _apply(
        spark,
        [(1, "a"), (2, "b"), (3, "c")],
        [
            (1, "a2", "U", 1),  # update
            (2, None, "D", 1),  # delete
            (4, "d", "I", 1),   # insert new key
        ],
    )
    assert got == {1: "a2", 3: "c", 4: "d"}


def test_cdc_latest_sequence_wins(spark):
    got = _apply(
        spark,
        [(1, "a")],
        [(1, "a1", "U", 1), (1, "a3", "U", 3), (1, "a2", "U", 2)],
    )
    assert got == {1: "a3"}


def test_cdc_delete_then_reinsert_later_seq(spark):
    got = _apply(
        spark,
        [(1, "a")],
        [(1, None, "D", 1), (1, "re", "I", 2)],
    )
    assert got == {1: "re"}


def test_cdc_same_seq_delete_beats_update(spark):
    got = _apply(
        spark,
        [(1, "a")],
        [(1, "u", "U", 5), (1, None, "D", 5)],
    )
    assert got == {}


def test_cdc_change_to_absent_key_is_insert(spark):
    # an update for a key the base never had still lands (upsert semantics)
    got = _apply(spark, [(1, "a")], [(9, "new", "U", 1)])
    assert got == {1: "a", 9: "new"}
