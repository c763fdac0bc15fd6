"""Time-series regularization operators: gap fill (LOCF) and change
intervals (SCD2-style validity ranges).

Spark has windowed *aggregation* but no resample/fill operator (pandas'
``resample().ffill()``); and no SCD2 builder. Both are re-expressed here
as compositions that keep all work key-partitioned:

- **gap_fill_locf** — snap events to a fixed grid (one value per key per
  grid slot: the latest event in the slot), then generate each key's full
  grid with ``sequence()`` + ``explode`` and forward-fill empty slots with
  ``last(ignorenulls)`` over the key's time order. Grid generation is a
  per-key projection (no shuffle); the fill is one window over the same
  key partitioning the slot-aggregation already established.
- **change_intervals** — collapse a per-key event stream into contiguous
  [valid_from, valid_to) intervals of a tracked column's value: keep rows
  where the value differs from its predecessor (lag), then close each
  interval with the next change's start (lead). Two window functions over
  one key-partitioned sort — the standard SCD2 build, fully deterministic
  given the (ts, tiebreak) order.

Scale: both are one shuffle on the key; grids explode rows but only
within a key's own min..max span (bounded fan-out, no cross-key work).
Skewed keys (one user with years of events) split under AQE since every
downstream op is key-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_locf(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    slot: str = "1 hour",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Regularize each key's events onto a fixed time grid with LOCF.

    Output: ``(key, slot_start, value, observed)`` — one row per grid slot
    from the key's first to last event slot; ``value`` is the latest
    observation in the slot, forward-filled across empty slots;
    ``observed`` marks slots that had at least one event. Slot winner =
    max (ts, tiebreak) — deterministic under timestamp ties.
    """
    slotted = events.select(
        F.col(key),
        F.date_trunc("hour", F.col(ts)).alias("_slot"),
        F.col(ts).alias("_ts"),
        F.col(tiebreak).alias("_tb"),
        F.col(value).alias("_v"),
    )
    if slot != "1 hour":  # pragma: no cover - hour grid is the shipped unit
        raise ValueError("only '1 hour' slots are supported")

    w_slot = Window.partitionBy(key, "_slot").orderBy(
        F.col("_ts").desc(), F.col("_tb").desc()
    )
    per_slot = (
        slotted.withColumn("_rk", F.row_number().over(w_slot))
        .filter(F.col("_rk") == 1)
        .select(key, "_slot", F.col("_v"))
    )

    spans = per_slot.groupBy(key).agg(
        F.min("_slot").alias("_lo"), F.max("_slot").alias("_hi")
    )
    grid = spans.select(
        key,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("slot_start"),
    )

    filled = grid.join(
        per_slot.withColumnRenamed("_slot", "slot_start"), [key, "slot_start"], "left"
    )
    w_fill = (
        Window.partitionBy(key)
        .orderBy("slot_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        F.col(key),
        "slot_start",
        F.last("_v", ignorenulls=True).over(w_fill).alias(value),
        F.col("_v").isNotNull().alias("observed"),
    )


def change_intervals(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tracked: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """SCD2-style validity intervals for a tracked column per key.

    Output: one row per value *run* — ``(key, tracked, valid_from,
    valid_to)`` with ``valid_to`` NULL for the current (open) interval.
    Consecutive events with the same tracked value collapse into one row.
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    changes = (
        events.select(key, ts, tracked, tiebreak)
        .withColumn("_prev", F.lag(tracked).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(tracked)))
    )
    w_c = Window.partitionBy(key).orderBy(ts, tiebreak)
    return changes.select(
        F.col(key),
        F.col(tracked),
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w_c).alias("valid_to"),
    )
