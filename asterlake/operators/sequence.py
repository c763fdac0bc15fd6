"""Ordered-event funnel analysis over a keyed event stream.

Product-analytics staple the reference's ETL stack has no operator for:
given an ordered list of step names (e.g. view -> click -> purchase), find
per user the earliest time each step was completed IN ORDER — step k only
counts if it happens at-or-after the user's earliest in-order completion
of step k-1.

Single-scan formulation: the naive implementation joins the events table
once per step (k scans, k shuffles). Here each step's "earliest in-order
completion so far" is a running MIN window over one (user, ts, tiebreak)
sort, and step k's candidate condition references step k-1's running
column — so ALL steps ride one sort exchange of one scan. The final
per-user row is a groupBy over the same key partitioning (AQE reuses the
exchange).

At 100 TB: one shuffle keyed on user_id, window state is O(#steps)
scalars per row, and the aggregation is map-side partial. No step count
changes the shuffle count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_timestamps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = None,
    within: str | None = None,
) -> DataFrame:
    """Per user, the earliest in-order completion time of each funnel step.

    First-touch semantics: step k anchors to the user's EARLIEST in-order
    completion of step k-1 (the funnel never re-enters from a later
    occurrence of an earlier step — well-defined and single-pass, the
    same convention groupwise funnel metrics use). ``within`` optionally
    bounds each step to at most that INTERVAL (e.g. ``"12 hours"``) after
    the anchoring step's time.

    Returns one row per user with ``t_<step>`` timestamp columns (NULL =
    step never completed in order) and ``converted`` (all steps completed).
    Ties at identical ``ts`` resolve by ``tiebreak_col`` position in the
    sort — an earlier-sorted step row counts as "before" a later one.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    df = events
    aggs = []
    prev_running: str | None = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev_running is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev_running))
            if within is not None:
                cond = cond & (
                    F.col(ts_col)
                    <= F.col(prev_running) + F.expr(f"INTERVAL {within}")
                )
        cand = f"_cand_{i}"
        df = df.withColumn(cand, F.when(cond, F.col(ts_col)))
        if i < len(steps) - 1:  # the last step needs no running column
            run = f"_run_{i}"
            df = df.withColumn(run, F.min(cand).over(w))
            prev_running = run
        aggs.append(F.min(cand).alias(f"t_{step}"))

    out = df.groupBy(user_col).agg(*aggs)
    return out.withColumn(
        "converted", F.col(f"t_{steps[-1]}").isNotNull()
    )
