"""Temporal join operators: as-of join and (bucketed) range join.

Spark has no ASOF JOIN node and naive range joins degenerate to per-key
cross products, so both operators here are re-expressed as compositions
Catalyst executes well at any scale (SURVEY.md §2.3 lists them as "absent
in the reference, needed by any time-series serving layer"):

- **as-of join** — "for each left row, the latest right row with
  r.ts <= l.ts (per key)". Implemented as the union-sort trick: tag both
  sides, union them, and run ``last(value, ignorenulls=True)`` over a
  (key, ts, side)-ordered running window. ONE shuffle on the key — same
  cost as a regular sort-merge join — no per-key explosion, no UDF, and
  AQE still splits skewed keys.
- **range join** — "left rows matched to right rows within a time
  interval". The naive equi+range predicate hash-joins on the key alone
  and post-filters, which explodes when keys are hot. ``bucketed_range_
  join`` quantizes time into window-width buckets, posts each right row to
  its bucket and the next, and equi-joins on (key, bucket) — candidate
  pairs are bounded per bucket (the standard interval-binning bound), then
  the exact predicate filters. Plan: pure broadcast/hash equi-join.

Both are exact (the bucketing only prunes candidates), and both are
oracle-checkable: DuckDB's native ``ASOF JOIN`` and a BETWEEN-predicate
join respectively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    ts: str = "ts",
    value_cols: list[str],
    tolerance_seconds: int | None = None,
    matched_prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: each left row gains the value columns of the
    latest right row with ``r.ts <= l.ts`` within the same ``by`` key
    (NULLs when none), plus ``{prefix}ts`` = that right row's timestamp.

    ``right`` must be unique per (by, ts) — pre-aggregate otherwise, or
    which duplicate wins is undefined (DuckDB's ASOF has the same rule).
    ``tolerance_seconds`` voids matches older than ``l.ts - tolerance``.

    Scale: one hash-partition shuffle on ``by`` + per-key sort — identical
    exchange shape to a sort-merge join of the two inputs; the running
    ``last(ignorenulls)`` is a single pass, state = one row.
    """
    left_cols = left.columns
    out_vals = [(c, f"{matched_prefix}{c}") for c in value_cols]

    # ALL right-side outputs (value columns + the matched timestamp) travel
    # as ONE struct filled by ONE last(ignorenulls) window. Independent
    # per-column windows would mix rows when the matched right row carries a
    # NULL value column (its NULL would be skipped in favor of an OLDER
    # row's value while _matched_ts still came from the newest row) —
    # DuckDB's ASOF returns the matched row's NULL, and so does this. A
    # struct whose fields are all NULL is itself non-NULL, so ignorenulls
    # only skips the left-tagged rows, never a matched right row.
    r_pack = F.struct(
        *[F.col(c).alias(o) for c, o in out_vals],
        F.col(ts).cast("timestamp").alias("_r_ts"),
    )
    r_tag = right.select(
        F.col(by).alias("_by"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(F.struct(*left_cols)).schema[0].dataType).alias("_left"),
        r_pack.alias("_rpack"),
    )
    l_tag = left.select(
        F.col(by).alias("_by"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left_cols).alias("_left"),
        F.lit(None).cast(r_tag.schema["_rpack"].dataType).alias("_rpack"),
    )

    # right rows sort before left rows at equal ts (_side 0 < 1), so an
    # exactly-simultaneous right row IS matched (l.ts >= r.ts semantics)
    w = (
        Window.partitionBy("_by")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag).select(
        "_side",
        "_left",
        F.last("_rpack", ignorenulls=True).over(w).alias("_m"),
    )

    out = filled.filter(F.col("_side") == 1)
    within: Column = F.lit(True)
    if tolerance_seconds is not None:
        within = F.col("_m._r_ts") >= (
            F.col("_left")[ts].cast("timestamp")
            - F.expr(f"INTERVAL {int(tolerance_seconds)} SECONDS")
        )
    return out.select(
        *[F.col(f"_left.{c}").alias(c) for c in left_cols],
        *[
            F.when(within, F.col(f"_m.{o}")).otherwise(F.lit(None)).alias(o)
            for _, o in out_vals
        ],
        F.when(within, F.col("_m._r_ts"))
        .otherwise(F.lit(None))
        .alias(f"{matched_prefix}ts"),
    )


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    window_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "left",
) -> DataFrame:
    """Pairs (left row, right row) with ``l.ts - window <= r.ts <= l.ts``
    and equal ``by`` keys, via interval binning.

    Each right row posts to its own window-width bucket and the next one;
    left probes only its bucket — so the join is a pure equi-join on
    (by, bucket) with the exact range predicate as a residual filter.
    Candidate blow-up is bounded by rows-per-bucket, not rows-per-key.
    Columns are prefixed l_/r_ to keep both sides' ts and payloads.
    """
    w_us = window_seconds * 1_000_000
    l = left.select(
        F.col(by).alias("_by"),
        F.floor(F.unix_micros(F.col(left_ts)) / w_us).alias("_bucket"),
        F.struct(*left.columns).alias("_l"),
    )
    r = right.select(
        F.col(by).alias("_by"),
        F.explode(
            F.array(
                F.floor(F.unix_micros(F.col(right_ts)) / w_us),
                F.floor(F.unix_micros(F.col(right_ts)) / w_us) + 1,
            )
        ).alias("_bucket"),
        F.struct(*right.columns).alias("_r"),
    )
    in_range = (
        F.col(f"_r.{right_ts}")
        >= F.col(f"_l.{left_ts}") - F.expr(f"INTERVAL {window_seconds} SECONDS")
    ) & (F.col(f"_r.{right_ts}") <= F.col(f"_l.{left_ts}"))

    if how == "inner":
        joined = l.join(r, ["_by", "_bucket"]).filter(in_range)
    elif how == "left":
        # keep every left row; null right side when nothing in range
        rr = r.withColumnRenamed("_by", "_rby").withColumnRenamed(
            "_bucket", "_rbucket"
        )
        joined = l.join(
            rr,
            (F.col("_by") == F.col("_rby"))
            & (F.col("_bucket") == F.col("_rbucket"))
            & in_range,
            "left",
        )
    else:
        raise ValueError(f"how must be inner|left, got {how!r}")

    return joined.select(
        *[F.col(f"_l.{c}").alias(f"l_{c}") for c in left.columns],
        *[F.col(f"_r.{c}").alias(f"r_{c}") for c in right.columns],
    )
