"""Skew-mitigation toolkit: salted joins and two-phase salted aggregation.

AQE's skew-join splitting (on in `session.py`) handles most runtime skew,
but two situations still need *explicit* salting at 100 TB:

- an aggregation whose hot key floods one reducer (AQE splits join
  partitions, not aggregation groups);
- a shuffle join against a side too large to broadcast where one key holds
  a double-digit percent of the rows (AQE subdivides by partition, which
  caps out when a single KEY exceeds a partition).

Both helpers are *exact*: salting only changes the partitioning, never the
result. Salt is derived deterministically (`pmod(xxhash64(...), n)`) so
runs are reproducible and no RNG appears in the plan.

Usage pattern at scale: profile key frequencies first (a cheap
``groupBy(key).count().orderBy(desc)`` sample), then salt only when the top
key's share breaks the partition budget.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[str], buckets: int) -> Column:
    """Deterministic salt in [0, buckets): hash of the given columns (use
    high-cardinality payload columns, NOT the join/group key — salting by
    the key would put every copy of the hot key in one bucket again)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets)).cast(
        "int"
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    buckets: int = 8,
    salt_by: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key explosion spread across ``buckets``.

    The (large, skewed) left side gets a deterministic salt; the right side
    is replicated ``buckets`` times via ``explode(sequence(...))`` — so
    each (key, salt) shard joins against one replica and a hot key's rows
    land on ``buckets`` reducers instead of one. Right-side replication
    costs buckets x |right|: use for moderate right sides (dimension-ish),
    broadcast for tiny ones, AQE for mild skew.

    Exact: every left row still meets every matching right row exactly once
    — for join types where unmatched RIGHT rows are never emitted. With
    how='right'/'full'/'outer' an unmatched right row would surface once per
    replica (``buckets`` copies), so those are rejected outright.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join is exact only for {sorted(allowed)} (right side is "
            f"replicated {buckets}x; outer-right variants would duplicate "
            f"unmatched right rows), got how={how!r}"
        )
    salt_cols = salt_by or [c for c in left.columns if c != on]
    l_salted = left.withColumn("_salt", _salt(salt_cols, buckets))
    r_rep = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = l_salted.join(r_rep, [on, "_salt"], how)
    return out.drop("_salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    buckets: int = 8,
    salt_by: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys.

    ``aggs`` maps output column -> (input column, fn) where fn is one of
    sum/count/min/max (the decomposable aggregates: partials re-combine
    exactly — count re-aggregates as a sum of partial counts).

    Phase 1 groups by (keys + salt): the hot key's rows split across
    ``buckets`` reducers. Phase 2 re-combines the per-salt partials —
    ``buckets x |distinct keys|`` rows, trivially small. This is what
    Spark's partial aggregation already does per-PARTITION; salting adds
    the same effect per-REDUCER for the final exchange.
    """
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for out_col, (_, fn) in aggs.items():
        if fn not in fns:
            raise ValueError(f"{out_col}: fn must be one of {sorted(fns)}")

    salt_cols = salt_by or [c for c in df.columns if c not in keys]
    phase1 = df.withColumn("_salt", _salt(salt_cols, buckets)).groupBy(
        *keys, "_salt"
    )
    partial = phase1.agg(
        *[
            fns[fn](F.col(in_col)).alias(f"_p_{out_col}")
            for out_col, (in_col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            recombine[fn](F.col(f"_p_{out_col}")).alias(out_col)
            for out_col, (_, fn) in aggs.items()
        ]
    )


def skew_report(
    df: DataFrame,
    key: str,
    top_n: int = 20,
) -> DataFrame:
    """The "profile key frequencies first" step this module's usage
    pattern prescribes, as a first-class operator: the top-``top_n``
    hottest values of ``key`` with their exact row counts and share of
    the table — the evidence that decides whether a join/aggregation
    needs :func:`salted_join` / :func:`salted_aggregate` (top share
    over the per-partition budget) or can ride AQE alone.

    Output: ``(key, n_rows, total_rows, share, rank)``, rank dense by
    (count desc, key asc) — the key tiebreak keeps the report
    deterministic when counts tie. ``share`` is one double division of
    exact BIGINTs (hash-gate discipline).

    Scale shape: ONE count aggregation on the key (map-side partial
    combine, the shuffle carries (key, long) pairs) + a 1-row broadcast
    total + TakeOrderedAndProject for the top-N — no global sort, no
    second scan of the fact."""
    counts = df.groupBy(key).agg(F.count("*").cast("bigint").alias("n_rows"))
    total = counts.agg(
        F.sum("n_rows").cast("bigint").alias("total_rows")
    )
    topped = (
        counts.crossJoin(F.broadcast(total))
        .orderBy(F.col("n_rows").desc(), F.col(key))
        .limit(top_n)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_rows").desc(), F.col(key))
    return topped.select(
        key,
        "n_rows",
        "total_rows",
        (F.col("n_rows").cast("double") / F.col("total_rows").cast("double"))
        .alias("share"),
        F.row_number().over(w).cast("int").alias("rank"),
    )
