"""Bounded-state exact frequent items (beyond-parity, scale operator).

"Which keys exceed 1/phi of all rows?" over an UNBOUNDED key domain
(tokens, URLs, user ids) is the classic case where the obvious plan —
``groupBy(key).count()`` then filter — shuffles one row per distinct
key: at 100 TB that is a vocabulary-sized exchange to answer a question
whose output is at most ``phi`` rows. The streaming-algorithms answer is
Misra-Gries (1982): a summary of at most ``capacity`` counters processes
any stream so that every key with true count > n/(capacity+1) is
guaranteed to survive. Summaries MERGE (Agarwal et al., "Mergeable
Summaries", PODS'12): sum counters, subtract the (capacity+1)-th largest,
keep positives — which makes the algorithm partition-parallel.

This operator composes the two-phase exact form:

1. **Candidates** (``mg_candidates``): one ``mapInPandas`` pass keeps a
   per-TASK Misra-Gries summary (pandas ``value_counts`` per Arrow batch
   merged into the running summary, trimmed by the mergeable-summaries
   rule). Output is at most ``capacity`` keys per task — bounded state,
   bounded output, no shuffle. The pigeonhole guarantee: a key with
   global count >= n/denom must hold share >= 1/denom in at least one
   task's input, so with ``capacity + 1 >= denom`` it survives that
   task's summary. NO FALSE NEGATIVES — only bounded false positives.
2. **Exact recount** (``frequent_items``): the candidate set (tiny)
   broadcasts as a left-semi filter on the fact; only candidate rows
   reach the count shuffle (map-side combined, at most
   tasks x capacity distinct keys), and the final integer filter
   ``cnt * denom >= n_total`` keeps exactly the true frequent items.

The output is therefore EXACT — identical to the full groupBy/HAVING —
while the shuffled volume is bounded by the candidate set instead of the
key cardinality. The threshold is the integer ratio ``denom`` (keys
with count >= n/denom): the comparison ``cnt * denom >= n_total``
stays in exact BIGINT arithmetic, so any engine agrees on boundary keys
(a ``cnt >= 0.01 * n`` double compare could flip ties).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StructField, StructType


def _trim(counts: dict, capacity: int) -> dict:
    """Mergeable-summaries trim: keep at most ``capacity`` counters by
    subtracting the (capacity+1)-th largest count from all and dropping
    non-positives. Total subtracted mass per trim is >= (capacity+1) *
    sub, so across a task's stream the cumulative decrement of any key
    is <= n_task/(capacity+1)."""
    if len(counts) <= capacity:
        return counts
    sub = sorted(counts.values(), reverse=True)[capacity]
    return {k: c - sub for k, c in counts.items() if c > sub}


def mg_candidates(
    df: DataFrame, col: str, capacity: int
) -> DataFrame:
    """At most ``capacity`` candidate keys per task: every key whose
    TASK-local share exceeds 1/(capacity+1) is guaranteed present.
    Arrow-batched; per-batch tallying is vectorized (value_counts), only
    the summary merge is a Python dict of bounded size."""
    field = df.schema[col]
    out_schema = StructType([StructField(field.name, field.dataType)])

    def summarize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in it:
            for key, cnt in pdf[col].dropna().value_counts().items():
                counts[key] = counts.get(key, 0) + int(cnt)
            counts = _trim(counts, capacity)
        yield pd.DataFrame({col: list(counts.keys())})

    return df.select(col).mapInPandas(summarize, out_schema)


def frequent_items(
    df: DataFrame,
    col: str,
    denom: int = 100,
    capacity: int | None = None,
) -> DataFrame:
    """EXACT keys with count >= n_total/denom (and their exact counts),
    via bounded-state candidate generation + exact recount.

    Returns ``(col, cnt, n_total)`` — identical rows to the full
    ``GROUP BY ... HAVING cnt * denom >= n_total``, with the shuffle
    bounded by the candidate set (tasks x capacity keys) instead of the
    full key cardinality. ``capacity`` defaults to ``2 * denom`` (the
    guarantee needs only ``denom - 1``; the margin shrinks the false-
    positive recount set)."""
    if denom < 2:
        raise ValueError("denom must be >= 2 (denom=1 means every key)")
    if capacity is None:
        capacity = 2 * denom
    # MG survival needs task-share STRICTLY > 1/(capacity+1); pigeonhole
    # only gives a global frequent key share >= 1/denom in some task, so
    # capacity >= denom makes 1/denom > 1/(capacity+1) strict (capacity
    # = denom-1 would admit a false negative exactly on the boundary)
    if capacity < denom:
        raise ValueError(
            f"capacity {capacity} cannot guarantee the 1/{denom} "
            f"threshold; need capacity >= denom"
        )
    cands = mg_candidates(df, col, capacity).distinct()
    totals = df.select(col).where(F.col(col).isNotNull()).agg(
        F.count("*").cast("bigint").alias("n_total")
    )
    return (
        df.select(col)
        .where(F.col(col).isNotNull())
        .join(F.broadcast(cands), col, "leftsemi")
        .groupBy(col)
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .join(F.broadcast(totals))
        .where(F.col("cnt") * F.lit(denom).cast("bigint") >= F.col("n_total"))
    )
