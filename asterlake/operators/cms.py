"""Count-min sketch: mergeable approximate frequencies as a RELATION
(beyond-parity, scale operator).

"How often does key X appear?" answered WITHOUT the fact table: the
groupBy-count answer shuffles one row per distinct key (vocabulary-
sized at 100 TB) and must be recomputed for every new key set asked.
The count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005)
stores ``depth x width`` counters: each input key increments one
counter per row (position = an independent hash mod width), and a
point estimate is the MINIMUM of the key's ``depth`` counters —
always >= the true count, and within ``(e/width) * N`` of it with
probability ``1 - e^-depth``. Counters ADD, so sketches merge by plain
summation — partition-parallel, day-over-day incremental, any-range
rollup — the same mergeable-summaries shape as the HLL/Theta/KLL
family in ``sketches.py``, but for FREQUENCIES rather than distincts
or quantiles (its exact-heavy-hitters complement is the Misra-Gries
pipeline in ``frequency.py``; CMS serves the AD-HOC point query over
keys unknown at build time).

Spark-first representation: the sketch is not a blob but an ordinary
RELATION ``(group_cols..., slot int, cnt bigint)`` with
``slot = row * width + position`` — at most ``depth * width`` rows per
group, zeros absent. That buys, with zero UDFs:

- **Build** is explode + groupBy-sum: the shuffle carries map-side-
  combined (group, slot) partials, bounded by
  ``depth * min(width, distinct_keys)`` per task per group — never the
  fact, never the vocabulary.
- **Merge/rollup/advance** are groupBy-sum over sketch rows only
  (integer addition: exact, associative, order-independent — merged
  sketches are BIT-IDENTICAL to a one-shot build, pinned by test).
- **Point estimates** are a join: probe keys explode to their
  ``depth`` slots, left-join the sketch rows (missing slot = 0), and
  ``min()`` per key. Broadcast the sketch side — it is at most
  ``depth * width`` rows per group by construction.
- **Join-size estimation** (``cms_join_size``): the CM inner-product
  estimate ``min_r sum_pos a[r,pos] * b[r,pos]`` upper-bounds
  ``|A JOIN B|`` for equi-joins — per-row products summed over a
  (row, pos)-equi-join of two sketch relations; the planner-style "how
  big would this join be" answered from two stored sketches without
  touching either fact.

Hashing mirrors ``bloomjoin._positions``: Kirsch-Mitzenmacher double
hashing over two xxhash64 views, both mod-reduced BEFORE combining so
ANSI bigint arithmetic stays far from overflow; NULL keys are excluded
at build and estimate as 0 (xxhash64 would otherwise hash NULL to the
seed — the r7 bloom advice, enforced structurally here too).

Estimates are DETERMINISTIC functions of (key set, depth, width): no
RNG, no sampling — two engines agree bit-for-bit on the sketch rows,
which is what makes the build/merge paths differentially testable and
a driver query feasible (the estimate >= exact guarantee and the
merge = rebuild identity are both in exact BIGINT space).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_DEPTH = 5
DEFAULT_WIDTH = 1024


def _as_col(key: Column | str) -> Column:
    return F.col(key) if isinstance(key, str) else key


def _slots(key: Column, depth: int, width: int) -> list[Column]:
    """The ``depth`` flat slot indices of ``key``:
    ``slot_r = r * width + (h1 + r * h2) mod width`` with h1/h2 two
    independent xxhash64 views, mod-reduced pre-combine
    (overflow-safe). Mirrors the bloomjoin position discipline so the
    two operators stay hash-compatible and auditable together."""
    w = F.lit(int(width)).cast("long")
    h1 = F.pmod(F.xxhash64(key), w)
    h2 = F.pmod(F.xxhash64(key, F.lit(0x9E3779B9)), w)
    return [
        (
            F.lit(r * width).cast("long")
            + F.pmod(h1 + F.lit(r).cast("long") * h2, w)
        ).cast("int")
        for r in range(depth)
    ]


def cms_build(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    weight_col: str | None = None,
) -> DataFrame:
    """One count-min sketch relation per group: ``(group_cols...,
    slot int, cnt bigint)``. One scan of the fact; the explode emits
    ``depth`` rows per input row but the groupBy-sum combines map-side,
    so the exchange carries at most ``depth * min(width, distinct)``
    integer rows per task per group. ``weight_col`` (integer) counts
    each row that many times (pre-aggregated inputs); default 1.
    NULL keys contribute nothing (they cannot equi-match anything)."""
    k = _as_col(value_col)
    wgt = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    slot = F.explode(F.array(*_slots(k, depth, width))).alias("slot")
    return (
        df.where(k.isNotNull())
        .select(*group_cols, slot, wgt.alias("_w"))
        .groupBy(*group_cols, "slot")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(
    sketches: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Re-aggregate sketch rows to a coarser grouping (the any-range
    rollup): counters add, so this is a plain integer groupBy-sum over
    the SKETCH relation — the fact never appears in the plan, and the
    result is bit-identical to a one-shot build over the union of the
    inputs (exact BIGINT sums commute; pinned by test)."""
    return sketches.groupBy(*group_cols, "slot").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_advance(
    state: DataFrame,
    new_rows: DataFrame,
    group_cols: list[str],
    value_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Incremental maintenance: fold a new batch of raw rows into the
    stored sketch state. Only the delta is scanned; day-by-day
    advancing lands on bytes identical to a full rebuild (addition is
    associative), so a crashed maintenance job re-runs its day safely
    against a transactionally-replaced state table."""
    delta = cms_build(new_rows, group_cols, value_col, depth, width)
    return cms_merge(
        state.select(*group_cols, "slot", "cnt").unionByName(delta),
        group_cols,
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    out: str = "estimate",
) -> DataFrame:
    """Point-estimate each probe key against the sketch: explode the
    key to its ``depth`` slots, broadcast-left-join the sketch rows
    (absent slot = 0), take the per-key MINIMUM. Returns the distinct
    probe keys (plus ``group_cols`` if given) with ``out``: a BIGINT
    that is ALWAYS >= the true count (the one-sided CM guarantee),
    within ``(e/width) * N`` of it with probability ``1 - e^-depth``,
    and exactly 0 for keys all of whose slots are empty — absent keys
    mostly estimate 0 unless every slot collides. NULL probes are
    excluded up front (the build excluded NULL too), never a phantom
    count.

    The sketch side is <= depth * width rows per group by construction
    — always broadcastable; the probe side streams map-side, so
    estimating a billion keys is one broadcast join, no shuffle of the
    sketch."""
    gcols = list(group_cols or [])
    k = _as_col(key_col)
    probes = (
        keys.where(k.isNotNull())
        .select(*gcols, k.alias(key_col))
        .distinct()
        .select(
            *gcols,
            key_col,
            F.posexplode(F.array(*_slots(F.col(key_col), depth, width))
                         ).alias("_r", "slot"),
        )
    )
    joined = probes.join(
        F.broadcast(sketch.select(*gcols, "slot", "cnt")),
        on=gcols + ["slot"],
        how="left",
    )
    return (
        joined.groupBy(*gcols, key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out))
    )


def cms_join_size(
    left: DataFrame,
    right: DataFrame,
    group_cols: list[str] | None = None,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    out: str = "join_size_estimate",
) -> DataFrame:
    """Equi-join cardinality estimate from two stored sketches (built
    with the SAME depth/width over the respective join keys): the CM
    inner product ``min_r sum_pos a[r,pos] * b[r,pos]`` — an upper
    bound on ``sum_k count_a(k) * count_b(k)``, which is exactly the
    row count of ``A JOIN B ON key``. The plan inner-joins two
    <= depth*width-row relations on slot, sums products per hash row
    (r = slot div width), and mins across rows: a planner-grade size
    probe that never touches either fact. Returns one row per group.
    Error is one-sided like the point estimate: expected inflation is
    ``~n_a * n_b / width`` per hash row (cross-key collisions), so
    even disjoint key sets estimate a small positive number at high
    key density — size ``width`` to the product mass you need
    resolved. The min runs over a DENSE 0..depth-1 row spine (a row
    with zero overlapping slots contributes 0, and a group present in
    only one sketch surfaces with estimate 0 rather than vanishing)."""
    gcols = list(group_cols or [])
    a = left.select(*gcols, "slot", F.col("cnt").alias("_a"))
    b = right.select(*gcols, "slot", F.col("cnt").alias("_b"))
    per_row = (
        a.join(b, on=gcols + ["slot"], how="inner")
        .groupBy(
            *gcols,
            (F.col("slot") / F.lit(int(width)))
            .cast("int")
            .alias("_r"),
        )
        .agg(F.sum(F.col("_a") * F.col("_b")).alias("_ip"))
    )
    # dense row spine: a row with zero overlap must contribute 0 or
    # the min would silently skip the most-informative (emptiest) row;
    # the group spine comes from the SKETCH INPUTS (union), not from
    # per_row — groups whose sketches share no slot at all must still
    # surface with estimate 0, not vanish
    spine = F.explode(
        F.sequence(F.lit(0), F.lit(int(depth) - 1))
    ).alias("_r")
    if gcols:
        groups = (
            a.select(*gcols).union(b.select(*gcols)).distinct()
        )
        full = groups.select(*gcols, spine)
        joined = full.join(per_row, on=gcols + ["_r"], how="left")
        grouped = joined.groupBy(*gcols)
    else:
        full = left.sparkSession.range(1).select(spine)
        joined = full.join(per_row, on=["_r"], how="left")
        grouped = joined.groupBy()
    return grouped.agg(
        F.min(F.coalesce(F.col("_ip"), F.lit(0))).alias(out)
    )
