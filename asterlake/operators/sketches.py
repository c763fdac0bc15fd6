"""Mergeable distinct-count sketch maintenance (beyond-parity, scale op).

"Distinct users over any date range" is the canonical query that CANNOT
be answered incrementally with plain aggregates: distinct counts do not
add, so the naive plan rescans the whole fact for every asked range —
at 100 TB that is a full-history scan per dashboard refresh. The
streaming-algorithms answer is the mergeable sketch (Agarwal et al.,
"Mergeable Summaries", PODS'12; Heule et al., "HyperLogLog in
Practice", EDBT'13): keep one small HLL sketch per (group, day), stored
as an ordinary ``binary`` column, and answer ANY coarser rollup by
merging sketches — the fact is scanned exactly once, ever, per day.

Spark 4 ships the Apache DataSketches HLL surface as builtins
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``),
so the whole pipeline stays JVM-side in ObjectHashAggregate with
map-side partial merge — no UDF, no driver state:

1. **Build** (``distinct_sketches``): one scan of the new partition,
   one sketch (<= ~2 KB at lgk=12) per group. The aggregate is
   map-side-combinable: each task emits its local sketch and the
   shuffle moves sketches, never raw values.
2. **Maintain** (``advance_sketch_state``): union the stored state
   with the new day's sketches — touches only sketch rows. History is
   never rescanned; a crashed writer just re-runs its day (sketch
   union is idempotent: max-merge of registers).
3. **Answer** (``rollup_sketches`` + ``sketch_estimates``): re-group
   stored sketches to any coarser key set and estimate. A year-over-
   day rollup shuffles ~365 KB per group, not the fact.

Determinism contracts (tested in ``tests/test_sketches.py`` and
self-verified in-plan by the driver query ``q_sketch_rollup_merge``):

- **Exact below promotion**: DataSketches HLL stores explicit coupons
  until the sparse->dense promotion, and unions preserve coupon
  exactness, so low-cardinality groups estimate EXACTLY — independent
  of how the rows were split into sketches.
- **Bounded error above**: relative standard error is 1.04/sqrt(2^lgk)
  (~1.6% at the default lgk=12). Past promotion the estimate is NOT a
  pure function of the value set: different partitionings of the same
  rows promote cell sketches at different points (HLL_4 register
  clipping vs retained coupons), and the union path drops the HIP
  estimator a direct sketch would use — both documented DataSketches
  properties. Measured divergence between unrelated splits of the
  same 4k-distinct groups is <=1.4%; every split stays within the
  3-sigma bound of the exact count, which is the contract callers
  (and the driver query's in-plan booleans) rely on.

All sketches in one state table must share ``lgk``: ``hll_union_agg``
is called with ``allowDifferentLgConfigK=False`` so a mixed-precision
state fails loudly instead of silently degrading to the coarsest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_LGK = 12


def distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch (binary) of ``value_col`` per group — the stored
    form of a distinct count. One scan; ObjectHashAggregate with
    map-side partial merge, so the shuffle carries one <=~2KB sketch
    per (task, group), never raw values. NULL values are ignored (a
    group of only NULLs yields the empty sketch, estimate 0)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, lgk).alias(sketch_col)
    )


def rollup_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Re-aggregate stored sketches to a coarser grouping — the
    range-query path. Scans ONLY the sketch table (the fact never
    appears in this plan); ``hll_union_agg`` max-merges registers and
    is itself map-side-combinable. Mixed-lgk states raise (see module
    docstring)."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_union_agg(sketch_col, False).alias(sketch_col)
    )


def sketch_estimates(
    sketches: DataFrame,
    sketch_col: str = "sketch",
    out: str = "estimate",
) -> DataFrame:
    """Attach the BIGINT cardinality estimate for each stored sketch.
    A pure projection (whole-stage codegen); the estimate is a
    deterministic function of the sketch bytes."""
    return sketches.withColumn(
        out, F.hll_sketch_estimate(sketch_col)
    )


def advance_sketch_state(
    state: DataFrame,
    new_rows: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Incremental maintenance step: fold a new batch of raw rows into
    the per-group sketch state. Only the NEW rows are sketched (one
    scan of the delta); the stored state contributes sketch rows only.
    Union is associative and idempotent over register maxima, so
    advancing day-by-day lands on the same estimates as rebuilding
    from all history at once: day-by-day the state sketch is always a
    union result, so the estimate path (composite estimator over the
    merged gadget) matches the one-shot rollup's exactly (pinned by
    the differential test)."""
    delta = distinct_sketches(
        new_rows, group_cols, value_col, lgk, sketch_col
    )
    combined = state.select(*group_cols, sketch_col).unionByName(delta)
    return rollup_sketches(combined, group_cols, sketch_col)


def sketch_overlap(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Per-key overlap estimate between two stored sketch tables — the
    "audience overlap" question (customers active in BOTH segments)
    answered from sketches alone, no fact scan, no pairwise key join.

    Joins the two states on ``key_cols`` and applies inclusion-
    exclusion: ``|A ∩ B| = |A| + |B| - |A ∪ B|``, with the union from
    the two-sketch ``hll_union`` projection (whole-stage codegen, no
    aggregate). Output per key: ``est_left``, ``est_right``,
    ``est_union``, ``est_overlap`` (clamped at 0 — inclusion-exclusion
    over independent estimates can go slightly negative for disjoint
    sets). In the coupon regime all four are exact; past promotion the
    overlap inherits roughly the sum of the three estimators' errors,
    so it is a coarse signal at small overlaps — callers needing tight
    small-overlap bounds should keep higher-lgk sketches."""
    a = left.select(
        *key_cols, F.col(sketch_col).alias("_sk_a")
    )
    b = right.select(
        *key_cols, F.col(sketch_col).alias("_sk_b")
    )
    joined = a.join(b, key_cols)
    est_a = F.hll_sketch_estimate("_sk_a")
    est_b = F.hll_sketch_estimate("_sk_b")
    est_u = F.hll_sketch_estimate(
        F.hll_union("_sk_a", "_sk_b", False)
    )
    return joined.select(
        *key_cols,
        est_a.alias("est_left"),
        est_b.alias("est_right"),
        est_u.alias("est_union"),
        F.greatest(F.lit(0).cast("bigint"), est_a + est_b - est_u).alias(
            "est_overlap"
        ),
    )
