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


# ---------------------------------------------------------------------------
# Theta sketches: distinct-set ALGEBRA (union / intersection / difference)
# ---------------------------------------------------------------------------


def theta_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Per-group Theta sketch of ``value_col`` — the stored distinct-set
    form that supports FULL set algebra, not just union. DataSketches
    Theta keeps the k smallest value hashes (default lgNomEntries=12,
    k=4096): below k it retains EVERY hash, so intersections and
    differences are exact; above k they are sampled estimates with
    ~1/sqrt(k) relative error. Same build shape as the HLL path: one
    scan, map-side-combinable ObjectHashAggregate."""
    agg = (
        F.theta_sketch_agg(value_col)
        if lg_k is None
        else F.theta_sketch_agg(value_col, lg_k)
    )
    return df.groupBy(*group_cols).agg(agg.alias(sketch_col))


def theta_rollup(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union stored Theta sketches to a coarser grouping — scans only
    the sketch table, map-side-combinable like the HLL rollup."""
    return sketches.groupBy(*group_cols).agg(
        F.theta_union_agg(sketch_col).alias(sketch_col)
    )


def theta_set_estimates(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    sketch_col: str = "sketch",
    lg_union: int | None = None,
) -> DataFrame:
    """Per-key set algebra between two stored Theta sketch tables:
    ``est_union``, ``est_intersection``, and ``est_difference``
    (left minus right) alongside both input estimates — all pure
    projections over the joined sketches (the two-column theta_*
    functions aggregate nothing). Unlike HLL inclusion-exclusion
    (:func:`sketch_overlap`), the intersection here is computed on the
    retained hash sets directly: EXACT whenever both sketches are in
    exact mode, and never negative, so small overlaps stay
    trustworthy. Intersection and difference inherit the INPUT
    sketches' thetas, but the union op has its own nominal-entries
    gadget (engine default lgNomEntries=12): two exact-mode inputs
    whose combined entries exceed 4096 get a SAMPLED union estimate
    unless ``lg_union`` raises the gadget to match the build's
    ``lg_k`` — pass it whenever exact-regime unions matter
    (measured: 7k-entry unions of lg_k=14 builds are exact with
    lg_union=14, ~1% off without)."""
    a = left.select(*key_cols, F.col(sketch_col).alias("_th_a"))
    b = right.select(*key_cols, F.col(sketch_col).alias("_th_b"))
    joined = a.join(b, key_cols)
    return joined.select(
        *key_cols,
        F.theta_sketch_estimate("_th_a").alias("est_left"),
        F.theta_sketch_estimate("_th_b").alias("est_right"),
        F.theta_sketch_estimate(
            F.theta_union("_th_a", "_th_b", lg_union)
        ).alias("est_union"),
        F.theta_sketch_estimate(
            F.theta_intersection("_th_a", "_th_b")
        ).alias("est_intersection"),
        F.theta_sketch_estimate(
            F.theta_difference("_th_a", "_th_b")
        ).alias("est_difference"),
    )


def theta_similarity_pairs(
    sketches: DataFrame,
    key_col: str,
    sketch_col: str = "sketch",
    min_jaccard_ppm: int = 0,
    lg_union: int | None = None,
) -> DataFrame:
    """Sketch-based SET-SIMILARITY JOIN over a stored Theta relation:
    for every key pair (key_a < key_b), the estimated set sizes,
    intersection, union, and the similarity measures the dedup tiers
    prune candidates with —

      ``jaccard_ppm      = |A n B| * 10^6 div |A u B|``
      ``containment_a_ppm = |A n B| * 10^6 div |A|``  (and _b)

    — all answered from the SKETCHES alone, the planner-grade shape:
    at 100 TB the question "which shard/source/bucket pairs overlap
    enough to deserve the expensive pairwise dedup pass?" is decided
    by this join over the GROUP-level sketch relation (one bounded row
    per group — the fact is never rescanned), and only surviving pairs
    proceed. ``min_jaccard_ppm`` applies that prune here.

    The pair expansion is a broadcast non-equi self-join on the
    bounds-sized sketch relation (groups^2 pairs of ~kB states — the
    caller's contract is a group-level relation, NEVER per-document
    sketches; for documents use the MinHash LSH tier, whose banding
    avoids the quadratic). Estimates follow the theta_set_estimates
    exactness contract: EXACT (and the ppm values exact integers,
    hash-gateable) while both sketches retain every hash, sampled
    beyond; pass ``lg_union`` = the build's lg_k so exact-regime
    unions stay exact. ppm values round the estimates to BIGINT before
    the integer division; a zero-size denominator yields NULL
    (undefined, not 0)."""
    a = sketches.select(
        F.col(key_col).alias("key_a"), F.col(sketch_col).alias("_th_a")
    )
    b = sketches.select(
        F.col(key_col).alias("key_b"), F.col(sketch_col).alias("_th_b")
    )
    pairs = a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))
    est = pairs.select(
        "key_a",
        "key_b",
        F.round(F.theta_sketch_estimate("_th_a"))
        .cast("bigint")
        .alias("est_a"),
        F.round(F.theta_sketch_estimate("_th_b"))
        .cast("bigint")
        .alias("est_b"),
        F.round(
            F.theta_sketch_estimate(
                F.theta_intersection("_th_a", "_th_b")
            )
        )
        .cast("bigint")
        .alias("est_intersection"),
        F.round(
            F.theta_sketch_estimate(
                F.theta_union("_th_a", "_th_b", lg_union)
            )
        )
        .cast("bigint")
        .alias("est_union"),
    )

    def _ppm(num: str, den: str) -> F.Column:
        return F.when(
            F.col(den) > 0,
            F.expr(f"CAST(({num} * CAST(1000000 AS BIGINT)) div {den}"
                   " AS BIGINT)"),
        )

    out = est.select(
        "key_a",
        "key_b",
        "est_a",
        "est_b",
        "est_intersection",
        "est_union",
        _ppm("est_intersection", "est_union").alias("jaccard_ppm"),
        _ppm("est_intersection", "est_a").alias("containment_a_ppm"),
        _ppm("est_intersection", "est_b").alias("containment_b_ppm"),
    )
    if min_jaccard_ppm > 0:
        out = out.filter(
            F.col("jaccard_ppm") >= F.lit(min_jaccard_ppm)
        )
    return out


# ---------------------------------------------------------------------------
# KLL sketches: mergeable QUANTILES (the distinct-count story, for ranks)
# ---------------------------------------------------------------------------


def quantile_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int | None = None,
    sketch_col: str = "qsketch",
) -> DataFrame:
    """Per-group KLL quantile sketch of a DOUBLE column — the stored
    form of a percentile. Below ``k`` retained items (default k=200)
    the sketch holds every value and quantiles are EXACT order
    statistics; above, rank error is ~1.65% at 99% confidence
    (Karnin-Lang-Liberty, FOCS'16). NOTE: past capacity, compaction is
    RANDOMIZED — unlike the HLL/Theta builds, two runs over identical
    data may retain different items (estimates still within bound), so
    exact-equality tests and oracle gates must stay in exact mode or
    assert bounds, never bytes."""
    agg = (
        F.kll_sketch_agg_double(value_col)
        if k is None
        else F.kll_sketch_agg_double(value_col, k)
    )
    return df.groupBy(*group_cols).agg(agg.alias(sketch_col))


def quantile_rollup(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "qsketch",
) -> DataFrame:
    """Merge stored KLL sketches to a coarser grouping — the percentile
    range-query path; scans only the sketch table."""
    return sketches.groupBy(*group_cols).agg(
        F.kll_merge_agg_double(sketch_col).alias(sketch_col)
    )


def quantile_estimates(
    sketches: DataFrame,
    probs: list[float],
    out_names: list[str] | None = None,
    sketch_col: str = "qsketch",
) -> DataFrame:
    """Attach one quantile column per requested rank plus ``q_n`` (the
    absorbed row count). In exact mode the returned value is the order
    statistic ``sorted[ceil(q * n) - 1]`` (inclusive-rank semantics,
    q=0 clamping to the minimum) — pinned by the differential property
    test."""
    if out_names is None:
        out_names = [f"q{int(p * 100):02d}" for p in probs]
    if len(out_names) != len(probs):
        raise ValueError("out_names must match probs length")
    if len(set(out_names)) != len(out_names):
        raise ValueError(
            f"quantile column names collide: {out_names} — probs in the "
            "same integer-percent bucket need explicit out_names"
        )
    cols = [
        F.kll_sketch_get_quantile_double(sketch_col, F.lit(p)).alias(n)
        for p, n in zip(probs, out_names)
    ]
    return sketches.select(
        "*",
        *cols,
        F.kll_sketch_get_n_double(sketch_col).alias("q_n"),
    )
