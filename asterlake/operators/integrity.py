"""Table integrity + distribution-drift operators (beyond-parity).

At 100 TB, two questions come up constantly that neither the reference
(whose serving layer trusts its single parquet file) nor plain Spark
answers out of the box:

- **"Is the replica byte-equivalent to the source?"** — after a
  migration, a backfill, an engine swap, or a cross-region copy, you
  need a content checksum that any engine can recompute from the rows
  alone. ``table_checksum`` produces one: per-row md5 over a canonical
  string encoding, folded to a 60-bit integer, combined with
  ORDER-INDEPENDENT aggregates (XOR + modular sum). Any row lost,
  duplicated, or altered changes the result; partitioning, file layout,
  and row order never do. The md5 hex-fold is the same engine-portable
  trick the sampling/MinHash oracles use — DuckDB, Trino, or another
  Spark cluster reproduce it bit-for-bit from SQL.

- **"Did the data drift since the reference snapshot?"** — feeding a
  training pipeline means monitoring incoming batches against the
  distribution the model was built on. ``tvd_drift`` computes the total
  variation distance between two snapshots' categorical distributions
  with EXACT integer arithmetic: TVD = sum|o*n_ref - r*n_cur| /
  (2*n_ref*n_cur), where the numerator is an exact BIGINT sum and only
  the final division is floating point — one IEEE op on identical
  operands in every engine, so the score is hash-gateable (unlike
  KL/PSI, whose logs diverge across libm implementations).

Scale shape: the checksum is a pure projection + one scalar (or
group-keyed) aggregate — no shuffle beyond the aggregate's own; drift is
two category-cardinality count aggregates + a category-keyed full-outer
join (categories are vocabulary-sized, never the fact).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Largest Mersenne prime below 2^63: sums of 60-bit row hashes stay exact
# in DECIMAL(38,0) and reduce to a canonical BIGINT residue.
_CHECKSUM_MOD = 2_305_843_009_213_693_951  # 2^61 - 1

# Version of the canonical row encoding below. Bumped whenever the
# encoding changes so stored manifests can tell "written under an older
# format" apart from "corrupted": v1 was the NUL-token coalesce, v2 is
# the length-prefixed injective form. Persisted checksums (versioned
# snapshot manifests) record this and verify_version refuses to compare
# across versions instead of reporting a false tamper.
SIG_ENCODING = 2

# Canonical encoding: the per-field token is UNAMBIGUOUSLY parseable —
# NULL encodes as the bare token 'n'; a non-null value encodes as
# 'v<charlen>:<value>'. The length prefix makes the '|'-joined row string
# injective even when values themselves contain '|' or the null token
# (('a|b','c') and ('a','b|c') encode differently: 'v3:a|b|v1:c' vs
# 'v1:a|v3:b|c'), and 'n' vs 'v0:' keeps NULL != '' at the row level.
_SEP = "|"


def _canon_field(col: str) -> F.Column:
    s = F.col(col).cast("string")
    return F.when(s.isNull(), F.lit("n")).otherwise(
        F.concat(F.lit("v"), F.length(s).cast("string"), F.lit(":"), s)
    )


def row_signature(cols: Sequence[str]) -> F.Column:
    """60-bit integer content hash of a row: first 15 hex chars of
    ``md5(concat_ws('|', canonical fields))`` read base-16. Each field is
    a length-prefixed stringified cast ('v<len>:<value>', NULL -> 'n') —
    an injective, engine-portable encoding (dates/decimals print
    identically under the repo's UTC-pinned session, and char length is
    codepoint count in both Spark and DuckDB)."""
    canon = F.concat_ws(_SEP, *[_canon_field(c) for c in cols])
    return F.conv(
        F.substring(F.md5(canon.cast("binary")), 1, 15), 16, 10
    ).cast("long")


def table_checksum(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Order/partitioning-independent content checksum.

    Returns one row (or one per ``group_cols`` combination — the
    per-shard manifest shape for incremental replica validation) with:

    - ``n_rows`` BIGINT — row count,
    - ``xor_sig`` BIGINT — XOR of the row signatures (cheap, catches any
      single-row change; blind to even multiplicities),
    - ``sum_sig`` BIGINT — modular sum of the row signatures mod 2^61-1
      (catches multiplicity changes XOR misses; exact via DECIMAL(38,0)
      partials, so no overflow at any row count under ANSI mode).

    A replica matches iff all three agree per group. Any engine can
    recompute this from SQL alone — no Spark-private hash functions
    (xxhash64 would be faster but pins the check to Spark)."""
    value_cols = list(cols) if cols is not None else [
        c for c in df.columns if c not in set(group_cols)
    ]
    sig = row_signature(value_cols)
    # coalesce to the identity element (0) so an EMPTY table checksums as
    # (0, 0, 0) instead of NULLs — the value combine_checksums folds with,
    # and what a replica check against a legitimately-empty shard expects
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.coalesce(F.bit_xor(sig), F.lit(0).cast("bigint")).alias(
            "xor_sig"
        ),
        F.coalesce(
            F.pmod(
                F.sum(sig.cast("decimal(38,0)")),
                F.lit(_CHECKSUM_MOD).cast("decimal(38,0)"),
            ).cast("bigint"),
            F.lit(0).cast("bigint"),
        ).alias("sum_sig"),
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def numeric_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 16,
) -> DataFrame:
    """Numeric-feature twin of :func:`tvd_drift`: bin a numeric column
    into ``n_bins`` equal-width bins defined by the REFERENCE snapshot's
    [min, max] (the model saw the reference — its range is the frame
    drift is judged against), then compute the binned TVD. Current
    values outside the reference range clamp into the edge bins, so new
    out-of-range mass shows up as edge-bin drift instead of vanishing.
    NULLs are excluded on both sides (a missing observation is a
    completeness question for the quality operators, not a distribution
    shape). A degenerate reference (min == max) puts everything in bin
    0, so drift then measures pure out-of-support mass.

    The bin id is ``clamp(floor((v - lo) / (hi - lo) * n_bins))`` — all
    double IEEE ops on identical operands in every engine, so the bin
    assignment (and therefore the TVD) is hash-gateable. The reference
    bounds ride a 1-row broadcast onto both sides; shape is otherwise
    identical to tvd_drift."""
    # 1-row bounds, persisted: both sides' bin projections broadcast it,
    # and without the cache each consumer branch re-scans the reference
    # to recompute min/max
    bounds = ref.agg(
        F.min(F.col(value_col).cast("double")).alias("_lo"),
        F.max(F.col(value_col).cast("double")).alias("_hi"),
    ).persist()

    def binned(df: DataFrame) -> DataFrame:
        v = F.col(value_col).cast("double")
        raw = F.floor(
            (v - F.col("_lo"))
            / (F.col("_hi") - F.col("_lo"))
            * F.lit(float(n_bins))
        )
        bin_id = (
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
            .otherwise(
                F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw))
            )
            .cast("int")
        )
        return (
            df.filter(v.isNotNull())
            .crossJoin(F.broadcast(bounds))
            .select(bin_id.alias("bin"))
        )

    return tvd_drift(binned(ref), binned(cur), "bin")


def combine_checksums(*manifests: dict) -> dict:
    """Combine per-increment checksums into the whole-table checksum in
    O(increments) driver work — no data rescan.

    Both signature aggregates are homomorphic under disjoint union: XOR
    composes by XOR, the modular sum by modular addition, counts by
    addition. So an append-only ingest can checkpoint a manifest per
    batch (e.g. from :func:`table_checksum` or the versioned-snapshot
    writer) and audit the cumulative table at any point by folding the
    manifests — the only way a 100 TB table gets a continuously-verified
    checksum without paying a full scan per audit. Inputs are dicts with
    ``n_rows`` / ``xor_sig`` / ``sum_sig`` keys (a ``table_checksum``
    row's ``asDict()`` works directly)."""
    n, x, s = 0, 0, 0
    for m in manifests:
        n += int(m["n_rows"])
        x ^= int(m["xor_sig"])
        s = (s + int(m["sum_sig"])) % _CHECKSUM_MOD
    return {"n_rows": n, "xor_sig": x, "sum_sig": s}


def tvd_drift(
    ref: DataFrame,
    cur: DataFrame,
    category_col: str,
) -> DataFrame:
    """Total variation distance between two snapshots' distributions
    over ``category_col``, plus the per-category evidence.

    Output: one row per category present in EITHER snapshot —
    ``(category_col, ref_n, cur_n, drift_num)`` — and on every row the
    global ``n_ref``, ``n_cur``, ``tvd`` columns, where

        tvd = SUM(|cur_n * n_ref - ref_n * n_cur|) / (2 * n_ref * n_cur)

    is in [0, 1]: 0 = identical distributions, 1 = disjoint support.
    ``drift_num = |cur_n * n_ref - ref_n * n_cur|`` is the category's
    exact integer contribution, so "which category moved" is read
    straight off the largest values. Missing categories count 0 —
    appearing/vanishing values are drift, not errors.

    Arithmetic is DECIMAL(38,0) internally (the cross products exceed
    BIGINT once both snapshots pass ~3e9 rows); the emitted drift_num
    casts back to BIGINT, which under the session's ANSI mode fails
    LOUDLY rather than wrapping if a deployment ever crosses that line.

    Both inputs must be batch DataFrames; n_ref and n_cur must be > 0
    (empty snapshots have no distribution to compare).
    """
    r = ref.groupBy(F.col(category_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("ref_n")
    )
    c = cur.groupBy(F.col(category_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("cur_n")
    )
    # persist the category-cardinality count table: four downstream
    # branches (totals, deviations, the sum, the evidence join) re-derive
    # it lazily otherwise, which re-scans BOTH fact snapshots per branch
    # (8 fact scans observed in the un-persisted plan) — the same
    # branch-diamond fix exact_percentiles applies to its counts. The
    # cached state is vocabulary-sized, never the corpus.
    joined = (
        r.join(c, [category_col], "full_outer")
        .select(
            category_col,
            F.coalesce("ref_n", F.lit(0).cast("bigint")).alias("ref_n"),
            F.coalesce("cur_n", F.lit(0).cast("bigint")).alias("cur_n"),
        )
        .persist()
    )
    # exact integer cross-multiplied deviation per category; the totals
    # ride the same tiny category table (no second pass over the facts)
    with_tot = joined.crossJoin(
        F.broadcast(
            joined.agg(
                F.sum("ref_n").cast("bigint").alias("n_ref"),
                F.sum("cur_n").cast("bigint").alias("n_cur"),
            )
        )
    ).select(
        category_col,
        "ref_n",
        "cur_n",
        "n_ref",
        "n_cur",
        F.abs(
            F.col("cur_n").cast("decimal(38,0)") * F.col("n_ref")
            - F.col("ref_n").cast("decimal(38,0)") * F.col("n_cur")
        )
        .cast("bigint")
        .alias("drift_num"),
    )
    totals = with_tot.groupBy("n_ref", "n_cur").agg(
        F.sum(F.col("drift_num").cast("decimal(38,0)"))
        .cast("bigint")
        .alias("_num_sum")
    )
    # ONE double division of exactly-representable integer operands —
    # bit-identical across engines (the repo's hash-gate discipline)
    tvd = F.col("_num_sum").cast("double") / (
        F.lit(2.0) * F.col("n_ref").cast("double") * F.col("n_cur").cast("double")
    )
    return (
        with_tot.join(
            F.broadcast(totals.select("n_ref", "n_cur", "_num_sum")),
            ["n_ref", "n_cur"],
        )
        .select(
            category_col,
            "ref_n",
            "cur_n",
            "n_ref",
            "n_cur",
            "drift_num",
            tvd.alias("tvd"),
        )
    )
