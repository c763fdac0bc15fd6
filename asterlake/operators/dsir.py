"""Data selection via hashed n-gram importance weights — the DSIR
recipe (Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023): estimate target-vs-raw log-likelihood
ratios over FEATURE-HASHED n-grams (two bag-of-hashed-grams LMs), score
every raw document by its summed ratio, and keep the high-importance
slice — the standard "make CommonCrawl look like Wikipedia" selection
stage of a pre-training pipeline.

The reference (VictorClvtt/nasa_asteroid_data_lakehouse) has no data-
selection surface — beyond-parity scale tooling, same tier as
:mod:`asterlake.operators.ngramlm` (whose quantized-model discipline
this module reuses).

Determinism/exactness (the engine's house rules):

- Feature hashing reuses :func:`asterlake.operators.sampling.
  hash_bucket` — md5-based, engine-portable (DuckDB replays it
  digit-by-digit via ``duck_hash_bucket_sql``), never an engine hash.
- The trained model is a FULL ``buckets``-sized table of integer
  MICRO-NAT log ratios (add-k smoothed on both sides, one driver-side
  ln per bucket, floored) — the shipped artifact is the quantized
  table, so every document score is an exact BIGINT sum:
  partitioning-, engine- and fold-order-independent.
- Selection never computes a float: DSIR's resampling is replaced by
  the deterministic per-gram-average gate
  ``weight_micros >= thr_micros * n_grams`` (integer cross-multiply;
  a top-k by (weight, id) composes the same way via sort/limit).

Scale shape: training is two map-side-combined hashed-count passes
(shuffle carries <= ``buckets`` rows each; the collect is model-sized);
scoring is ONE row-local projection — grams, buckets, and the ratio
fold all inside a single higher-order expression over a literal map,
no shuffle, no UDF, predicate-pushdown friendly. At 100 TB: one
map-only pass, exactly like bigram_score.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from asterlake.operators.sampling import hash_bucket

__all__ = [
    "hashed_gram_counts",
    "dsir_train",
    "replay_dsir_train",
    "dsir_weights",
    "dsir_weight_cols",
]

MICROS = 1_000_000


def _tokens(text_col: str) -> F.Column:
    # NULL/whitespace-safe: NULL text is the empty stream (0 grams,
    # weight 0), matching the SQL oracles (the ngramlm ADVICE contract)
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    return F.filter(toks, lambda t: t != "")


def _gram_buckets(text_col: str, buckets: int) -> F.Column:
    """Per-document array of hashed word-bigram buckets (adjacent
    pairs, no boundary markers — the DSIR feature space), each gram
    md5-bucketed with the engine's portable hash."""
    toks = _tokens(text_col)
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.transform(grams, lambda g: hash_bucket(g, buckets))


def hashed_gram_counts(
    docs: DataFrame, text_col: str = "text", buckets: int = 256
) -> DataFrame:
    """``(bucket int, n bigint)`` — exact hashed-bigram counts over the
    corpus. One map-side-combined pass; the shuffle carries at most
    ``buckets`` rows per map partition."""
    return (
        docs.select(
            F.explode(_gram_buckets(text_col, buckets)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def _ratio_table(
    tgt: dict[int, int],
    raw: dict[int, int],
    buckets: int,
    k_num: int,
    k_den: int,
) -> dict[int, int]:
    """floor(1e6 * ln(p_target(b) / p_raw(b))) for EVERY bucket, add-k
    smoothed on both sides — the full quantized model (zero-count
    buckets get the constant ln((T_raw + kB)/(T_tgt + kB)) ratio).
    ln of a quotient of exact rationals, one driver libm call per
    bucket, floored — identical in the distributed and replay paths."""
    t_tot, r_tot = sum(tgt.values()), sum(raw.values())
    out = {}
    for b in range(buckets):
        # p_t = (c_t*den + num) / (T_t*den + num*B); ratio of the two
        # rationals simplifies to an exact integer fraction
        num = (tgt.get(b, 0) * k_den + k_num) * (r_tot * k_den + k_num * buckets)
        den = (raw.get(b, 0) * k_den + k_num) * (t_tot * k_den + k_num * buckets)
        out[b] = math.floor(MICROS * math.log(num / den))
    return out


def dsir_train(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    buckets: int = 256,
    k_num: int = 1,
    k_den: int = 2,
) -> dict[int, int]:
    """Train the quantized importance-ratio table: two hashed-count
    passes (target corpus, raw corpus), driver-side add-k ratio per
    bucket. Returns ``{bucket: log_ratio_micros}`` with an entry for
    EVERY bucket. Driver state is ``buckets``-sized, never data-sized;
    bit-reproducible under any partitioning (exact BIGINT counts in,
    pure function out — differential twin: :func:`replay_dsir_train`,
    pinned in tests/test_dsir.py)."""
    t_rows = hashed_gram_counts(target, text_col, buckets).collect()  # driver-ok: <= buckets rows, the collect IS the model
    r_rows = hashed_gram_counts(raw, text_col, buckets).collect()  # driver-ok: <= buckets rows, the collect IS the model
    tgt = {r["bucket"]: r["n"] for r in t_rows}
    rw = {r["bucket"]: r["n"] for r in r_rows}
    return _ratio_table(tgt, rw, buckets, k_num, k_den)


def replay_dsir_train(
    target_texts: list[str],
    raw_texts: list[str],
    buckets: int = 256,
    k_num: int = 1,
    k_den: int = 2,
) -> dict[int, int]:
    """Pure-Python twin of :func:`dsir_train` (md5 bucketing replayed
    byte-for-byte) — the differential pin."""
    import hashlib

    def counts(texts: list[str]) -> dict[int, int]:
        out: dict[int, int] = {}
        for t in texts:
            toks = (t or "").split()
            for a, b in zip(toks, toks[1:]):
                h = int(
                    hashlib.md5(f"{a} {b}".encode()).hexdigest()[:8], 16
                ) % buckets
                out[h] = out.get(h, 0) + 1
        return out

    return _ratio_table(
        counts(target_texts), counts(raw_texts), buckets, k_num, k_den
    )


def dsir_weights(
    docs: DataFrame,
    ratio_micros: dict[int, int],
    buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document importance weight under the pinned quantized ratio
    table: ``(id_col, n_grams int, weight_micros bigint)``. Pure
    row-local projection — the full table rides in as a literal map
    (every bucket present, so lookups never miss), grams hash and fold
    inside one higher-order expression, the sum is exact BIGINT. No
    shuffle, no UDF; gate downstream with the integer cross-multiply
    ``weight_micros >= thr_micros * n_grams``."""
    n_grams, weight = dsir_weight_cols(ratio_micros, buckets, text_col)
    return docs.select(
        F.col(id_col),
        n_grams.alias("n_grams"),
        weight.alias("weight_micros"),
    )


def dsir_weight_cols(
    ratio_micros: dict[int, int],
    buckets: int = 256,
    text_col: str = "text",
) -> tuple[F.Column, F.Column]:
    """``(n_grams, weight_micros)`` as composable COLUMNS — the same
    row-local fold :func:`dsir_weights` projects, for pipelines that
    gate on several signals in one projection (the
    ngramlm.bigram_score_cols pattern).

    The table rides in as an ARRAY literal indexed by bucket, not a
    map: buckets are dense ints in [0, B), and ``element_at`` on a
    literal MAP is a linear ArrayBasedMapData scan per lookup while
    array indexing is O(1). (Measured neutral at sf0.1/B=256 — the
    per-gram md5 bucket chain dominates the interpreted HOF fold —
    but the scan grows with B and the array never does.)"""
    assert set(ratio_micros) == set(range(buckets)), "full table required"
    lit_arr = F.lit(
        [int(ratio_micros[b]) for b in range(buckets)]
    ).cast("array<bigint>")
    bks = _gram_buckets(text_col, buckets)
    return (
        F.size(bks),
        F.aggregate(
            F.transform(bks, lambda b: F.element_at(lit_arr, b + 1)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ),
    )
