"""Corpus-composition operators: per-domain caps, token budgets,
mixture re-weighting, and deterministic materialization — the
CommonCrawl-pipeline stage that decides HOW MUCH of each source a
training corpus contains (Gopher/DoReMi-style domain mixing; the
per-host caps every web-scale dedup pipeline applies).

The reference has no corpus-composition surface — beyond-parity scale
tooling, same tier as :mod:`asterlake.operators.sampling`.

Scale shapes (all exact-integer, engine-portable):

- :func:`domain_caps` — at most ``cap`` documents per domain in a
  deterministic order. One shuffle on the domain key; rank state is
  one window per partition. A pathological mega-domain is exactly the
  skew AQE's skew-join/partition splitting handles, and because the
  rank only needs the TOP ``cap`` per key, the window runs after a
  cheap ``filter``-free pass — Spark's WindowExec streams each
  partition without materializing beyond the frame.
- :func:`token_budget` — per-domain exact BIGINT token totals:
  map-side-combinable aggregate, shuffle carries one row per domain.
- :func:`mixture_weights` — per-domain repetition factor toward pinned
  target shares: ``factor = share * total_tokens / domain_tokens`` in
  parts-per-million. The multiply routes through DECIMAL(38,0): at
  100 TB ``share_ppm * total_tokens`` overflows BIGINT (1e6 * 1e13 >
  2^63), and a silent wrap is exactly the bug a scale review exists to
  catch. Division floors (DECIMAL div), result fits BIGINT by
  construction (factor is bounded by total/domain).
- :func:`apply_mixture` — materialize the re-weighted corpus without
  randomness: every doc repeats ``floor(factor)`` times and the
  fractional remainder keeps doc ``i`` iff ``(doc_id * P) % 1e6 <
  frac_ppm`` with P an odd constant coprime to 1e6 — a fixed-point
  arithmetic decision both engines replay bit-identically (no RNG, no
  engine hash). The factor table joins broadcast (domain counts are
  small); the explode emits ``copy_id`` so downstream packing sees
  distinct rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

__all__ = [
    "domain_caps",
    "token_budget",
    "mixture_weights",
    "apply_mixture",
]

PPM = 1_000_000
# odd multiplier for the fractional-keep decision; coprime to 1e6 so
# doc_id * P mod 1e6 cycles the full residue ring
FRAC_P = 48271


def domain_caps(
    docs: DataFrame,
    domain_col: str = "source",
    cap: int = 10,
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` documents per domain, deterministic
    survivor set: lowest ``order_col`` first (ingest order / stable id
    — never an engine hash, so any engine agrees on the survivors).
    Returns the input columns unchanged for the kept rows."""
    w = Window.partitionBy(domain_col).orderBy(F.col(order_col).asc())
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= cap)
        .drop("_rk")
    )


def token_budget(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """``(domain, n_docs bigint, n_tokens bigint)`` — exact whitespace
    token totals per domain. One map-side-combined pass."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    return (
        docs.groupBy(F.col(domain_col).alias("domain"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.size(toks)).cast("bigint").alias("n_tokens"),
        )
    )


def mixture_weights(
    budget: DataFrame,
    target_ppm: dict[str, int],
    default_ppm: int = 0,
) -> DataFrame:
    """Per-domain repetition factor in parts-per-million:
    ``factor_ppm = floor(share_ppm * total_tokens / domain_tokens)``.

    ``target_ppm`` maps domain -> integer share in PPM (a pinned
    literal — mixture targets are a modeling decision, not data);
    domains not in the map get ``default_ppm``. All arithmetic is
    exact: the share table rides in as a literal map, the multiply is
    DECIMAL(38,0) (BIGINT would wrap at 100 TB: 1e6 ppm * 1e13 tokens
    > 2^63), and the division is ``div`` — exact integral division of
    the exact product, never a rounded DECIMAL quotient (decimal ``/``
    rounds to scale 6 and its floor can disagree with the true floor
    within 5e-7 of an integer; DuckDB replays ``div`` as HUGEINT
    ``//``). Output: ``(domain, n_docs, n_tokens, share_ppm int,
    factor_ppm bigint)``."""
    share_map = F.map_from_arrays(
        F.lit(list(target_ppm.keys())),
        F.lit([int(v) for v in target_ppm.values()]),
    )
    total = budget.agg(
        F.sum("n_tokens").cast("decimal(38,0)").alias("_total_tokens")
    )
    share = F.coalesce(
        F.element_at(share_map, F.col("domain")), F.lit(int(default_ppm))
    ).cast("int")
    return (
        budget.join(F.broadcast(total))
        .withColumn("share_ppm", share)
        .withColumn(
            "factor_ppm",
            F.expr(
                "CAST((CAST(share_ppm AS DECIMAL(38,0)) * _total_tokens)"
                " div CAST(n_tokens AS DECIMAL(38,0)) AS BIGINT)"
            ),
        )
        .drop("_total_tokens")
    )


def apply_mixture(
    docs: DataFrame,
    weights: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the re-weighted corpus deterministically: doc ``i``
    in a domain with ``factor_ppm = f`` appears ``floor(f / 1e6)``
    times, plus one more iff ``(i * 48271) % 1e6 < f % 1e6`` — pure
    integer arithmetic, no RNG, no engine hash, so the sampled corpus
    is THE corpus (any engine replays it row-for-row). Adds
    ``copy_id int`` (0-based). The weights side joins broadcast."""
    w = weights.select(
        F.col("domain").alias(domain_col), "factor_ppm"
    )
    whole = F.expr(f"factor_ppm div {PPM}")
    frac = F.col("factor_ppm") % F.lit(PPM)
    keep_extra = (
        (F.col(id_col).cast("bigint") * F.lit(FRAC_P)) % F.lit(PPM) < frac
    )
    n_copies = (whole + F.when(keep_extra, 1).otherwise(0)).cast("int")
    return (
        docs.join(F.broadcast(w), domain_col)
        .where(n_copies > 0)
        .withColumn(
            "copy_id", F.explode(F.sequence(F.lit(0), n_copies - 1))
        )
        .drop("factor_ppm")
    )


def integer_root(n: Column, t: int) -> Column:
    """Exact floor of the t-th root of a non-negative BIGINT column.

    A float ``pow(n, 1/t)`` seeds the answer, then exact integer
    comparisons over seed-2..seed+2 pick the true floor root — so a
    last-ulp libm divergence between engines (pow is NOT correctly
    rounded) cannot change the result, only the (corrected) seed. The
    candidate powers route through DECIMAL(38,0): at n within 2/r of
    the BIGINT bound, (seed+2)^t overflows a long — which raises under
    ANSI mode instead of rejecting the candidate."""
    if t < 2:
        raise ValueError("integer_root needs t >= 2 (t=1 is identity)")
    seed = F.floor(F.pow(n.cast("double"), 1.0 / t)).cast("long")
    cands = F.array([seed + F.lit(d) for d in (-2, -1, 0, 1, 2)])

    def pow_t(r: Column) -> Column:
        out = r.cast("decimal(38,0)")
        for _ in range(t - 1):
            out = (out * r.cast("decimal(38,0)")).cast("decimal(38,0)")
        return out

    ok = F.filter(
        cands, lambda r: (r >= 0) & (pow_t(r) <= n.cast("decimal(38,0)"))
    )
    return F.array_max(ok)


def temperature_shares(
    budget: DataFrame,
    temperature: int = 3,
    domain_col: str = "domain",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Temperature-scaled mixture shares (the T5/mT5 multilingual
    sampling rule): domain weight ∝ n_tokens^(1/T), flattening the
    head domains and up-weighting the tail as T grows (T=1 is
    proportional, T->inf uniform).

    Exact arithmetic end-to-end: the root is :func:`integer_root`
    (floor t-th root, BIGINT), the total is one broadcast scalar, and
    ``share_ppm = (10^6 * w) div total_w`` is integer division — no
    float ever compares or accumulates, so the shares are
    hash-gateable. Output: ``(domain, n_tokens, w, share_ppm)``;
    feed the shares into :func:`mixture_weights`/:func:`apply_mixture`
    for materialization."""
    w = budget.select(
        F.col(domain_col),
        F.col(tokens_col),
        integer_root(F.col(tokens_col).cast("long"), temperature).alias(
            "w"
        ),
    )
    total = w.agg(F.sum("w").cast("bigint").alias("_total_w"))
    return (
        w.join(F.broadcast(total))
        .select(
            domain_col,
            tokens_col,
            "w",
            F.expr("(1000000 * w) div _total_w").alias("share_ppm"),
        )
    )
