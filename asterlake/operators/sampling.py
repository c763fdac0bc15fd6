"""Deterministic sampling operators (training-data pipeline staple).

``df.sample()`` is seed-dependent *per partitioning*: the same seed gives a
different row set when the file splits change, which breaks reproducible
dataset cards and cross-engine audits. These samplers key selection on a
cryptographic hash of the ROW's own key instead — membership is a pure
function of the data, so any engine (and any partitioning, any cluster
size) selects the identical sample. That also makes the sample an
equi-joinable subset: downstream stages can re-derive membership instead
of shipping row lists.

Hash contract (shared with the DuckDB oracles): first 8 hex chars of
``md5(cast(key as string))`` read as a base-16 integer, i.e. a uniform
32-bit value; ``pmod(value, 100)`` buckets rows into percent slots. The
oracle reproduces this exactly (md5 is bit-stable everywhere; the hex fold
is the same trick the MinHash oracle uses).

Scale: selection is a pure projection + filter (no shuffle, no RNG state);
stratified sampling adds nothing on top — the strata are just whatever
the filter keeps, with per-stratum rates coming from a broadcastable map
expression. Filter pushdown survives (the hash predicate evaluates after
the scan, but partition/column pruning is unaffected).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic uniform bucket in [0, buckets) from a row key."""
    h8 = F.conv(F.substring(F.md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
    return F.pmod(h8.cast("long"), F.lit(buckets)).cast("int")


def deterministic_sample(
    df: DataFrame, key: str, percent: int, buckets: int = 100
) -> DataFrame:
    """Keep ~percent% of rows, chosen by the row key's hash bucket."""
    return df.filter(hash_bucket(F.col(key), buckets) < percent)


def stratified_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    rates: dict[str, int],
    default_percent: int = 0,
    buckets: int = 100,
) -> DataFrame:
    """Per-stratum sampling rates (percent per stratum value).

    ``rates`` maps stratum value -> percent kept; strata not listed keep
    ``default_percent``. The rate lookup compiles to a CASE expression —
    no join, no shuffle."""
    rate: Column = F.lit(default_percent)
    for value, pct in sorted(rates.items()):
        rate = F.when(F.col(stratum) == value, F.lit(pct)).otherwise(rate)
    return df.filter(hash_bucket(F.col(key), buckets) < rate)


def duck_hash_bucket_sql(key_expr: str, buckets: int = 100) -> str:
    """DuckDB twin of :func:`hash_bucket` for oracle construction."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(range(1, 9), i -> "
        f"CAST(strpos('0123456789abcdef', substr(md5(CAST({key_expr} AS VARCHAR)), i, 1)) - 1 "
        "AS BIGINT))), "
        f"(acc, c) -> acc * 16 + c) % {buckets}"
    )


def train_val_test_split(
    df: DataFrame,
    key: str,
    val_percent: int = 10,
    test_percent: int = 10,
    buckets: int = 100,
) -> DataFrame:
    """Label every row 'train' / 'val' / 'test' by its key's hash bucket.

    The split is a pure projection (no shuffle, no RNG state) and a pure
    function of the key — re-running on any engine, partitioning, or
    subset reproduces the identical assignment, and a row can never
    migrate between splits when the corpus grows (the property that
    prevents silent test-set leakage across dataset versions).
    """
    b = hash_bucket(F.col(key), buckets)
    return df.withColumn(
        "split",
        F.when(b < test_percent, F.lit("test"))
        .when(b < test_percent + val_percent, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def quota_sample(
    df: DataFrame,
    group_col: str,
    key: str,
    quota: int,
    order_buckets: int = 1_000_000_007,
) -> DataFrame:
    """Keep at most ``quota`` rows per group, chosen in deterministic
    hash order (domain/language caps in corpus curation).

    Row priority inside a group is ``(hash_bucket(key, large_prime),
    key)`` — hash order approximates a uniform random draw yet is a pure
    function of the data, and the key tiebreak makes row_number total.
    One shuffle keyed on the group column; a pathologically hot group is
    exactly the case the quota exists to cut, and AQE splits its sort."""
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(key), order_buckets), F.col(key)
    )
    return (
        df.withColumn("_qrank", F.row_number().over(w))
        .filter(F.col("_qrank") <= quota)
        .drop("_qrank")
    )


def weighted_sample(
    df: DataFrame,
    key: str,
    weight: Column,
    scale: int = 1_000_000,
) -> DataFrame:
    """Bernoulli sampling with per-row keep probability ``weight / scale``
    (weights above ``scale`` always keep) — the soft-dedup / quality
    reweighting move (RefinedWeb-style): instead of a hard drop, each
    document survives with probability proportional to its integer
    weight.

    Exactness contract: membership is ``hash_bucket(key, scale) <
    weight`` — pure integer comparison over the md5-derived bucket, so
    any engine, partitioning, or subset draws the identical sample (no
    RNG state, no transcendental priority functions whose libm rounding
    differs across engines). ``weight`` must be an integer column on the
    same scale as ``scale``. A zero-shuffle projection+filter.
    """
    return df.filter(hash_bucket(F.col(key), scale) < weight)
