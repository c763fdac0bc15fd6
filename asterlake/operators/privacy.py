"""Privacy audit operators: k-anonymity over quasi-identifier classes
(Sweeney, IJUFKS 2002) and the suppression release that enforces it.

A training-data/lakehouse release pipeline needs more than redaction
(textstats.redact_terms) and forget-cascades (lifecycle): before a table
leaves the boundary, every combination of quasi-identifiers — attributes
that are individually harmless but jointly identifying (nation x segment x
balance bracket) — must be shared by at least k records, or the small
classes suppressed. These operators are that audit and that release.

Scale: one map-side-combinable groupBy over the quasi-identifier key per
audit; the release is the same aggregate + a semi-join of the source
against the passing classes — no window over the class key (hot classes
are exactly the ones k-anonymity likes, and they stay map-side-combined).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "k_anonymity_report",
    "k_anonymous_release",
    "l_diversity_report",
]


def _class_counts(df: DataFrame, quasi: list[str]) -> DataFrame:
    return df.groupBy(*quasi).agg(
        F.count("*").cast("bigint").alias("k")
    )


def k_anonymity_report(
    df: DataFrame, quasi: list[str], k: int
) -> DataFrame:
    """One row per quasi-identifier equivalence class: its size ``k``
    and whether it violates the threshold (size < k). The audit a
    release gate reads. ``quasi`` are column names — derive bracketed
    quasi-identifiers (balance buckets, age bands) with withColumn
    first, so the audit and the release see the identical key."""
    return _class_counts(df, quasi).withColumn(
        "violates", F.col("k") < F.lit(k)
    )


def k_anonymous_release(
    df: DataFrame, quasi: list[str], k: int
) -> DataFrame:
    """The k-anonymized release: rows whose quasi-identifier class has
    at least ``k`` members; smaller classes are suppressed entirely
    (the conservative cell-suppression baseline — generalization
    hierarchies are a caller-side refinement). Aggregate + left-semi
    join on the class key; the source table is scanned twice, never
    windowed on the class key.

    The join keys are NULL-SAFE (``<=>``): groupBy treats NULL as a
    class value, so the audit counts a NULL-valued class and may report
    it non-violating — the release must keep it by the same class
    semantics (r11 ADVICE: the plain semi-join suppressed every row
    with a NULL quasi value regardless of class size, silently
    disagreeing with the audit). ``<=>`` keeps the key an equi-join
    condition, so this still plans as a hash semi-join, never a
    cartesian."""
    passing = (
        _class_counts(df, quasi)
        .filter(F.col("k") >= F.lit(k))
        .select(*quasi)
        .alias("_ok")
    )
    src = df.alias("_src")
    cond = None
    for c in quasi:
        clause = F.col(f"_src.{c}").eqNullSafe(F.col(f"_ok.{c}"))
        cond = clause if cond is None else cond & clause
    return src.join(passing, cond, "left_semi")


def l_diversity_report(
    df: DataFrame, quasi: list[str], sensitive: str, l_threshold: int
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., ICDE 2006): a class
    can be k-anonymous yet leak its members' sensitive attribute when
    every member shares one value — this reports, per quasi-identifier
    class, the class size ``k``, the number of DISTINCT sensitive
    values ``l_div``, and whether it violates the threshold. Same
    single map-side-combinable groupBy as the k-anonymity audit."""
    return df.groupBy(*quasi).agg(
        F.count("*").cast("bigint").alias("k"),
        F.countDistinct(sensitive).cast("bigint").alias("l_div"),
    ).withColumn("violates", F.col("l_div") < F.lit(l_threshold))
