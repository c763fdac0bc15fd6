"""Data-quality expectations: declarative row rules with quarantine split.

The DLT/Great-Expectations-style gate a production lakehouse pipeline puts
in front of every silver write: each expectation is a named boolean Column;
rows failing ANY rule route to a quarantine output carrying the list of
violated rules, and per-rule pass/fail tallies feed the run's quality
report. The reference pipeline has no validation layer at all
(`/root/reference/src/bronze_to_silver.py` casts tolerantly and moves on) —
this is the beyond-parity operator that makes its tolerant casts auditable.

Scale shape: rule evaluation is a pure row-local projection (codegen'd
boolean expressions, no Python); the stats aggregate explodes one small
struct per (row, rule) and partial-aggregates map-side, so the single
shuffle carries exactly ``n_rules`` rows per map task, not the fact table.
Quarantine/pass splits are two filters over the SAME annotated plan — with
the annotated frame persisted by the caller they share one scan.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F

VIOLATIONS_COL = "_violations"


def with_expectations(
    df: DataFrame, rules: Mapping[str, Column]
) -> DataFrame:
    """Annotate every row with the (possibly empty, sorted) array of rule
    names it violates. NULL rule results count as violations — an
    expectation that cannot be evaluated on a row has not been met."""
    if not rules:
        raise ValueError("with_expectations needs at least one rule")
    flags = [
        F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
        for name, cond in sorted(rules.items())
    ]
    violated = F.array_compact(F.array(*flags))
    return df.withColumn(VIOLATIONS_COL, violated)


def expectation_stats(
    df: DataFrame, rules: Mapping[str, Column]
) -> DataFrame:
    """One row per rule: ``rule | n_pass | n_fail`` over the whole frame.

    Single pass: each input row contributes one boolean per rule through
    an inline explode, and the (rule, passed) counts partial-aggregate
    before the one rule-keyed shuffle (n_rules distinct keys)."""
    if not rules:
        raise ValueError("expectation_stats needs at least one rule")
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.coalesce(cond, F.lit(False)).alias("passed"),
            )
            for name, cond in sorted(rules.items())
        ]
    )
    ex = df.select(F.explode(pairs).alias("p")).select("p.rule", "p.passed")
    return ex.groupBy("rule").agg(
        F.sum(F.when(F.col("passed"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass"),
        F.sum(F.when(F.col("passed"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_fail"),
    )


def quarantine_split(
    df: DataFrame, rules: Mapping[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): rows meeting every expectation vs rows
    violating at least one — the quarantined side keeps the violation
    list for triage. Persist the annotated parent to share one scan when
    writing both sides."""
    annotated = with_expectations(df, rules)
    clean = annotated.filter(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    bad = annotated.filter(F.size(VIOLATIONS_COL) > 0)
    return clean, bad


def observed(
    df: DataFrame, metrics: Mapping[str, Column]
) -> "tuple[DataFrame, object]":
    """Attach single-pass telemetry to a plan via Spark's Observation API:
    the returned frame computes ``metrics`` (accumulator-backed aggregate
    expressions) DURING whatever action the caller runs — no second scan,
    no separate job — and the returned observation yields them afterward
    via ``.get``. This is how a production write reports row counts /
    null rates / domain totals without re-reading what it just wrote;
    pair with :func:`expectation_stats` when the tallies must be a
    queryable DataFrame instead.
    """
    from pyspark.sql import Observation

    if not metrics:
        raise ValueError("observed needs at least one metric")
    obs = Observation()
    named = [col.alias(name) for name, col in sorted(metrics.items())]
    return df.observe(obs, *named), obs
