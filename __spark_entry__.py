"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``asterlake.queries`` — the engine's declared query inventory
(one entry per implemented operator family from SURVEY.md §2, each with a
DuckDB-runnable oracle). See that module for the hash-match discipline
(decimal-exact aggregation, identical aliases, timestamp truncation).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: star-join revenue rollup by region/nation."""
    from asterlake.queries import QUERIES

    return QUERIES["flagship_revenue_by_nation"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from asterlake.queries import QUERIES

    return {name: qd.spark for name, qd in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from asterlake.queries import QUERIES

    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle is not None}
