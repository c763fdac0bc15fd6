"""Loaders for the driver's TPC-H-ish testdata (TESTDATA.md / FIXTURES.md B).

One quirk: ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS),
which Spark 4 refuses to read (PARQUET_TYPE_ILLEGAL). Sessions from
``build_session`` carry the legacy ``nanosAsLong`` read conf from the
builder; for externally-owned sessions (the correctness driver's) the
loader calls the idempotent ``ensure_parquet_nanos_conf`` shim — it never
mutates an already-configured session. The long nanos rebuild to a
microsecond timestamp uses integer ``div 1000`` — floor semantics, matching
DuckDB's CAST(TIMESTAMP_NS AS TIMESTAMP) truncation exactly (verified:
/1000.0 + cast ROUNDS and diverges from the oracle by 1µs).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asterlake.session import ensure_parquet_nanos_conf

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        ensure_parquet_nanos_conf(spark)
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names=TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
