"""Loaders for the driver's TPC-H-ish testdata (TESTDATA.md / FIXTURES.md B).

One quirk: ``events.parquet`` has shipped ``ts`` under different physical
encodings across driver versions — parquet TIMESTAMP(NANOS) (which Spark 4
only reads as a long under the legacy ``nanosAsLong`` conf) and plain
TIMESTAMP(MICROS) without timezone (read as TIMESTAMP_NTZ). The loader
never assumes one: it branches on the type Spark actually observed.

* ``LongType`` — nanos-as-long: rebuild a microsecond timestamp with
  integer ``div 1000`` — floor semantics, matching DuckDB's
  CAST(TIMESTAMP_NS AS TIMESTAMP) truncation exactly (verified:
  /1000.0 + cast ROUNDS and diverges from the oracle by 1µs).
* ``TimestampNTZType`` — cast to session-local TIMESTAMP so downstream
  window/session/as-of logic sees one type regardless of encoding (the
  session runs UTC, so the cast is a relabel, not a shift).
* ``TimestampType`` — already what we want; passthrough.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-zoned TIMESTAMP whatever the
    physical parquet encoding was (see module docstring). Branches on the
    type Spark *observed*, never on an assumed encoding — works for batch
    and streaming DataFrames alike."""
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def events_read_schema(spark: SparkSession, sf_dir: str):
    """The schema Spark observes for a batch read of ``events.parquet`` —
    pass this to ``readStream.schema(...)`` (file streams require an
    explicit schema) so streaming reads see the same physical encoding the
    batch path does, then normalize with :func:`normalize_events_ts`."""
    ensure_parquet_nanos_conf(spark)
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema


# Table-handle cache (r15, r14 verdict ask #9 "batch the per-query
# load_table py4j chatter"): every `spark.read.parquet` call pays
# reader construction, file-listing and footer/schema resolution over
# py4j — identical work for the same (session, sf_dir, table) triple,
# repeated ~1000x across a 212-query bench session. The cache holds the
# LAZY DataFrame handle (a plan, never data): every action still
# computes from the parquet inputs, nothing is persisted, and a
# restarted SparkContext misses the key (applicationId). This is the
# standard production shape — tables are registered once per session,
# not re-resolved per query.
_HANDLE_CACHE: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _HANDLE_CACHE.get(key)
    if df is None:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if name == "events":
            ensure_parquet_nanos_conf(spark)
            df = normalize_events_ts(spark.read.parquet(path))
        else:
            df = spark.read.parquet(path)
        _HANDLE_CACHE[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names=TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


def fan_out_small_scan(df: DataFrame) -> DataFrame:
    """Spread a SMALL scan across the box for CPU-heavy row-local work.

    Parquet scans cannot split below row-group granularity, so a
    single-row-group file (every bench table; any small reference input
    in production) is ONE task no matter ``maxPartitionBytes`` — and an
    expensive row-local projection over it (literal-map LM scoring,
    n-gram clip folds, PII regex batteries, codebook argmax) runs on one
    core while the rest idle. One round-robin exchange of the small
    input buys full-width parallelism (r14, guide §2.5 input skew;
    measured at sf0.1: quality ensemble 3.56 -> 1.30 s, n-gram overlap
    2.59 -> 1.08 s, results bit-identical — row placement cannot change
    row-local results).

    Scale-honest by construction: a NO-OP whenever the plan already
    carries at least the session's parallelism (at 100 TB every fact
    scan has thousands of splits — this never reshuffles a big table;
    opt-in, applied only at CPU-bound projection sites). Keyless
    repartition is retry-safe: Spark sorts before round-robin
    (``spark.sql.execution.sortBeforeRepartition``, default on) — and
    because the determinism argument DEPENDS on that conf (r14 ADVICE),
    the helper verifies it and returns the input unchanged when a
    deployment has disabled it, rather than assume silently."""
    spark = df.sparkSession
    if (
        str(
            spark.conf.get("spark.sql.execution.sortBeforeRepartition", "true")
        ).lower()
        != "true"
    ):
        return df
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= cores:
        return df
    return df.repartition(cores)
