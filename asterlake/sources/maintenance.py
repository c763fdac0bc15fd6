"""Lakehouse table maintenance: small-file compaction and skipping stats.

Reference parity note: the reference pipeline rewrites its partitions
wholesale each day (silver_to_gold.py overwrite), so it never accumulates
small files; a continuously-ingesting lakehouse does, and every serious
table format ships a compaction pass (Delta OPTIMIZE, Iceberg
rewrite_data_files). These helpers are the Spark-native equivalents for
plain parquet directories.

Scale shape:

- ``compact_parquet_dir`` sizes the rewrite from the *observed* bytes on
  disk (`ceil(total_bytes / target_bytes)` output files) and uses
  ``repartition`` (round-robin) — not ``coalesce`` — so output files are
  even-sized regardless of input skew; with ``sort_by`` it upgrades to
  ``repartitionByRange`` + in-partition sort so output files cover
  disjoint key ranges (tight min/max stats). Write-then-swap keeps
  readers consistent: the new files land in a sibling temp dir and replace
  the old directory only after the job commits.
- ``file_skipping_stats`` is the min/max manifest a pruning scan needs:
  one pass, grouped on ``input_file_name()`` — per-file state is one
  (min, max) pair per column, never row-sized. Feeding it a column you
  z-ordered on (operators/layout.py) shows each file covering a narrow
  value rectangle — the before/after evidence for skipping effectiveness.
"""

from __future__ import annotations

import math
import shutil
import uuid
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parquet_dir_bytes(path: str) -> int:
    return sum(
        p.stat().st_size for p in Path(path).rglob("*.parquet") if p.is_file()
    )


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: Sequence[str] = (),
) -> int:
    """Rewrite a parquet directory into ~target-sized files; returns the
    output file count. Optional ``sort_by`` re-sorts within each output
    file so min/max stats stay tight after compaction."""
    total = parquet_dir_bytes(path)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if sort_by:
        # range-partition + in-partition sort = a global sort whose output
        # files cover DISJOINT key ranges — min/max stats then prune a
        # point lookup down to one file
        out = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        out = df.repartition(n_files)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return len(list(Path(path).rglob("*.parquet")))


def file_skipping_stats(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """Per-file (n_rows, min, max) manifest for the given columns — what a
    data-skipping scan prunes with. One aggregation keyed on the file name."""
    df = spark.read.parquet(path)
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return (
        df.withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(*aggs)
        .withColumnRenamed("_file", "file")
    )
