"""Batch CDC application: fold a change-data-capture log into a snapshot.

The streaming side of this engine has an idempotent merge sink
(streaming/pipeline.py merge_dimension); this is its batch complement —
the lakehouse "apply changes" primitive: given a base snapshot and a
changelog of (key, op, sequence, payload) rows where op is
insert/update/delete, produce the post-log snapshot.

Semantics: per key, the highest-sequence row wins (base rows rank below
every change); a winning delete removes the key. Ties on sequence within
the changelog resolve by op precedence (D > U > I) so a same-sequence
delete+insert converges deterministically.

Scale: one shuffle — the per-key window on (rank, seq). No join: base and
changes UNION into one keyed stream, so applying a 1%-churn changelog to
a 100 TB base never shuffles the base twice. The window frame holds one
row at a time (row_number), no buffering.
"""

from __future__ import annotations

from collections.abc import Sequence as Seq

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Seq[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply ``changes`` (op in 'I'/'U'/'D', ordered by ``seq_col``) to
    ``base``; returns the resulting snapshot with base's columns.

    ``changes`` must carry every base column plus ``op_col`` (delete rows
    may carry arbitrary payload values — they only need the keys) and
    ``seq_col``.

    Determinism contract: ``(key_cols, seq_col, op_col)`` must be UNIQUE
    in the changelog. Ties break on (_rank, _seq, op-precedence D>U>I)
    only — two changelog rows with identical key, seq, AND op but
    different payloads would get an arbitrary row_number winner. Every
    real CDC feed (Debezium, DMS, binlog) satisfies this: seq is an
    LSN/offset, unique per (key, op). Violations are a producer bug;
    enforce upstream with a dedup on (keys, seq, op) if the feed can
    replay.
    """
    data_cols = [c for c in base.columns]
    tagged_base = base.select(
        *data_cols,
        F.lit(0).alias("_rank"),
        F.lit(None).cast(changes.schema[seq_col].dataType).alias("_seq"),
        F.lit("I").alias("_op"),
    )
    tagged_changes = changes.select(
        *data_cols,
        F.lit(1).alias("_rank"),
        F.col(seq_col).alias("_seq"),
        F.col(op_col).alias("_op"),
    )
    # op precedence on equal (_rank, _seq): D beats U beats I
    op_prio = F.when(F.col("_op") == "D", 2).when(F.col("_op") == "U", 1).otherwise(0)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_rank").desc(), F.col("_seq").desc_nulls_last(), op_prio.desc()
    )
    return (
        tagged_base.unionByName(tagged_changes)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("_op") != "D"))
        .select(*data_cols)
    )
