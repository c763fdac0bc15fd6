"""The Python extension surface: scalar pandas_udf, grouped-map
applyInPandas, and table-valued UDTF — each demonstrated as a real,
oracle-gated operator.

The reference has zero UDFs (SURVEY §2.8): its pandas tree is driver-side
Python re-implementing the Spark logic wholesale. The Spark-native
equivalent is *vectorized islands inside the distributed plan*: Arrow
batches cross the JVM<->Python boundary, everything else stays JVM-side.
These are the slow path by design — every operator in `operators/` that
CAN be a built-in expression IS one; this module pins the four API
shapes — scalar pandas_udf, grouped-map applyInPandas, grouped-agg
pandas_udf (UDAF), and @udtf — for the cases that genuinely need Python
(model inference, codecs, custom tokenizers).

Determinism discipline (hash-gated against DuckDB): any float reduction
inside a UDF uses ``np.add.accumulate`` (strict left-to-right, matching
both DuckDB's ``list_sum`` fold and ``F.aggregate``'s) — never ``np.sum``,
whose pairwise summation diverges in the last bits.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


@pandas_udf(DoubleType())
def vector_norm(vecs: pd.Series) -> pd.Series:
    """L2 norm of an array<float> column, one Arrow batch at a time.

    The fold is per-element sequential (``np.add.accumulate``) over
    float64, bit-identical to ``sqrt(F.aggregate(zip_with(v,v,*), ...))``
    and DuckDB's ``sqrt(list_sum(list_transform(...)))``.
    """
    return vecs.map(
        lambda v: float(
            np.sqrt(
                np.add.accumulate(
                    np.asarray(v, dtype=np.float64) ** 2
                )[-1]
            )
        )
        if v is not None and len(v)
        else 0.0
    )


_DELTA_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("us_since_first", LongType()),
    ]
)


def user_time_deltas(events: DataFrame) -> DataFrame:
    """Grouped-map applyInPandas: per-user microseconds since the user's
    first event. Exact integer arithmetic — deterministic on any engine.

    This is the API shape for per-entity Python logic (a per-user model,
    a sessionizer with library dependencies). For THIS computation the
    production path is the built-in window ``ts - min(ts) over (partition
    by user_id)`` — pinned equivalent in tests/test_udfs.py.

    Scale: one shuffle on user_id; each group becomes a single pandas
    frame, so the partition key must bound group size (user activity
    here, never an unbounded key).
    """

    def deltas(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "us_since_first": pdf["ts_us"] - pdf["ts_us"].min(),
            }
        )

    return (
        # epoch-micros as a LONG before the Arrow hop — pandas datetime64
        # unit handling (ns vs us) must never decide the arithmetic
        events.select(
            "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
        )
        .groupBy("user_id")
        .applyInPandas(deltas, _DELTA_SCHEMA)
    )


@udtf(returnType="sent_idx: int, sentence: string")
class SplitSentences:
    """Table-valued function (PySpark 4 UDTF): text -> one row per
    '.'-separated sentence, with ordinality. Runs per input row inside
    the executors — a lateral join, not a driver loop."""

    def eval(self, text: str) -> Iterator[tuple[int, str]]:
        if text is None:
            return
        idx = 0
        for raw in text.split("."):
            s = raw.strip()
            if s:
                yield idx, s
                idx += 1


def split_sentences(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """LATERAL-join the SplitSentences UDTF against a document table."""
    spark = docs.sparkSession
    spark.udtf.register("split_sentences", SplitSentences)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        f"SELECT d.doc_id, s.sent_idx, s.sentence "
        f"FROM _udtf_docs d, LATERAL split_sentences(d.{text_col}) s"
    )


@pandas_udf(DoubleType())
def iqr_agg(values: pd.Series) -> float:
    """GROUPED-AGG pandas UDF (true vectorized UDAF): interquartile range
    of a group, one Arrow batch per group — the fourth API shape next to
    scalar pandas_udf / applyInPandas / @udtf.

    Order-independence: the group's values arrive in arbitrary partition
    order, so the UDF sorts first; the quantile interpolation is the
    weighted form ``(ceil(pos)-pos)*lo + (pos-floor(pos))*hi`` — the
    exact expression Spark's percentile and DuckDB's quantile_cont agree
    on (pinned by operators/stats.py), so the gate hash-matches."""
    a = np.sort(values.to_numpy(dtype=np.float64))
    if len(a) == 0:
        return float("nan")

    def q(p: float) -> float:
        pos = p * (len(a) - 1)
        k = int(np.floor(pos))
        frac = pos - k
        if frac == 0.0:
            return float(a[k])
        return float((k + 1 - pos) * a[k] + (pos - k) * a[k + 1])

    return q(0.75) - q(0.25)
