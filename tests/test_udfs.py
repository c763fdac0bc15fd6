"""Python extension surface: the UDF results must equal their built-in
twins (the production paths) — the UDFs exist to pin the API shapes, not
to compute something built-ins can't."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from asterlake.functions.udfs import (
    split_sentences,
    user_time_deltas,
    vector_norm,
)
from asterlake.tables import load_table


def test_pandas_udf_norm_equals_builtin_fold(spark, sf_dir):
    from asterlake.operators.similarity import dot_double

    e = load_table(spark, sf_dir, "embeddings")
    got = e.select("vec_id", vector_norm("embedding").alias("norm"))
    want = e.select(
        "vec_id",
        F.sqrt(dot_double(F.col("embedding"), F.col("embedding"))).alias(
            "norm"
        ),
    )
    # bit-identical, not approximately equal: both are sequential folds
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_grouped_map_equals_window_twin(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = user_time_deltas(ev)
    w = Window.partitionBy("user_id")
    want = ev.select(
        "user_id",
        "event_id",
        (F.unix_micros("ts") - F.min(F.unix_micros("ts")).over(w)).alias(
            "us_since_first"
        ),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_udtf_sentences_ordinality(spark):
    df = spark.createDataFrame(
        [(1, "a b. c d.  . e"), (2, None), (3, "")],
        ["doc_id", "text"],
    )
    rows = {
        (r.doc_id, r.sent_idx, r.sentence)
        for r in split_sentences(df).collect()
    }
    assert rows == {(1, 0, "a b"), (1, 1, "c d"), (1, 2, "e")}


def test_iqr_agg_matches_builtin_and_ignores_partition_order(spark):
    """Grouped-agg pandas UDAF: equals the built-in percentile IQR
    bit-for-bit, under any input partitioning (the UDF sorts its group)."""
    import struct

    from pyspark.sql import functions as F

    from asterlake.functions.udfs import iqr_agg

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    want = {
        r.l_returnflag: r.iqr
        for r in li.groupBy("l_returnflag")
        .agg(
            (
                F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.75)")
                - F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.25)")
            ).alias("iqr")
        )
        .collect()
    }
    for reshuffled in (li, li.repartition(13, "l_orderkey")):
        got = {
            r.l_returnflag: r.iqr
            for r in reshuffled.groupBy("l_returnflag")
            .agg(iqr_agg(F.col("l_extendedprice").cast("double")).alias("iqr"))
            .collect()
        }
        assert got.keys() == want.keys()
        for k in want:
            assert struct.pack("d", got[k]) == struct.pack("d", want[k])
