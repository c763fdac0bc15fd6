"""operators/layout.py (Z-order) and sources/maintenance.py (compaction,
file-skipping stats)."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from asterlake.operators.layout import (
    bucketize,
    interleave_bits,
    zorder_layout,
    zorder_stats,
)
from asterlake.sources.maintenance import (
    compact_parquet_dir,
    file_skipping_stats,
    parquet_dir_bytes,
)


def test_interleave_bits_known_values(spark):
    # x=0b101, y=0b011 -> z bits: x at even positions, y at odd:
    # bit0=x0=1, bit1=y0=1, bit2=x1=0, bit3=y1=1, bit4=x2=1, bit5=y2=0
    # z = 0b011011 = 27
    df = spark.range(1).select(
        interleave_bits(F.lit(5), F.lit(3), 3).alias("z")
    )
    assert df.collect()[0].z == 27


def test_bucketize_spans_full_range(spark):
    df = spark.range(0, 100).select(
        bucketize(F.col("id"), F.lit(0), F.lit(99), 2).alias("b")
    )
    got = {r.b for r in df.collect()}
    assert got == {0, 1, 2, 3}


def test_zorder_stats_rectangles_are_narrow(spark):
    # a 64x64 grid: every z file-bucket must cover a narrow rectangle in
    # BOTH dims — the whole point vs a 1-column sort (x buckets narrow,
    # y buckets full-range)
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    stats = zorder_stats(grid, "x", "y", bits=6, file_bits=4).collect()
    assert len(stats) == 16
    for r in stats:
        assert r.n_rows == 256
        # 16 buckets over a 64x64 grid -> each is a 16x16 rectangle
        assert r.x_max - r.x_min == 15
        assert r.y_max - r.y_min == 15


def test_zorder_layout_sorts_and_preserves_rows(spark):
    grid = spark.range(1000).select(
        (F.col("id") % 50).alias("x"), (F.col("id") % 37).alias("y")
    )
    out = zorder_layout(grid, ["x", "y"], bits=5, n_files=4)
    assert out.columns == ["x", "y"]
    assert out.count() == 1000
    with pytest.raises(ValueError):
        zorder_layout(grid, ["x"], bits=5)


def test_compaction_reduces_files_and_preserves_data(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    df.repartition(40).write.parquet(path)
    before = len(list(Path(path).rglob("*.parquet")))
    assert before == 40
    total = parquet_dir_bytes(path)
    n_after = compact_parquet_dir(spark, path, target_file_bytes=total // 2)
    assert n_after <= 3  # ceil(total/half) = 2 (+rounding slack)
    assert spark.read.parquet(path).count() == 10_000
    assert (
        spark.read.parquet(path).agg(F.sum("id")).collect()[0][0]
        == 10_000 * 9_999 // 2
    )


def test_file_skipping_stats_tight_after_sorted_compaction(spark, tmp_path):
    path = str(tmp_path / "t2")
    # write value-interleaved files: every file spans the full id range,
    # so min/max stats prune nothing
    spark.range(8_000).repartition(8).write.parquet(path)
    loose = file_skipping_stats(spark, path, ["id"]).collect()
    assert all(r.id_max - r.id_min > 4_000 for r in loose)
    # compact with a sort -> each file covers a disjoint narrow range
    compact_parquet_dir(
        spark, path, target_file_bytes=parquet_dir_bytes(path) // 4,
        sort_by=["id"],
    )
    tight = file_skipping_stats(spark, path, ["id"]).collect()
    assert sum(r.n_rows for r in tight) == 8_000
    spans = sorted((r.id_min, r.id_max) for r in tight)
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo  # disjoint ranges -> a point lookup reads ONE file


def test_multi_column_interleave_and_layout(spark):
    from asterlake.operators.layout import interleave_bits_multi

    # 3 cols, 2 bits each: x=0b11, y=0b00, z=0b01 ->
    # bit0: x0=1@0, y0=0@1, z0=1@2 ; bit1: x1=1@3, y1=0@4, z1=0@5
    # value = 0b001101 = 13
    got = (
        spark.range(1)
        .select(
            interleave_bits_multi([F.lit(3), F.lit(0), F.lit(1)], 2).alias("z")
        )
        .collect()[0]
        .z
    )
    assert got == 13
    with pytest.raises(ValueError):
        interleave_bits_multi([F.lit(1)] * 8, 8)  # 64 bits: too wide

    cube = spark.range(4096).select(
        (F.col("id") % 16).alias("x"),
        ((F.col("id") / 16).cast("long") % 16).alias("y"),
        (F.col("id") / 256).cast("long").alias("z"),
    )
    out = zorder_layout(cube, ["x", "y", "z"], bits=4, n_files=8)
    assert out.columns == ["x", "y", "z"]
    assert out.count() == 4096
    with pytest.raises(ValueError):
        zorder_layout(cube, ["x"], bits=4)


def test_range_bucket_stats_equidepth_and_disjoint(spark):
    from asterlake.operators.layout import range_bucket_stats

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    total = li.count()
    rows = sorted(
        range_bucket_stats(li, "l_extendedprice", n_buckets=8).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.bucket for r in rows] == list(range(8))
    assert sum(r.n_rows for r in rows) == total
    # buckets cover disjoint, ordered value ranges
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo
    # equi-depth within the tolerance tied values allow
    for r in rows:
        assert r.n_rows >= total // 8 - total // 20
        assert r.n_rows <= total // 8 + total // 20


def test_range_bucket_stats_with_prebuilt_counts_is_identical(spark):
    """The memoized-counts routing (r7: shared _global_price_counts) must
    be a pure physical substitution — bit-identical manifest rows to the
    internal global path."""
    from pyspark.sql import functions as F

    from asterlake.operators.layout import range_bucket_stats
    from asterlake.operators.stats import distinct_value_counts

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    counts = distinct_value_counts(
        li.select("l_extendedprice").withColumn("_g", F.lit(0)),
        ["_g"],
        "l_extendedprice",
    )
    try:
        plain = sorted(
            range_bucket_stats(li, "l_extendedprice", n_buckets=8).collect()
        )
        routed = sorted(
            range_bucket_stats(
                li, "l_extendedprice", n_buckets=8, counts=counts
            ).collect()
        )
        assert plain == routed
    finally:
        counts.unpersist()
