"""Unit tests for the round-5 integrity/monitoring operators: content
checksums (replica validation) and TVD drift. Oracle parity pins the
real-data cross-engine agreement; these pin detection semantics on
hand-built fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from asterlake.operators.integrity import table_checksum, tvd_drift


def _sums(df):
    r = df.collect()[0]
    return (r.n_rows, r.xor_sig, r.sum_sig)


def test_checksum_partitioning_and_order_invariant(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    a = _sums(table_checksum(df))
    b = _sums(table_checksum(df.repartition(13).sortWithinPartitions("v")))
    assert a == b


def test_checksum_detects_changed_dropped_duplicated_rows(spark):
    base = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    ref = _sums(table_checksum(base))

    changed = base.withColumn(
        "v", F.when(F.col("k") == 42, F.lit(99)).otherwise(F.col("v"))
    )
    assert _sums(table_checksum(changed)) != ref

    dropped = base.filter(F.col("k") != 42)
    assert _sums(table_checksum(dropped)) != ref

    # duplicating one row PAIR-wise: XOR alone is blind (x ^ x = 0 for
    # the two extra copies), the modular sum catches it
    dup2 = base.union(base.filter(F.col("k") == 42)).union(
        base.filter(F.col("k") == 42)
    )
    n, xor_sig, sum_sig = _sums(table_checksum(dup2))
    assert n == 102
    assert xor_sig == ref[1]  # the XOR blind spot, by construction
    assert sum_sig != ref[2]  # the sum closes it


def test_checksum_distinguishes_null_from_empty_string(spark):
    a = spark.createDataFrame([(1, None), (2, "")], "k int, s string")
    b = spark.createDataFrame([(1, ""), (2, None)], "k int, s string")
    assert _sums(table_checksum(a)) != _sums(table_checksum(b))


def test_checksum_per_group_manifest(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "k int, g string"
    )
    rows = {r.g: r.n_rows for r in table_checksum(df, group_cols=["g"]).collect()}
    assert rows == {"a": 2, "b": 1}


def test_tvd_identical_and_disjoint(spark):
    ref = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 1, "t string"
    )
    same = tvd_drift(ref, ref, "t").collect()
    assert all(r.tvd == 0.0 and r.drift_num == 0 for r in same)

    other = spark.createDataFrame([("c",)] * 4, "t string")
    rows = tvd_drift(ref, other, "t").collect()
    assert {r.t for r in rows} == {"a", "b", "c"}
    assert all(r.tvd == 1.0 for r in rows)


def test_tvd_matches_hand_computation(spark):
    # ref: a=3 b=1 (n=4); cur: a=1 b=1 c=2 (n=4)
    ref = spark.createDataFrame([("a",)] * 3 + [("b",)], "t string")
    cur = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("c",)], "t string"
    )
    rows = {r.t: r for r in tvd_drift(ref, cur, "t").collect()}
    # |cur*4 - ref*4|: a -> |4-12|=8, b -> |4-4|=0, c -> |8-0|=8
    assert rows["a"].drift_num == 8
    assert rows["b"].drift_num == 0
    assert rows["c"].drift_num == 8
    # tvd = 16 / (2*4*4) = 0.5 == (|3/4-1/4| + 0 + |0-2/4|) / 2
    assert all(r.tvd == 0.5 for r in rows.values())
    assert rows["c"].ref_n == 0 and rows["c"].cur_n == 2


def test_combine_checksums_is_union_homomorphic(spark):
    """Per-batch manifests fold to the whole-table checksum without a
    rescan: checksum(A union B union C) == combine(ck(A), ck(B), ck(C))."""
    from pyspark.sql import functions as F

    from asterlake.operators.integrity import combine_checksums

    parts = [
        spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("v")
        )
        for lo, hi in [(0, 300), (300, 700), (700, 1000)]
    ]
    whole = table_checksum(parts[0].union(parts[1]).union(parts[2]))
    folded = combine_checksums(
        *[table_checksum(p).collect()[0].asDict() for p in parts]
    )
    assert whole.collect()[0].asDict() == folded


def test_numeric_drift_reference_bins_and_clamping(spark):
    from pyspark.sql import functions as F

    from asterlake.operators.integrity import numeric_drift

    # reference spans [0, 16): bin i gets value i exactly (16 bins)
    ref = spark.range(0, 16).select(F.col("id").cast("double").alias("v"))
    # identical distribution -> zero drift
    same = numeric_drift(ref, ref, "v", n_bins=16).collect()
    assert all(r.tvd == 0.0 for r in same)

    # current values far outside the reference range clamp to the edge
    # bins instead of disappearing
    cur = spark.createDataFrame([(-100.0,), (1e9,)], "v double")
    rows = {r.bin: r for r in numeric_drift(ref, cur, "v", n_bins=16).collect()}
    assert rows[0].cur_n == 1 and rows[15].cur_n == 1
    assert all(r.n_cur == 2 for r in rows.values())

    # degenerate reference (min == max): everything lands in bin 0
    flat = spark.createDataFrame([(5.0,)] * 4, "v double")
    rows = numeric_drift(flat, cur, "v", n_bins=16).collect()
    assert {r.bin for r in rows} == {0}


def test_row_signature_field_boundaries_unambiguous(spark):
    """The length-prefixed canonical encoding keeps rows distinct when a
    separator-ish character sits inside a value: ('a|b','c') must not
    checksum identically to ('a','b|c'), and a literal NUL string must
    not collide with NULL (ADVICE r5)."""
    a = spark.createDataFrame([("a|b", "c")], "x string, y string")
    b = spark.createDataFrame([("a", "b|c")], "x string, y string")
    assert _sums(table_checksum(a)) != _sums(table_checksum(b))
    nul = spark.createDataFrame([("\x00",)], "x string")
    null = spark.createDataFrame([(None,)], "x string")
    assert _sums(table_checksum(nul)) != _sums(table_checksum(null))
