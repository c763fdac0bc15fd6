"""Compression-ratio signal (operators/compress.py): bit-for-bit
differential against direct Python zlib (the same library the
executors load), partitioning invariance, the deflate worst-case
bound, and empty/null hygiene."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from asterlake.operators.compress import compression_signal, deflate_bound

ROWS = [
    (0, "the cat sat on the mat " * 40),          # repetitive: compresses hard
    (1, "q8#zL!mv9@Xw$2pK^7rT&4uB*6yH(1sJ)"),      # noisy: barely compresses
    (2, ""),                                        # empty
    (3, None),                                      # null text
    (4, "a"),                                       # sub-block tiny
    (5, "abc " * 20000),                            # multi-block (> 16383 B)
]


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def ref_row(t: str | None, level: int = 6) -> tuple[int, int, int]:
    data = ("" if t is None else t).encode("utf-8")
    raw = len(data)
    comp = len(zlib.compress(data, level)) if raw else 0
    return raw, comp, (1000 * comp // raw if raw else 0)


def test_matches_direct_zlib_bit_for_bit(spark):
    got = {
        r["doc_id"]: (r["raw_len"], r["comp_len"], r["ratio_milli"])
        for r in compression_signal(_docs(spark)).collect()
    }
    for doc_id, t in ROWS:
        assert got[doc_id] == ref_row(t), doc_id


def test_partitioning_invariance(spark):
    one = sorted(tuple(r) for r in compression_signal(_docs(spark).coalesce(1)).collect())
    many = sorted(tuple(r) for r in compression_signal(_docs(spark).repartition(7)).collect())
    assert one == many


def test_repetitive_text_compresses_harder_than_noise(spark):
    got = {r["doc_id"]: r["ratio_milli"] for r in compression_signal(_docs(spark)).collect()}
    assert got[0] < 200       # 40x repeated phrase: far under 20%
    assert got[1] > 800       # random-ish symbols: near-incompressible
    assert got[0] < got[1]


def test_deflate_bound_holds_for_every_row(spark):
    sig = compression_signal(_docs(spark))
    checked = sig.select(
        "doc_id",
        ((F.col("comp_len") > 0) | (F.col("raw_len") == 0)).alias("pos"),
        (F.col("comp_len") <= deflate_bound("raw_len")).alias("bounded"),
    )
    for r in checked.collect():
        assert r["pos"] and r["bounded"], r
    # the bound expression itself: 16383 -> 1 block, 16384 -> 2 blocks
    rows = spark.createDataFrame(
        [(16383,), (16384,), (0,), (1,)], "raw_len long"
    ).select(deflate_bound("raw_len").alias("b")).collect()
    assert [r["b"] for r in rows] == [16383 + 5 + 6, 16384 + 10 + 6, 6, 1 + 5 + 6]
