"""Corpus-composition operators (operators/mixture.py): deterministic
per-domain caps, exact token budgets, overflow-safe mixture factors,
and the RNG-free materialization replayed in pure Python."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asterlake.operators.mixture import (
    FRAC_P,
    PPM,
    apply_mixture,
    domain_caps,
    mixture_weights,
    token_budget,
)

ROWS = [
    # (doc_id, source, text)
    (0, "a", "x y z"),
    (1, "a", "x y"),
    (2, "a", "x"),
    (3, "a", "x y z w"),
    (4, "b", "p q"),
    (5, "b", "p"),
    (6, "c", "lone doc with many tokens here"),
    (7, "a", ""),
    (8, "b", "   "),
]


def _docs(spark):
    return spark.createDataFrame(
        ROWS, "doc_id bigint, source string, text string"
    )


def test_domain_caps_keeps_lowest_ids(spark):
    d = _docs(spark)
    got = {
        (r["source"], r["doc_id"])
        for r in domain_caps(d, cap=2, order_col="doc_id").collect()
    }
    assert got == {("a", 0), ("a", 1), ("b", 4), ("b", 5), ("c", 6)}


def test_domain_caps_cap_larger_than_domain_is_identity(spark):
    d = _docs(spark)
    assert domain_caps(d, cap=100).count() == len(ROWS)
    # schema unchanged: the rank column never leaks
    assert domain_caps(d, cap=1).columns == d.columns


def test_token_budget_exact_counts(spark):
    d = _docs(spark)
    got = {
        r["domain"]: (r["n_docs"], r["n_tokens"])
        for r in token_budget(d).collect()
    }
    assert got == {"a": (5, 10), "b": (3, 3), "c": (1, 6)}


def test_mixture_weights_exact_integer_floor(spark):
    d = _docs(spark)
    b = token_budget(d)
    w = mixture_weights(b, {"a": 500_000, "c": 300_000}, default_ppm=200_000)
    got = {
        r["domain"]: (r["share_ppm"], r["factor_ppm"])
        for r in w.collect()
    }
    total = 19  # 10 + 3 + 6
    assert got["a"] == (500_000, 500_000 * total // 10)
    assert got["b"] == (200_000, 200_000 * total // 3)
    assert got["c"] == (300_000, 300_000 * total // 6)


def test_mixture_weights_survives_100tb_magnitudes(spark):
    # 1e13 tokens/domain: share_ppm * total overflows BIGINT; the
    # DECIMAL(38,0) route must return the exact floor, not a wrap
    b = spark.createDataFrame(
        [("big", 10**9, 10**13), ("small", 10**6, 10**10)],
        "domain string, n_docs bigint, n_tokens bigint",
    )
    w = mixture_weights(b, {"big": 900_000}, default_ppm=100_000)
    got = {r["domain"]: r["factor_ppm"] for r in w.collect()}
    total = 10**13 + 10**10
    assert got["big"] == 900_000 * total // 10**13
    assert got["small"] == 100_000 * total // 10**10


def _ref_copies(doc_id: int, factor_ppm: int) -> int:
    whole, frac = divmod(factor_ppm, PPM)
    return whole + (1 if (doc_id * FRAC_P) % PPM < frac else 0)


@pytest.mark.parametrize("factor_a", [0, 1, 250_000, 1_000_000, 2_750_000])
def test_apply_mixture_replays_in_pure_python(spark, factor_a):
    d = _docs(spark)
    w = spark.createDataFrame(
        [("a", factor_a), ("b", 1_500_000), ("c", 0)],
        "domain string, factor_ppm bigint",
    )
    out = apply_mixture(d, w).collect()
    by_doc: dict[int, int] = {}
    for r in out:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + 1
    factors = {"a": factor_a, "b": 1_500_000, "c": 0}
    for doc_id, src, _ in ROWS:
        want = _ref_copies(doc_id, factors[src])
        assert by_doc.get(doc_id, 0) == want, (doc_id, src)
    # copy_id is dense 0..n-1 per doc
    for r in out:
        assert 0 <= r["copy_id"] < _ref_copies(
            r["doc_id"], factors[r["source"]]
        )


def test_apply_mixture_composes_with_weights(spark):
    d = _docs(spark)
    w = mixture_weights(token_budget(d), {"a": 600_000}, default_ppm=150_000)
    out = apply_mixture(d, w)
    # deterministic end-to-end: two runs, any partitioning, same rows
    a = sorted((r["doc_id"], r["copy_id"]) for r in out.collect())
    b = sorted(
        (r["doc_id"], r["copy_id"])
        for r in apply_mixture(d.repartition(7), w).collect()
    )
    assert a == b and len(a) > 0


def test_integer_root_exact_on_edges(spark):
    """Floor t-th roots are exact at perfect powers and their
    neighbors — where a float pow seed is most likely to be off by
    an ulp."""
    from asterlake.operators.mixture import integer_root

    vals = []
    for r in (0, 1, 2, 7, 10, 999, 10**6):
        for t in (2, 3):
            p = r**t
            for n in (p - 1, p, p + 1):
                if n >= 0:
                    vals.append((n, t))
    for t in (2, 3):
        ns = sorted({n for n, tt in vals if tt == t})
        df = spark.createDataFrame([(n,) for n in ns], "n long")
        got = {
            r.n: r.w
            for r in df.select(
                "n", integer_root(F.col("n"), t).alias("w")
            ).collect()
        }
        for n in ns:
            # integer floor root by search
            expect = int(n ** (1.0 / t))
            while (expect + 1) ** t <= n:
                expect += 1
            while expect**t > n:
                expect -= 1
            assert got[n] == expect, (n, t, got[n], expect)


def test_temperature_shares_flatten_head(spark):
    """T=3 shares sit strictly between proportional and uniform for a
    skewed corpus, and sum to <= 1e6 with exact integers."""
    from asterlake.operators.mixture import temperature_shares

    b = spark.createDataFrame(
        [("big", 8_000_000), ("mid", 1_000_000), ("small", 8_000)],
        "domain string, n_tokens long",
    )
    rows = {r.domain: r for r in temperature_shares(b, 3).collect()}
    assert rows["big"].w == 200 and rows["small"].w == 20
    total = sum(r.share_ppm for r in rows.values())
    assert 999_990 <= total <= 1_000_000
    prop_big = 8_000_000 * 10**6 // 9_008_000
    assert rows["big"].share_ppm < prop_big  # flattened below proportional
    assert rows["small"].share_ppm > 8_000 * 10**6 // 9_008_000
