"""Windowed co-occurrence + log-free PMI (operators/cooccur):
pure-Python reference differentials and the exact-integer ratio
contract. R13 query candidate (the oracle restates the pair expansion
in list-space and the ratio as HUGEINT integer division)."""

from __future__ import annotations

from collections import Counter

from asterlake.operators.cooccur import (
    cooccurrence_counts,
    pmi_ratio,
    top_collocations,
)

DOCS = [
    (1, "new york is a big city and new york never sleeps"),
    (2, "the city of new york"),
    (3, "a big red dog and a big red ball"),
    (4, None),
    (5, "   "),
    (6, "york"),
]


def _ref_pairs(texts, window):
    pairs = Counter()
    for t in texts:
        toks = (t or "").split()
        for i, x in enumerate(toks):
            for y in toks[i + 1 : i + 1 + window]:
                pairs[(min(x, y), max(x, y))] += 1
    return pairs


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_cooccurrence_matches_python_reference(spark):
    for window in (1, 2, 4):
        got = {
            (r.tok_a, r.tok_b): r.c_ab
            for r in cooccurrence_counts(_df(spark), window=window).collect()
        }
        want = dict(_ref_pairs([t for _, t in DOCS], window))
        assert got == want, window


def test_pmi_ratio_exact_integer_arithmetic(spark):
    """ratio_ppm replayed in exact Python ints: (c_ab * N^2 * 1e6) //
    (n_pairs * c_a * c_b); collocations ('new','york' adjacent in every
    occurrence) score above independence (> 1e6)."""
    window = 2
    texts = [t for _, t in DOCS]
    toks_all = [tok for t in texts for tok in (t or "").split()]
    n_tok = len(toks_all)
    uni = Counter(toks_all)
    pairs = _ref_pairs(texts, window)
    kept = {p: c for p, c in pairs.items() if c >= 2}
    # denominator mass is the UNFILTERED pair total (r12 ADVICE fix):
    # pruning the tail must not inflate the surviving ratios
    n_pairs = sum(pairs.values())
    got = {
        (r.tok_a, r.tok_b): (r.c_ab, r.c_a, r.c_b, r.ratio_ppm)
        for r in pmi_ratio(_df(spark), window=window, min_count=2).collect()
    }
    assert set(got) == set(kept)
    for (a, b), c_ab in kept.items():
        want_ratio = (c_ab * n_tok * n_tok * 1_000_000) // (
            n_pairs * uni[a] * uni[b]
        )
        assert got[(a, b)] == (c_ab, uni[a], uni[b], want_ratio), (a, b)
    assert got[("new", "york")][3] > 1_000_000


def test_top_collocations_total_order_and_plan(spark):
    df = top_collocations(_df(spark), k=3, window=2, min_count=2)
    rows = df.collect()
    assert len(rows) == 3
    keys = [(-r.ratio_ppm, r.tok_a, r.tok_b) for r in rows]
    assert keys == sorted(keys)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_pmi_n_pairs_closed_form_all_windows(spark):
    """The closed-form per-doc pair mass equals the explicit pair sum
    at every window size (both branches: docs shorter and longer than
    window+1), and the plan runs ONE pair expansion — the pairs
    explode plus the unigram explode, never a second pair expansion
    for the denominator."""
    texts = ["a", "", None, "a b", "a b c d e", "x " * 12]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for window in (1, 2, 4, 7):
        want = sum(_ref_pairs([t for t in texts], window).values())
        got = pmi_ratio(df, window=window, min_count=1)
        rows = got.collect()
        if rows:
            r = rows[0]
            # ratio_ppm = c_ab * N^2 * 1e6 // (n_pairs * c_a * c_b):
            # recover n_pairs from any surviving row to pin the closed
            # form against the explicit sum
            toks = [tok for t in texts for tok in (t or "").split()]
            n = len(toks)
            from collections import Counter

            uni = Counter(toks)
            n_pairs = (r.c_ab * n * n * 1_000_000) // (
                r.ratio_ppm * uni[r.tok_a] * uni[r.tok_b]
            ) if r.ratio_ppm else None
            # integer-div round trip: n_pairs is within 1 of the true
            # value; assert via forward direction instead
            want_ratio = (r.c_ab * n * n * 1_000_000) // (
                want * uni[r.tok_a] * uni[r.tok_b]
            )
            assert r.ratio_ppm == want_ratio, window
    plan = (
        pmi_ratio(df, window=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly ONE pair expansion (the let-bound element_at(transform(
    # array(...)) form — the token split evaluates once per row), ONE
    # unigram token explode (the single build the melt-join-regroup
    # exists to guarantee — two broadcast self-joins would build it
    # twice), plus the row-local 2-struct melt explode
    assert plan.count("Generate explode(element_at(transform(array(") == 1
    assert plan.count("Generate explode(filter(split") == 1
    assert plan.count("Generate explode") == 3


def test_cooccurrence_partitioning_invariance(spark):
    base = _df(spark)
    one = {
        tuple(r) for r in cooccurrence_counts(base.coalesce(1)).collect()
    }
    many = {
        tuple(r) for r in cooccurrence_counts(base.repartition(5)).collect()
    }
    assert one == many


def test_cooccur_empty_and_single_token_docs(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert cooccurrence_counts(empty).count() == 0
    assert pmi_ratio(empty).count() == 0
    # single-token docs produce no pairs but do count unigrams
    one = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    assert cooccurrence_counts(one).count() == 0
