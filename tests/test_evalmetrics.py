"""Exact tie-adjusted AUC (operators/evalmetrics) vs a pure-Python
Mann-Whitney replay. R13 query candidate (the oracle restates the
two-level prefix sum as one window over the distinct-score histogram)."""

from __future__ import annotations

import random

from asterlake.operators.evalmetrics import auc_exact


def _ref_auc(pairs):
    """Tie-adjusted AUC by direct pair counting (sklearn semantics)."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        return None, 0
    u2 = 0
    for p in pos:
        for n in neg:
            if p > n:
                u2 += 2
            elif p == n:
                u2 += 1
    return u2 / (2 * len(pos) * len(neg)), u2


def _run(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "score long, label boolean")
    return auc_exact(df, **kw).collect()[0]


def test_auc_matches_pair_counting_with_ties_and_negatives(spark):
    rng = random.Random(7)
    pairs = [
        (rng.randrange(-5000, 5000), rng.random() < 0.4)
        for _ in range(400)
    ]
    # force heavy ties across classes
    pairs += [(0, True)] * 7 + [(0, False)] * 5 + [(-5000, True)] * 3
    want_auc, want_u2 = _ref_auc(pairs)
    got = _run(spark, pairs, bucket_step=1000)
    assert got.u2 == want_u2
    assert got.n_pos == sum(1 for _, y in pairs if y)
    assert got.n_neg == sum(1 for _, y in pairs if not y)
    assert got.auc_ppm == (want_u2 * 10**6) // (
        2 * got.n_pos * got.n_neg
    )
    assert abs(got.auc_ppm / 1e6 - want_auc) < 1e-6


def test_auc_perfect_random_and_inverted(spark):
    perfect = [(i + 100, True) for i in range(20)] + [
        (i, False) for i in range(20)
    ]
    assert _run(spark, perfect).auc_ppm == 1_000_000
    inverted = [(i, True) for i in range(20)] + [
        (i + 100, False) for i in range(20)
    ]
    assert _run(spark, inverted).auc_ppm == 0
    all_tied = [(5, True)] * 10 + [(5, False)] * 10
    assert _run(spark, all_tied).auc_ppm == 500_000


def test_auc_u2_stays_decimal_and_bucket_step_validated(spark):
    """u2 rides through as DECIMAL(38,0) (r12 ADVICE: 2*n_pos*n_neg
    outgrows BIGINT past ~2.1e9 rows per class); bucket_step < 1 is a
    named error, not a pmod-by-zero runtime failure."""
    import pytest
    from pyspark.sql import types as T

    from asterlake.operators.evalmetrics import auc_exact

    df = spark.createDataFrame(
        [(1, True), (0, False)], "score long, label boolean"
    )
    out = auc_exact(df)
    assert out.schema["u2"].dataType == T.DecimalType(38, 0)
    assert out.collect()[0].u2 == 2
    with pytest.raises(ValueError, match="bucket_step"):
        auc_exact(df, bucket_step=0)


def test_auc_undefined_single_class_and_null_hygiene(spark):
    one_class = [(1, True), (2, True)]
    row = _run(spark, one_class)
    assert row.auc_ppm is None and row.n_neg == 0
    with_nulls = [(1, True), (None, False), (3, None), (2, False)]
    row = _run(spark, with_nulls)
    assert (row.n_pos, row.n_neg) == (1, 1)
    # kept rows: positive scored 1, negative scored 2 -> ranked wrong
    assert row.auc_ppm == 0


def test_auc_partitioning_invariance(spark):
    rng = random.Random(3)
    pairs = [
        (rng.randrange(-300, 300), rng.random() < 0.5)
        for _ in range(300)
    ]
    df = spark.createDataFrame(pairs, "score long, label boolean")
    a = auc_exact(df.coalesce(1)).collect()[0]
    b = auc_exact(df.repartition(9)).collect()[0]
    assert tuple(a) == tuple(b)


# ---------------------------------------------------------------------------
# clustering_pair_metrics
# ---------------------------------------------------------------------------


def _ref_pair_metrics(rows):
    from itertools import combinations

    rows = [(p, g) for p, g in rows if p is not None and g is not None]
    tp = fp = fn = 0
    for (p1, g1), (p2, g2) in combinations(rows, 2):
        same_p, same_g = p1 == p2, g1 == g2
        tp += same_p and same_g
        fp += same_p and not same_g
        fn += same_g and not same_p
    return tp, fp, fn


def test_pair_metrics_match_bruteforce(spark):
    import random

    from asterlake.operators.evalmetrics import clustering_pair_metrics

    rng = random.Random(13)
    rows = [
        (rng.randrange(6), rng.randrange(5)) for _ in range(120)
    ] + [(None, 1), (2, None)]
    tp, fp, fn = _ref_pair_metrics(rows)
    got = clustering_pair_metrics(
        spark.createDataFrame(rows, "cluster long, gold long")
    ).collect()[0]
    assert (got.tp_pairs, got.fp_pairs, got.fn_pairs) == (tp, fp, fn)
    assert got.precision_ppm == (tp * 10**6) // (tp + fp)
    assert got.recall_ppm == (tp * 10**6) // (tp + fn)
    assert got.f1_ppm == (2 * tp * 10**6) // ((tp + fp) + (tp + fn))


def test_pair_metrics_perfect_and_degenerate(spark):
    from asterlake.operators.evalmetrics import clustering_pair_metrics

    perfect = [(i % 3, i % 3) for i in range(12)]
    got = clustering_pair_metrics(
        spark.createDataFrame(perfect, "cluster long, gold long")
    ).collect()[0]
    assert got.precision_ppm == got.recall_ppm == got.f1_ppm == 10**6
    # all-singleton prediction: zero predicted pairs -> precision NULL
    singletons = [(i, 0) for i in range(5)]
    got = clustering_pair_metrics(
        spark.createDataFrame(singletons, "cluster long, gold long")
    ).collect()[0]
    assert got.tp_pairs == 0 and got.precision_ppm is None
    assert got.recall_ppm == 0


def test_pair_metrics_partitioning_invariance(spark):
    import random

    from asterlake.operators.evalmetrics import clustering_pair_metrics

    rng = random.Random(5)
    rows = [(rng.randrange(4), rng.randrange(4)) for _ in range(90)]
    df = spark.createDataFrame(rows, "cluster long, gold long")
    a = tuple(clustering_pair_metrics(df.coalesce(1)).collect()[0])
    b = tuple(clustering_pair_metrics(df.repartition(7)).collect()[0])
    assert a == b


def test_auc_and_pair_metrics_on_empty_input(spark):
    from asterlake.operators.evalmetrics import (
        auc_exact,
        clustering_pair_metrics,
    )

    empty = spark.createDataFrame([], "score long, label boolean")
    row = auc_exact(empty).collect()[0]
    assert (row.n_pos, row.n_neg, row.u2, row.auc_ppm) == (0, 0, 0, None)
    emptyc = spark.createDataFrame([], "cluster long, gold long")
    row = clustering_pair_metrics(emptyc).collect()[0]
    assert (row.tp_pairs, row.fp_pairs, row.fn_pairs) == (0, 0, 0)
    assert row.precision_ppm is None and row.f1_ppm is None


# ---------------------------------------------------------------------------
# cohens_kappa
# ---------------------------------------------------------------------------


def _ref_kappa(pairs):
    from collections import Counter
    from fractions import Fraction

    pairs = [(a, b) for a, b in pairs if a is not None and b is not None]
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    ra = Counter(a for a, _ in pairs)
    rb = Counter(b for _, b in pairs)
    pe_num = sum(ra[k] * rb.get(k, 0) for k in ra)
    den = n * n - pe_num
    if den == 0:
        return n, agree, None
    k = Fraction(n * agree - pe_num, den)
    # integer-div ppm with Python floor semantics matching `div`
    # (truncation toward zero for DECIMAL div)
    num_ppm = (n * agree - pe_num) * 10**6
    q = abs(num_ppm) // abs(den)
    if (num_ppm < 0) != (den < 0):
        q = -q
    return n, agree, q


def test_kappa_matches_fraction_replay(spark):
    import random

    from asterlake.operators.evalmetrics import cohens_kappa

    rng = random.Random(17)
    labels = ["spam", "ham", "unsure"]
    pairs = []
    for _ in range(200):
        a = rng.choice(labels)
        b = a if rng.random() < 0.7 else rng.choice(labels)
        pairs.append((a, b))
    pairs += [(None, "spam"), ("ham", None)]
    n, agree, want = _ref_kappa(pairs)
    got = cohens_kappa(
        spark.createDataFrame(pairs, "label_a string, label_b string")
    ).collect()[0]
    assert (got.n, got.n_agree, got.kappa_ppm) == (n, agree, want)


def test_kappa_endpoints(spark):
    from asterlake.operators.evalmetrics import cohens_kappa

    def run(pairs):
        return cohens_kappa(
            spark.createDataFrame(pairs, "label_a string, label_b string")
        ).collect()[0]

    # perfect agreement over 2 classes -> kappa 1
    perfect = [("x", "x")] * 5 + [("y", "y")] * 5
    assert run(perfect).kappa_ppm == 1_000_000
    # systematic disagreement on balanced marginals -> negative kappa
    opposed = [("x", "y")] * 5 + [("y", "x")] * 5
    assert run(opposed).kappa_ppm == -1_000_000
    # both raters constant and identical -> pe = 1, undefined
    constant = [("x", "x")] * 8
    assert run(constant).kappa_ppm is None
    # agreement exactly at chance -> kappa 0
    chance = [("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")]
    assert run(chance).kappa_ppm == 0


def test_kappa_partitioning_invariance(spark):
    import random

    from asterlake.operators.evalmetrics import cohens_kappa

    rng = random.Random(2)
    pairs = [
        (str(rng.randrange(3)), str(rng.randrange(3))) for _ in range(150)
    ]
    df = spark.createDataFrame(pairs, "label_a string, label_b string")
    a = tuple(cohens_kappa(df.coalesce(1)).collect()[0])
    b = tuple(cohens_kappa(df.repartition(8)).collect()[0])
    assert a == b


# ---------------------------------------------------------------------------
# ngram_overlap / ngram_overlap_corpus
# ---------------------------------------------------------------------------


def _ref_overlap(ref, hyp, n):
    from collections import Counter

    def grams(t):
        toks = (t or "").split()
        return Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )

    rg, hg = grams(ref), grams(hyp)
    matched = sum(min(c, rg.get(g, 0)) for g, c in hg.items())
    return matched, sum(hg.values()), sum(rg.values())


PAIRS = [
    ("the cat sat on the mat", "the cat sat on the mat"),  # identical
    ("the cat sat on the mat", "the cat the cat"),  # clipped repeats
    ("a b c d", "e f g h"),  # disjoint
    ("one two", "one"),  # hyp shorter than n=2
    (None, "x y z"),
    ("x y z", None),
    ("", "   "),
]


def test_ngram_overlap_matches_python_replay(spark):
    from asterlake.operators.evalmetrics import ngram_overlap

    df = spark.createDataFrame(
        [(i, r, h) for i, (r, h) in enumerate(PAIRS)],
        "pair_id long, ref string, hyp string",
    )
    for n in (1, 2, 3):
        got = {
            r.pair_id: (r.matched, r.hyp_total, r.ref_total)
            for r in ngram_overlap(df, n=n, id_col="pair_id").collect()
        }
        want = {
            i: _ref_overlap(r, h, n) for i, (r, h) in enumerate(PAIRS)
        }
        assert got == want, n
    # the clip: 'the cat the cat' has bigram 'the cat' twice but the
    # reference holds it once -> clipped to 1 (+ 0 for 'cat the')
    assert got != {}  # n=3 ran
    m2 = {
        r.pair_id: r.matched
        for r in ngram_overlap(df, n=2, id_col="pair_id").collect()
    }
    assert m2[1] == 1


def test_ngram_overlap_corpus_micro_average_and_endpoints(spark):
    from asterlake.operators.evalmetrics import ngram_overlap_corpus

    df = spark.createDataFrame(PAIRS, "ref string, hyp string")
    row = ngram_overlap_corpus(df, n=2).collect()[0]
    want = [_ref_overlap(r, h, 2) for r, h in PAIRS]
    m = sum(w[0] for w in want)
    ht = sum(w[1] for w in want)
    rt = sum(w[2] for w in want)
    assert (row.n, row.matched, row.hyp_total, row.ref_total) == (
        2, m, ht, rt,
    )
    assert row.precision_ppm == m * 10**6 // ht
    assert row.recall_ppm == m * 10**6 // rt
    assert row.f1_ppm == 2 * m * 10**6 // (ht + rt)
    # identical corpus -> all 1e6; empty hyp side -> NULL precision
    ident = spark.createDataFrame(
        [("a b c", "a b c")], "ref string, hyp string"
    )
    r = ngram_overlap_corpus(ident, n=1).collect()[0]
    assert (r.precision_ppm, r.recall_ppm, r.f1_ppm) == (
        10**6, 10**6, 10**6,
    )
    empty_hyp = spark.createDataFrame(
        [("a b c", "")], "ref string, hyp string"
    )
    r = ngram_overlap_corpus(empty_hyp, n=1).collect()[0]
    assert r.precision_ppm is None and r.recall_ppm == 0
    import pytest

    from asterlake.operators.evalmetrics import ngram_overlap

    with pytest.raises(ValueError, match="n must be"):
        ngram_overlap(ident, n=0)


def test_ngram_overlap_plan_is_shuffle_free_and_split_once(spark):
    """The per-pair operator is one projection (no Exchange, no
    Python), and each side's whitespace split appears exactly ONCE in
    the plan — the two let-binding levels exist to stop the gram build
    and the clip from re-splitting per reference."""
    from asterlake.operators.evalmetrics import ngram_overlap

    df = spark.createDataFrame(
        [("a b", "a b")], "ref string, hyp string"
    )
    plan = (
        ngram_overlap(df, n=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("split(trim") == 2  # once per side


def test_ngram_overlap_partitioning_invariance(spark):
    import random

    from asterlake.operators.evalmetrics import ngram_overlap_corpus

    rng = random.Random(11)
    words = "a b c d e".split()
    rows = [
        (
            " ".join(rng.choices(words, k=rng.randrange(0, 12))),
            " ".join(rng.choices(words, k=rng.randrange(0, 12))),
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "ref string, hyp string")
    a = tuple(ngram_overlap_corpus(df.coalesce(1), n=2).collect()[0])
    b = tuple(ngram_overlap_corpus(df.repartition(7), n=2).collect()[0])
    assert a == b


def test_ngram_overlap_multi_fuses_orders_in_one_pass(spark):
    """The multi-n form equals the per-n operator for every order AND
    runs ONE corpus pass: each side's split appears once in the plan
    regardless of len(ns), and exactly one scan feeds it."""
    from asterlake.operators.evalmetrics import (
        ngram_overlap,
        ngram_overlap_corpus,
        ngram_overlap_corpus_multi,
        ngram_overlap_multi,
    )

    df = spark.createDataFrame(
        [(i, r, h) for i, (r, h) in enumerate(PAIRS)],
        "pair_id long, ref string, hyp string",
    )
    multi = {
        (r.pair_id, r.n): (r.matched, r.hyp_total, r.ref_total)
        for r in ngram_overlap_multi(
            df, ns=(1, 2, 3), id_col="pair_id"
        ).collect()
    }
    for n in (1, 2, 3):
        single = {
            (r.pair_id, n): (r.matched, r.hyp_total, r.ref_total)
            for r in ngram_overlap(df, n=n, id_col="pair_id").collect()
        }
        assert {k: v for k, v in multi.items() if k[1] == n} == single, n
    corpus = {
        r.n: tuple(r)[1:]
        for r in ngram_overlap_corpus_multi(df, ns=(1, 2)).collect()
    }
    for n in (1, 2):
        want = tuple(ngram_overlap_corpus(df, n=n).collect()[0])[1:]
        assert corpus[n] == want, n
    plan = (
        ngram_overlap_multi(df, ns=(1, 2, 3, 4))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("split(trim") == 2  # once per side, not per n
    assert "Exchange" not in plan
    import pytest

    with pytest.raises(ValueError, match="ns must be"):
        ngram_overlap_multi(df, ns=())
