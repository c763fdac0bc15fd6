"""Windowed token co-occurrence + log-free PMI collocations.

The corpus statistic behind phrase mining, collocation extraction and
word-vector objectives (word2vec's training pairs ARE windowed
co-occurrences; PMI-weighted co-occurrence is the classic SVD-able
association matrix — Church & Hanks, Computational Linguistics 1990;
Levy & Goldberg, NeurIPS 2014 show SGNS implicitly factorizes the
shifted PMI matrix). A curation pipeline uses it to mine multi-word
expressions worth protecting from tokenizer splits and to audit
domain drift in collocation space.

Determinism discipline: PMI's log is NEVER taken. log is monotone, so
every decision a pipeline makes on PMI (thresholds, top-k ranking) is
equally made on the RAW association ratio — and the ratio is exact
integer arithmetic: ``ratio_ppm = (c_ab * N_tok^2 * 10^6) div
(n_pairs * c_a * c_b)`` in DECIMAL(38,0), hash-gateable across engines
where a float ln() would be libm-dependent (the engine-wide
pow/ln-distrust rule; see mixture.integer_root). Callers who want
nats take log(ratio_ppm / 1e6) driver-side on the model-sized result.

Scale: pair generation is a row-local projection (each token pairs
with at most ``window`` following tokens — explode fan-out bounded at
window x tokens, the pagerank pair-expansion shape); the only shuffle
is the map-side-combinable (tok_a, tok_b) count; the PMI join
broadcasts the unigram table when it is vocabulary-sized. ``min_count``
prunes the pair tail BEFORE the ratio projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cooccurrence_counts", "pmi_ratio", "top_collocations"]


def _tokens(text_col: str) -> Column:
    # NULL text -> empty stream, never NULL (the ngramlm convention)
    toks = F.split(
        F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"
    )
    return F.filter(toks, lambda t: t != "")


def cooccurrence_counts(
    docs: DataFrame,
    window: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Unordered within-window token pair counts: one row per
    ``(tok_a, tok_b)`` with ``tok_a <= tok_b`` (lexicographic
    canonicalization, so "a b" and "b a" accumulate together) and the
    exact BIGINT count of window-co-occurrences — each position pairs
    with the ``window`` positions after it, the standard symmetric-
    window convention (a pair at distance d <= window counts once per
    occurrence). Pair expansion is ONE row-local projection; the only
    shuffle carries (string, string, partial count) with map-side
    combine."""
    toks = _tokens(text_col)
    # LET-bind the token array (the pq_encode single-element-transform
    # idiom: transform(array(e), t -> body)[1] evaluates e once and
    # body references t as a cheap lambda variable): the naive form
    # references `toks` inside the per-position lambda, and each
    # slice(toks, ...) re-evaluates the FULL split — O(L^2) splits per
    # document (measured 5.2s -> 1.5s for the sf0.1 count at window 2)
    pairs = F.element_at(
        F.transform(
            F.array(toks),
            lambda t: F.flatten(
                F.transform(
                    t,
                    lambda x, i: F.transform(
                        F.slice(t, i + F.lit(2), F.lit(window)),
                        lambda y: F.struct(
                            F.least(x, y).alias("tok_a"),
                            F.greatest(x, y).alias("tok_b"),
                        ),
                    ),
                )
            ),
        ),
        1,
    )
    ex = docs.select(F.explode(pairs).alias("_p")).select(
        "_p.tok_a", "_p.tok_b"
    )
    return ex.groupBy("tok_a", "tok_b").agg(
        F.count("*").cast("bigint").alias("c_ab")
    )


def pmi_ratio(
    docs: DataFrame,
    window: int = 4,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Per-pair log-free PMI: ``(tok_a, tok_b, c_ab, c_a, c_b,
    ratio_ppm)`` with ``ratio_ppm = (c_ab * N_tok^2 * 10^6) div
    (n_pairs * c_a * c_b)`` — the exact-integer association ratio
    whose log IS the PMI in nats. ratio_ppm > 10^6 means the pair
    co-occurs more than independence predicts.

    All five operands are exact BIGINTs; the product routes through
    DECIMAL(38,0) (c_ab * N_tok^2 * 10^6 overflows BIGINT past ~3k
    tokens). Headroom bound: the numerator stays inside DECIMAL(38,0)
    while c_ab * N_tok^2 < 10^32 — at 10^12 corpus tokens that allows
    c_ab up to 10^8; past that, pre-divide N_tok^2 by gcd or bucket
    the corpus (documented, not silently wrong: ANSI DECIMAL overflow
    raises). ``n_pairs`` is the UNFILTERED total pair mass (summed
    before the min_count prune — the pruned tail is often most of the
    mass in a heavy-tailed corpus, and dropping it from the
    denominator would uniformly inflate every ratio, breaking the
    log(ratio_ppm/1e6)-is-PMI identity); it is computed CLOSED-FORM
    from per-document token counts (one projection), never by a second
    pair expansion. ``min_count`` prunes the pair tail before the
    ratio projection; the unigram side joins via broadcast when
    vocabulary-sized."""
    toks = _tokens(text_col)
    uni = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    totals = docs.select(
        F.sum(F.size(toks)).cast("bigint").alias("n_tok")
    )
    # Denominator mass BEFORE the tail prune: P(a,b) = c_ab / n_pairs
    # needs the full pair distribution, not the surviving head. The
    # total is CLOSED-FORM per document — position k (0-based from the
    # end) contributes min(window, k) pairs, so a doc of L tokens
    # carries sum_{k=0}^{L-1} min(w, k) = L*(L-1)/2 when L <= w+1,
    # else w*(w+1)/2 + (L-1-w)*w — a pure projection + one scalar
    # aggregate, so the pair expansion runs ONCE (for the counts), not
    # twice. The small branch's L*(L-1)/2 goes through an
    # exactly-representable double (L <= window+1 there); the large
    # branch is pure BIGINT arithmetic at any L.
    L = F.size(toks).cast("bigint")
    w_lit = F.lit(window).cast("bigint")
    per_doc = F.when(
        L <= w_lit + F.lit(1).cast("bigint"),
        (L * (L - F.lit(1)) / F.lit(2)).cast("bigint"),
    ).otherwise(
        F.lit(window * (window + 1) // 2).cast("bigint")
        + (L - F.lit(1) - w_lit) * w_lit
    )
    n_pairs = docs.select(
        F.coalesce(F.sum(per_doc), F.lit(0)).cast("bigint").alias("n_pairs")
    )
    cooc = cooccurrence_counts(docs, window, text_col).filter(
        F.col("c_ab") >= F.lit(min_count)
    )
    dec = "decimal(38,0)"
    num = (
        F.col("c_ab").cast(dec)
        * F.col("n_tok").cast(dec)
        * F.col("n_tok").cast(dec)
        * F.lit(1_000_000).cast(dec)
    )
    den = (
        F.col("n_pairs").cast(dec)
        * F.col("c_a").cast(dec)
        * F.col("c_b").cast(dec)
    )
    # Attach c_a and c_b with ONE build of the unigram relation: two
    # broadcast self-joins would BUILD the corpus-scan unigram
    # aggregate twice (Spark's exchange reuse does not fire across the
    # differently-renamed broadcast sides — measured), so the pair
    # head melts to (pair, side, tok), joins the single broadcast
    # unigram table once, and regroups — the extra shuffle moves 2x
    # the PRUNED pair head, which at corpus scale is far cheaper than
    # a second full-corpus explode + vocabulary shuffle.
    melted = cooc.select(
        "tok_a",
        "tok_b",
        "c_ab",
        F.explode(
            F.array(
                F.struct(
                    F.lit("a").alias("side"), F.col("tok_a").alias("tok")
                ),
                F.struct(
                    F.lit("b").alias("side"), F.col("tok_b").alias("tok")
                ),
            )
        ).alias("_s"),
    ).select("tok_a", "tok_b", "c_ab", "_s.side", "_s.tok")
    with_counts = (
        melted.join(F.broadcast(uni), "tok")
        .groupBy("tok_a", "tok_b", "c_ab")
        .agg(
            F.max(F.when(F.col("side") == "a", F.col("c"))).alias("c_a"),
            F.max(F.when(F.col("side") == "b", F.col("c"))).alias("c_b"),
        )
    )
    return (
        with_counts.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(n_pairs))
        .withColumn("_num", num)
        .withColumn("_den", den)
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            "c_a",
            "c_b",
            # `div` is the exact integral quotient on DECIMAL operands
            # in BOTH engines (verified: 7e6 div 6 = 1166666 on each);
            # `/` would produce a scale-6 HALF_UP decimal instead
            F.expr("CAST(_num div _den AS BIGINT)").alias("ratio_ppm"),
        )
    )


def top_collocations(
    docs: DataFrame,
    k: int = 20,
    window: int = 4,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """The k strongest collocations by (ratio_ppm DESC, tok_a, tok_b)
    — total order, TakeOrderedAndProject top-k."""
    return (
        pmi_ratio(docs, window, text_col, min_count)
        .orderBy(
            F.desc("ratio_ppm"), F.asc("tok_a"), F.asc("tok_b")
        )
        .limit(k)
    )
