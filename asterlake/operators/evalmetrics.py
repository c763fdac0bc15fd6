"""Exact ranking-metric evaluation: tie-adjusted AUC as integer
arithmetic (Mann-Whitney U), at shuffle scale.

The quality-classifier loop (classifier.py) gates corpora on scores;
the metric that validates the gate is ROC-AUC. The standard
computation sorts all rows globally — a single-partition sort a 100-TB
eval set cannot do. This module computes the EXACT tie-adjusted AUC
(equal to sklearn's roc_auc_score) from the Mann-Whitney U statistic
with a two-level prefix sum over the DISTINCT-SCORE histogram:

  U2 = sum over distinct scores s of n_pos(s) * (2 * n_neg_below(s)
       + n_neg(s))                       [ties count half, so x2]
  AUC = U2 / (2 * n_pos * n_neg)

- the histogram is a map-side-combinable groupBy(score) — rows never
  sort, only distinct scores do;
- n_neg_below splits into a BUCKET prefix (score div bucket_step:
  a bounds-sized relation — e.g. 1001 rows for ppm scores at step
  1e3 — whose running sum is a window over that tiny set) plus a
  WITHIN-bucket running sum (window PARTITIONED BY bucket, the
  engine's key-partitioned-window discipline — never a global sort);
- every quantity is an exact BIGINT/DECIMAL(38,0); the final ratio is
  integer ``div`` ppm, so the result is hash-gateable and independent
  of partitioning.

Contract: ``score_col`` must be integral (the engine's micro-unit
score discipline — logistic_score/bm25/loglik all quantize; a raw
double column is the caller's to quantize first, which is also what
makes AUC reproducible across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "auc_exact",
    "clustering_pair_metrics",
    "cohens_kappa",
    "ngram_overlap",
    "ngram_overlap_corpus",
    "ngram_overlap_corpus_multi",
    "ngram_overlap_multi",
]


def auc_exact(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    bucket_step: int = 1000,
) -> DataFrame:
    """One row: ``(n_pos, n_neg, u2, auc_ppm)`` with ``u2`` twice the
    tie-adjusted Mann-Whitney U and ``auc_ppm = u2 * 10^6 div
    (2 * n_pos * n_neg)`` (NULL when either class is empty — AUC is
    undefined, not 0). ``u2`` is DECIMAL(38,0): u2 = 2*n_pos*n_neg at
    AUC=1, which outgrows BIGINT past ~2.1e9 rows per class — exactly
    the eval-set scale this module targets, so the exact decimal rides
    through to the output (auc_ppm computes from it in decimal too).
    ``label_col`` is truthy-positive (cast to boolean). NULL
    scores/labels are excluded (they rank nowhere)."""
    if bucket_step < 1:
        raise ValueError(f"bucket_step must be >= 1, got {bucket_step}")
    base = df.select(
        F.col(score_col).cast("bigint").alias("_s"),
        F.col(label_col).cast("boolean").alias("_y"),
    ).filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
    hist = base.groupBy("_s").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0))
        .cast("bigint")
        .alias("np"),
        F.sum(F.when(F.col("_y"), 0).otherwise(1))
        .cast("bigint")
        .alias("nn"),
    )
    hist = hist.withColumn(
        "_b", (F.col("_s") - (F.pmod(F.col("_s"), F.lit(bucket_step)))).alias("_b")
    )
    # bucket-level negative totals, then the running total of the
    # buckets BELOW each bucket — the window runs over the bucket
    # relation only (domain/bucket_step rows, bounds-sized)
    buckets = hist.groupBy("_b").agg(
        F.sum("nn").cast("bigint").alias("_bn")
    )
    wb = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bucket_prefix = buckets.select(
        "_b",
        F.coalesce(F.sum("_bn").over(wb), F.lit(0))
        .cast("bigint")
        .alias("_below_b"),
    )
    # within-bucket running negatives below each score: partitioned by
    # the bucket key — never a global sort
    ww = (
        Window.partitionBy("_b")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = (
        hist.join(F.broadcast(bucket_prefix), "_b")
        .withColumn(
            "_below_in",
            F.coalesce(F.sum("nn").over(ww), F.lit(0)).cast("bigint"),
        )
        .withColumn(
            "_contrib",
            F.col("np").cast("decimal(38,0)")
            * (
                F.lit(2).cast("decimal(38,0)")
                * (F.col("_below_b") + F.col("_below_in")).cast(
                    "decimal(38,0)"
                )
                + F.col("nn").cast("decimal(38,0)")
            ),
        )
    )
    agg = scored.agg(
        F.coalesce(F.sum("np"), F.lit(0)).cast("bigint").alias("n_pos"),
        F.coalesce(F.sum("nn"), F.lit(0)).cast("bigint").alias("n_neg"),
        F.coalesce(
            F.sum("_contrib"), F.lit(0).cast("decimal(38,0)")
        ).alias("_u2d"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.col("_u2d").alias("u2"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr(
                "CAST((_u2d * CAST(1000000 AS DECIMAL(38,0))) div "
                "(CAST(2 AS DECIMAL(38,0)) * CAST(n_pos AS DECIMAL(38,0))"
                " * CAST(n_neg AS DECIMAL(38,0))) AS BIGINT)"
            ),
        ).alias("auc_ppm"),
    )


def clustering_pair_metrics(
    df: DataFrame,
    pred_col: str = "cluster",
    gold_col: str = "gold",
    id_col: str | None = None,
) -> DataFrame:
    """Exact pair-counting evaluation of a clustering (dedup clusters,
    linkage entities, LPA communities) against gold labels: one row
    ``(tp_pairs, fp_pairs, fn_pairs, precision_ppm, recall_ppm,
    f1_ppm)`` over the within-cluster pair sets —

      TP = pairs together in BOTH;  FP = together in pred only;
      FN = together in gold only    (the Rand/pair-F1 family).

    Never enumerates pairs: pair counts come from the contingency
    table — ``pairs(n) = n*(n-1)/2`` summed over (a) the (pred, gold)
    cell sizes (= TP), (b) pred cluster sizes (= TP+FP), (c) gold
    class sizes (= TP+FN) — three map-side-combinable groupBys over
    (long, long) keys, each emitting one scalar. All counts exact
    BIGINT (pair arithmetic in DECIMAL(38,0): n*(n-1) overflows BIGINT
    past ~3e9-row clusters); ratios are integer-``div`` ppm; an empty
    pair set yields NULL ratios (undefined, not 0). Rows with a NULL
    label on either side are excluded (they pair with nothing)."""
    base = df.select(
        F.col(pred_col).alias("_p"), F.col(gold_col).alias("_g")
    ).filter(F.col("_p").isNotNull() & F.col("_g").isNotNull())

    def pairs_of(counts: DataFrame, n_col: str) -> DataFrame:
        return counts.agg(
            F.coalesce(
                F.sum(
                    F.expr(
                        f"CAST({n_col} AS DECIMAL(38,0)) * "
                        f"(CAST({n_col} AS DECIMAL(38,0)) - 1) div 2"
                    )
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("_pairs")
        )

    cells = base.groupBy("_p", "_g").agg(
        F.count("*").cast("bigint").alias("n")
    )
    preds = base.groupBy("_p").agg(F.count("*").cast("bigint").alias("n"))
    golds = base.groupBy("_g").agg(F.count("*").cast("bigint").alias("n"))
    tp = pairs_of(cells, "n").withColumnRenamed("_pairs", "_tp")
    pp = pairs_of(preds, "n").withColumnRenamed("_pairs", "_pp")
    gp = pairs_of(golds, "n").withColumnRenamed("_pairs", "_gp")
    joined = tp.crossJoin(F.broadcast(pp)).crossJoin(F.broadcast(gp))
    ppm = "CAST(1000000 AS DECIMAL(38,0))"
    return joined.select(
        F.col("_tp").cast("bigint").alias("tp_pairs"),
        (F.col("_pp") - F.col("_tp")).cast("bigint").alias("fp_pairs"),
        (F.col("_gp") - F.col("_tp")).cast("bigint").alias("fn_pairs"),
        F.when(
            F.col("_pp") > 0,
            F.expr(f"CAST((_tp * {ppm}) div _pp AS BIGINT)"),
        ).alias("precision_ppm"),
        F.when(
            F.col("_gp") > 0,
            F.expr(f"CAST((_tp * {ppm}) div _gp AS BIGINT)"),
        ).alias("recall_ppm"),
        F.when(
            (F.col("_pp") + F.col("_gp")) > 0,
            F.expr(
                f"CAST((2 * _tp * {ppm}) div (_pp + _gp) AS BIGINT)"
            ),
        ).alias("f1_ppm"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a: str = "label_a",
    rater_b: str = "label_b",
) -> DataFrame:
    """Cohen's kappa — chance-corrected inter-annotator agreement
    (Cohen, Educ. Psychol. Meas. 1960), the acceptance gate for any
    labeling/judging campaign that feeds the quality classifier: one
    row ``(n, n_agree, kappa_ppm)`` where

      kappa = (N * sum_k d_k - sum_k r_k * c_k)
            / (N^2        - sum_k r_k * c_k)

    with d_k the diagonal (agreement) counts, r_k / c_k the raters'
    marginals — the exact-rational form of (p_o - p_e) / (1 - p_e), so
    every operand is an exact BIGINT/DECIMAL(38,0) and kappa lands as
    integer-div ppm (hash-gateable; negative for worse-than-chance —
    ppm is SIGNED). NULL on the degenerate 1 - p_e = 0 (both raters
    constant and identical marginals: agreement is all chance).
    Rows with a NULL label on either side are excluded.

    Scale: one (a, b) contingency groupBy (map-side-combinable) + two
    label-sized marginal aggregates joined on the label key — the
    label domain is bounds-sized, never the data."""
    base = df.select(
        F.col(rater_a).alias("_a"), F.col(rater_b).alias("_b")
    ).filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
    cells = base.groupBy("_a", "_b").agg(
        F.count("*").cast("bigint").alias("n")
    )
    ra = cells.groupBy("_a").agg(F.sum("n").cast("bigint").alias("r"))
    rb = cells.groupBy("_b").agg(F.sum("n").cast("bigint").alias("c"))
    chance = (
        ra.join(rb, ra["_a"] == rb["_b"])
        .select(
            (F.col("r").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)"))
            .alias("_rc")
        )
        .agg(
            F.coalesce(F.sum("_rc"), F.lit(0).cast("decimal(38,0)")).alias(
                "_pe_num"
            )
        )
    )
    totals = cells.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_total"),
        F.coalesce(
            F.sum(F.when(F.col("_a") == F.col("_b"), F.col("n"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_agree"),
    )
    joined = totals.crossJoin(F.broadcast(chance))
    dec = "CAST(n_total AS DECIMAL(38,0))"
    num = f"({dec} * CAST(n_agree AS DECIMAL(38,0)) - _pe_num)"
    den = f"({dec} * {dec} - _pe_num)"
    return joined.select(
        F.col("n_total").alias("n"),
        "n_agree",
        F.when(
            F.expr(den) != F.lit(0).cast("decimal(38,0)"),
            F.expr(
                f"CAST(({num} * CAST(1000000 AS DECIMAL(38,0))) div {den}"
                " AS BIGINT)"
            ),
        ).alias("kappa_ppm"),
    )


def ngram_overlap(
    pairs: DataFrame,
    ref_col: str = "ref",
    hyp_col: str = "hyp",
    n: int = 2,
    id_col: str | None = None,
) -> DataFrame:
    """Per-pair clipped n-gram overlap counts — the shared statistic
    under ROUGE-N (recall) and BLEU's modified n-gram precision
    (Papineni et al., ACL 2002; Lin, ACL 2004): for each (reference,
    hypothesis) text pair,

      ``matched   = sum over distinct hyp n-grams g of
                    min(count_hyp(g), count_ref(g))``  (the CLIP)
      ``hyp_total / ref_total`` = total n-gram counts per side

    as exact BIGINTs. Row-LOCAL by construction: whitespace
    tokenization, n-gram build, and the clipped intersection all run
    inside one projection (both gram arrays are LET-BOUND via the
    single-element-transform idiom, so each side tokenizes once per
    row) — no shuffle, the 100-TB shape of a corpus eval. Texts
    shorter than ``n`` tokens contribute empty gram sets (guarded:
    Spark's sequence() would otherwise count DOWN from 1 to 0). NULL
    text is an empty stream (the ngramlm convention).

    SHORT-TEXT CONTRACT (r13 verdict): the clip itself is
    O(distinct_hyp_grams x (L_hyp + L_ref)) per pair — for each
    distinct hypothesis gram, one membership scan over each gram
    array — i.e. quadratic in text length in the worst case. That is
    the right trade for its declared inputs, GENERATION-EVAL pairs
    (reference summaries/translations vs model outputs: tens to
    hundreds of tokens, where a hash-map detour through Python would
    cost more than the scans), and it parallelizes embarrassingly
    across pairs. It is NOT a document-similarity operator: feeding
    full documents (10^4+ tokens) makes single rows arbitrarily
    expensive — route document-scale overlap through the dedup family
    (n-gram Jaccard / winnowing), which shuffles gram keys instead of
    scanning row-locally. The same discipline as ``rrf_fuse``'s
    top-k-list contract: the precondition is the caller's, documented
    here because the plan cannot enforce it."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def toks(col: str) -> F.Column:
        t = F.split(F.trim(F.coalesce(F.col(col), F.lit(""))), r"\s+")
        return F.filter(t, lambda x: x != "")

    def grams(t: F.Column) -> F.Column:
        built = F.transform(
            F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        )
        return F.when(F.size(t) >= n, built).otherwise(
            F.array().cast("array<string>")
        )

    # TWO let-binding levels: the token arrays bind once (the gram
    # build references its input O(L) times — an unbound reference
    # would re-split per gram, the O(L^2) hazard), then the gram
    # arrays bind once (the clip references each side O(U) times)
    tok_struct = F.struct(
        toks(ref_col).alias("rt"), toks(hyp_col).alias("ht")
    )
    clipped = F.element_at(
        F.transform(
            F.array(tok_struct),
            lambda q: F.element_at(
                F.transform(
                    F.array(
                        F.struct(
                            grams(q["rt"]).alias("rg"),
                            grams(q["ht"]).alias("hg"),
                        )
                    ),
                    lambda p: F.struct(
                        F.aggregate(
                            F.transform(
                                F.array_distinct(p["hg"]),
                                lambda g: F.least(
                                    F.size(
                                        F.filter(p["hg"], lambda x: x == g)
                                    ),
                                    F.size(
                                        F.filter(p["rg"], lambda x: x == g)
                                    ),
                                ).cast("bigint"),
                            ),
                            F.lit(0).cast("bigint"),
                            lambda acc, v: acc + v,
                        ).alias("matched"),
                        F.size(p["hg"]).cast("bigint").alias("hyp_total"),
                        F.size(p["rg"]).cast("bigint").alias("ref_total"),
                    ),
                ),
                1,
            ),
        ),
        1,
    )
    cols = [id_col] if id_col else []
    # explode the single-element array so the struct evaluates ONCE as
    # a generated attribute: three top-level field extractions would
    # clone the whole tokenize+gram+clip tree per output column (plan
    # shows 3 copies; lambda-bound subtrees sit outside codegen's
    # subexpression elimination)
    return pairs.select(
        *cols, F.explode(F.array(clipped)).alias("_o")
    ).select(
        *cols,
        F.col("_o.matched").alias("matched"),
        F.col("_o.hyp_total").alias("hyp_total"),
        F.col("_o.ref_total").alias("ref_total"),
    )


def ngram_overlap_corpus(
    pairs: DataFrame,
    ref_col: str = "ref",
    hyp_col: str = "hyp",
    n: int = 2,
) -> DataFrame:
    """Corpus-level (micro-averaged) clipped n-gram metrics — one row
    ``(n, matched, hyp_total, ref_total, precision_ppm, recall_ppm,
    f1_ppm)``: counts summed over all pairs FIRST, then one integer
    division each (the standard corpus BLEU/ROUGE aggregation, which
    weighs pairs by length instead of averaging per-pair ratios).
    precision = matched/hyp_total (BLEU's modified n-gram precision
    leg), recall = matched/ref_total (ROUGE-N), F1 the harmonic mean —
    all integer-div ppm over exact BIGINTs, NULL on an empty
    denominator (undefined, not 0). One map-side-combinable aggregate
    over the row-local per-pair counts: no shuffle wider than three
    longs."""
    per = ngram_overlap(pairs, ref_col, hyp_col, n)
    agg = per.agg(
        F.coalesce(F.sum("matched"), F.lit(0))
        .cast("bigint")
        .alias("matched"),
        F.coalesce(F.sum("hyp_total"), F.lit(0))
        .cast("bigint")
        .alias("hyp_total"),
        F.coalesce(F.sum("ref_total"), F.lit(0))
        .cast("bigint")
        .alias("ref_total"),
    )

    def _ppm(num: str, den: str) -> F.Column:
        return F.when(
            F.col(den) > 0,
            F.expr(
                f"CAST(({num} * CAST(1000000 AS BIGINT)) div {den}"
                " AS BIGINT)"
            ),
        )

    return agg.select(
        F.lit(n).cast("int").alias("n"),
        "matched",
        "hyp_total",
        "ref_total",
        _ppm("matched", "hyp_total").alias("precision_ppm"),
        _ppm("matched", "ref_total").alias("recall_ppm"),
        F.when(
            (F.col("hyp_total") + F.col("ref_total")) > 0,
            F.expr(
                "CAST((2 * matched * CAST(1000000 AS BIGINT)) div "
                "(hyp_total + ref_total) AS BIGINT)"
            ),
        ).alias("f1_ppm"),
    )


def ngram_overlap_multi(
    pairs: DataFrame,
    ref_col: str = "ref",
    hyp_col: str = "hyp",
    ns: "tuple[int, ...]" = (1, 2),
    id_col: str | None = None,
) -> DataFrame:
    """All requested gram orders in ONE corpus pass: rows
    ``(n, matched, hyp_total, ref_total)`` per pair per ``n`` — the
    fused form of :func:`ngram_overlap` (a per-n union would rescan
    the corpus once per order; BLEU wants four). Same let-binding
    discipline: tokens bind once for every gram build, each order's
    gram arrays bind once for its clip, and the per-n structs emerge
    through one explode (row-local fan-out = len(ns)). The
    :func:`ngram_overlap` SHORT-TEXT CONTRACT applies to every
    order."""
    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"ns must be non-empty, all >= 1, got {ns}")

    def toks(col: str) -> F.Column:
        t = F.split(F.trim(F.coalesce(F.col(col), F.lit(""))), r"\s+")
        return F.filter(t, lambda x: x != "")

    def grams(t: F.Column, n: int) -> F.Column:
        built = F.transform(
            F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        )
        return F.when(F.size(t) >= n, built).otherwise(
            F.array().cast("array<string>")
        )

    def clip_struct(n: int, q: F.Column) -> F.Column:
        return F.element_at(
            F.transform(
                F.array(
                    F.struct(
                        grams(q["rt"], n).alias("rg"),
                        grams(q["ht"], n).alias("hg"),
                    )
                ),
                lambda p: F.struct(
                    F.lit(n).cast("int").alias("n"),
                    F.aggregate(
                        F.transform(
                            F.array_distinct(p["hg"]),
                            lambda g: F.least(
                                F.size(F.filter(p["hg"], lambda x: x == g)),
                                F.size(F.filter(p["rg"], lambda x: x == g)),
                            ).cast("bigint"),
                        ),
                        F.lit(0).cast("bigint"),
                        lambda acc, v: acc + v,
                    ).alias("matched"),
                    F.size(p["hg"]).cast("bigint").alias("hyp_total"),
                    F.size(p["rg"]).cast("bigint").alias("ref_total"),
                ),
            ),
            1,
        )

    tok_struct = F.struct(
        toks(ref_col).alias("rt"), toks(hyp_col).alias("ht")
    )
    per_n = F.element_at(
        F.transform(
            F.array(tok_struct),
            lambda q: F.array(*[clip_struct(n, q) for n in ns]),
        ),
        1,
    )
    cols = [id_col] if id_col else []
    return pairs.select(
        *cols, F.explode(per_n).alias("_o")
    ).select(
        *cols,
        F.col("_o.n").alias("n"),
        F.col("_o.matched").alias("matched"),
        F.col("_o.hyp_total").alias("hyp_total"),
        F.col("_o.ref_total").alias("ref_total"),
    )


def ngram_overlap_corpus_multi(
    pairs: DataFrame,
    ref_col: str = "ref",
    hyp_col: str = "hyp",
    ns: "tuple[int, ...]" = (1, 2),
) -> DataFrame:
    """Corpus-level micro-averaged metrics for every order in ``ns``
    from ONE corpus pass: per-n rows with the same columns and
    integer-div ppm semantics as :func:`ngram_overlap_corpus`; the
    only shuffle is the |ns|-key combinable groupBy."""
    per = ngram_overlap_multi(pairs, ref_col, hyp_col, ns)
    agg = per.groupBy("n").agg(
        F.coalesce(F.sum("matched"), F.lit(0))
        .cast("bigint")
        .alias("matched"),
        F.coalesce(F.sum("hyp_total"), F.lit(0))
        .cast("bigint")
        .alias("hyp_total"),
        F.coalesce(F.sum("ref_total"), F.lit(0))
        .cast("bigint")
        .alias("ref_total"),
    )

    def _ppm(num: str, den: str) -> F.Column:
        return F.when(
            F.col(den) > 0,
            F.expr(
                f"CAST(({num} * CAST(1000000 AS BIGINT)) div {den}"
                " AS BIGINT)"
            ),
        )

    return agg.select(
        "n",
        "matched",
        "hyp_total",
        "ref_total",
        _ppm("matched", "hyp_total").alias("precision_ppm"),
        _ppm("matched", "ref_total").alias("recall_ppm"),
        F.when(
            (F.col("hyp_total") + F.col("ref_total")) > 0,
            F.expr(
                "CAST((2 * matched * CAST(1000000 AS BIGINT)) div "
                "(hyp_total + ref_total) AS BIGINT)"
            ),
        ).alias("f1_ppm"),
    )
