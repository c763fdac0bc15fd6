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

__all__ = ["auc_exact", "clustering_pair_metrics", "cohens_kappa"]


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
