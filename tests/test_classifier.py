"""Distributed logistic-regression quality classifier: differential
bit-identity vs a pure-Python replay, partitioning invariance, learning
on separable data, scoring parity, and plan shape (projection-only
scoring, one-row gradient collects)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StructField,
    StructType,
)

from asterlake.operators.classifier import (
    logistic_grad,
    logistic_score,
    logistic_train,
    quality_gate,
    replay_train,
    seeded_weights,
)

DIM = 6


def _rows(n: int, seed: int = 3) -> list[tuple[int, list[float]]]:
    """Deterministic labeled sample: features from an integer hash in
    [-1, 1], label from a TRUE hyperplane + a band of flipped labels so
    the problem is learnable but not trivially separable."""
    true_w = [0.3, -0.9, 0.5, 0.1, -0.4, 0.7]
    out = []
    for i in range(n):
        x = []
        for j in range(DIM):
            h = (i * 1_000_003 + j * 7919 + seed) % 2_000_000
            x.append(float((h / 1_000_000.0) - 1.0))
        z = sum(w * v for w, v in zip(true_w, x)) - 0.05
        y = 1 if z > 0 else 0
        if i % 17 == 0:  # label noise
            y = 1 - y
        # float32 feature column, as the embeddings table ships
        out.append((y, [float(f"{v:.6g}") for v in x]))
    return out


@pytest.fixture(scope="module")
def labeled(spark):
    schema = StructType(
        [
            StructField("y", IntegerType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    return spark.createDataFrame(_rows(400), schema).cache()


def _f32(rows):
    """The exact float64 values Spark sees after the float32 cast."""
    import numpy as np

    return [
        (y, [float(np.float32(v)) for v in x]) for y, x in rows
    ]


def test_train_matches_python_replay_bitwise(spark, labeled):
    """The determinism claim is checkable, not asserted: distributed
    training and the single-process replay share the fold order, the
    floor quantization, and the float64 update rule, so the weights
    must agree BIT-FOR-BIT after every iteration."""
    w_spark, hist_spark = logistic_train(
        labeled, DIM, lr=0.8, l2=0.01, iters=8
    )
    w_py, hist_py = replay_train(
        _f32(_rows(400)), DIM, lr=0.8, l2=0.01, iters=8
    )
    assert w_spark == w_py
    assert hist_spark == hist_py


def test_train_is_partitioning_invariant(spark, labeled):
    """Exact integer gradient sums commute: 1-partition and 13-partition
    runs produce identical bits (the floor-quantize-then-sum discipline;
    a float sum would drift with the combine order)."""
    a, _ = logistic_train(labeled.coalesce(1), DIM, lr=0.5, iters=5)
    b, _ = logistic_train(labeled.repartition(13), DIM, lr=0.5, iters=5)
    assert a == b


def test_loss_decreases_and_model_learns(spark, labeled):
    """On hyperplane-generated labels, gradient descent must actually
    optimize: the loss history falls, and accuracy against the noisy
    labels clears 85% (the 1-in-17 flipped band caps it below 100%)."""
    w, hist = logistic_train(labeled, DIM, lr=1.0, iters=25)
    assert hist[-1] < hist[0] * 0.7
    scored = logistic_score(labeled, w)
    acc = (
        scored.select(
            (
                (F.col("score") >= 0.5).cast("int") == F.col("y")
            ).cast("int").alias("ok")
        ).agg(F.avg("ok")).collect()[0][0]
    )
    assert acc > 0.85, acc


def test_score_matches_python_sigmoid(spark, labeled):
    """Scoring parity: the LOGIT (fold of multiply-adds) is bit-exact
    vs the same-order Python computation; the full sigmoid is equal to
    within a couple of ulps — Java's Math.exp and glibc's expm1 family
    legitimately differ in the last bit for some arguments (measured:
    ~4% of rows here), which is exactly why downstream oracles and the
    training loop gate on quantized or exp-free quantities, never raw
    transcendental doubles. Keyed by the full feature tuple so row
    order never enters the comparison."""
    w = seeded_weights(DIM, seed=11)
    df = logistic_score(labeled, w)
    # exp-free half: the logit itself must match bit-for-bit
    from asterlake.operators.classifier import _dot_literal

    got_z = {
        tuple(r.embedding): r.z
        for r in labeled.select(
            "embedding", _dot_literal(w, F.col("embedding")).alias("z")
        ).collect()
    }
    got = {tuple(r.embedding): r.score for r in df.collect()}
    n_exact = 0
    for _y, x in _f32(_rows(400)):
        acc = 0.0
        for j in range(DIM):
            acc = acc + w[j + 1] * x[j]
        z = w[0] + acc
        assert got_z[tuple(x)] == z  # bit-exact, no transcendentals
        s = 1.0 / (1.0 + math.exp(-z))
        assert abs(got[tuple(x)] - s) < 5e-16, (x, got[tuple(x)], s)
        n_exact += got[tuple(x)] == s
    assert n_exact > 300  # the libm gap is last-ulp rare, not systemic


def test_quality_gate_threshold_semantics(spark, labeled):
    w = seeded_weights(DIM, seed=11)
    scored = logistic_score(labeled, w).collect()
    want_kept = sorted(
        (r.y, tuple(r.embedding)) for r in scored if r.score >= 0.5
    )
    kept = quality_gate(labeled, w, threshold=0.5)
    got = sorted((r.y, tuple(r.embedding)) for r in kept.collect())
    assert got == want_kept
    assert "score" not in quality_gate(
        labeled, w, keep_score=False
    ).columns


def test_grad_empty_frame_fails_loudly(spark, labeled):
    with pytest.raises(ValueError, match="empty frame"):
        logistic_grad(
            labeled.filter(F.lit(False)), [0.0] * (DIM + 1), DIM
        )
    with pytest.raises(ValueError, match="bias"):
        logistic_score(labeled, [0.0])


def test_seeded_weights_deterministic_and_bounded():
    a = seeded_weights(16, seed=5)
    assert a == seeded_weights(16, seed=5)
    assert a != seeded_weights(16, seed=6)
    assert len(a) == 17
    assert all(-0.5 <= v < 0.5 for v in a)


def test_score_plan_is_projection_only(spark, labeled):
    """100 TB pin: scoring adds NO exchange and NO Python — the plan of
    source -> score must be a pure whole-stage projection."""
    plan = logistic_score(
        labeled, seeded_weights(DIM)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_grad_plan_shuffles_one_partial_row(spark, labeled):
    """The gradient job's only exchange is the global-aggregate
    SinglePartition hop of pre-combined partials (one row per
    partition), and the whole pass stays JVM-side."""
    from asterlake.operators.classifier import _dot_literal  # noqa: F401

    p = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(
            -(
                F.lit(0.0)
                + F.aggregate(
                    F.zip_with(
                        F.array(*[F.lit(0.1)] * DIM),
                        F.col("embedding"),
                        lambda a, b: a * b.cast("double"),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            )
        )
    )
    base = labeled.select(
        (p - F.col("y").cast("double")).alias("r"),
        *[
            F.col("embedding")[j].cast("double").alias(f"x{j}")
            for j in range(DIM)
        ],
    )
    agg = base.agg(
        F.sum(
            F.floor(F.col("r") * F.lit(1e7)).cast("long")
        ).alias("g0"),
        F.count("*").alias("n"),
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "partial" in plan.lower()  # map-side combine before the hop
    assert "SinglePartition" in plan
    assert "BatchEvalPython" not in plan


def test_quality_gate_on_real_documents(spark, sf_dir):
    """End-to-end training-data-pipeline composition on the REAL
    documents table: quality_features -> feature_vector ->
    logistic_train -> gate. The target is a length rule the engineered
    features determine (n_chars >= median follows from token count x
    token length), so gradient descent must recover it nearly exactly
    — pinning that the classifier learns from engineered text
    features, not just embeddings, with the scale discipline the
    docstring prescribes (center/scale features to O(1) before GD; the
    synthetic corpus's lang labels are NOT feature-determined — its
    stopword ratios are identical across langs — so a language gate
    would only pin noise)."""
    from asterlake.operators.classifier import feature_vector
    from asterlake.operators.textstats import quality_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    median_chars = docs.agg(
        F.expr("percentile(n_chars, 0.5)")
    ).collect()[0][0]
    feats = quality_features(docs).select(
        "doc_id",
        (F.col("n_tokens").cast("double") / 64.0).alias("f_tokens"),
        (F.col("mean_token_len") - 4.5).alias("f_len"),
        "distinct_ratio",
        "stopword_ratio",
    )
    cols = ["f_tokens", "f_len", "distinct_ratio", "stopword_ratio"]
    labeled = (
        feature_vector(feats, cols)
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .select(
            (F.col("n_chars") >= F.lit(float(median_chars)))
            .cast("int")
            .alias("y"),
            "features",
        )
        .persist()
    )
    w, hist = logistic_train(
        labeled, dim=len(cols), vec_col="features", lr=1.0, iters=40
    )
    assert hist[-1] < hist[0] * 0.8
    acc = (
        logistic_score(labeled, w, vec_col="features")
        .select(
            ((F.col("score") >= 0.5).cast("int") == F.col("y"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .collect()[0][0]
    )
    assert acc > 0.9, acc
    labeled.unpersist()


def test_saturated_features_stay_finite_and_bit_identical(spark):
    """Ill-conditioned (unscaled) features drive |z| far past the float64
    exp range. Unclamped, log(p) hits -inf (engine-dependent once
    floor-quantized) and the Python replay raises OverflowError at
    math.exp — ADVICE r8. With the shared clamp both paths stay finite
    AND bit-for-bit identical, including the saturated rows."""
    schema = StructType(
        [
            StructField("y", IntegerType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    # one hugely positive z, one hugely negative, plus normal rows
    rows = [
        (0, [1e6] * DIM),  # z >> +700 with positive weights
        (1, [-1e6] * DIM),  # z << -700: raw math.exp would overflow
        (1, [0.5] * DIM),
        (0, [-0.25] * DIM),
    ]
    df = spark.createDataFrame(rows, schema)
    w0 = [0.1] + [0.2] * DIM
    grad, loss, n = logistic_grad(df, w0, DIM)
    assert n == 4
    assert all(math.isfinite(g) for g in grad)
    assert math.isfinite(loss) and loss > 0.0

    # full training differential on the same ill-conditioned frame
    w_spark, hist_spark = logistic_train(df, DIM, iters=5, lr=0.1)
    w_py, hist_py = replay_train(
        [(y, x) for y, x in rows], DIM, iters=5, lr=0.1
    )
    assert w_spark == w_py  # bit-for-bit, saturation included
    assert hist_spark == hist_py
    assert all(math.isfinite(v) for v in w_spark + hist_spark)
