"""Distributed quality classifier: logistic regression trained and
applied entirely through the DataFrame API (beyond-parity; the reference
ships no model at all — its quality gating is the fixed expectation
predicates in the bronze-to-silver hop, `src/etl/bronze_to_silver.py`).

The training-data-pipeline use case: learn a document/embedding quality
model from a labeled sample, then gate or weight the full corpus with
it. Both halves are Spark-first:

- **Scoring is a pure projection** — ``sigmoid(w0 + w . x)`` built from
  LITERAL weights with ``zip_with``/``aggregate`` folds, entirely inside
  whole-stage codegen: no UDF, no shuffle, no model object on the
  executors. A 100 TB corpus scores in one map-only pass, and the same
  column composes into Structured Streaming unchanged.
- **Training is full-batch gradient descent with driver-held weights**
  (the PageRank/k-means discipline from ``graph.py``/``similarity.py``):
  each iteration is ONE job whose single collected row carries d+2
  exact BIGINT partial sums — the gradient, the log-loss, and the row
  count — so driver state is d+1 floats, never data-sized. Per-row
  gradient contributions are FLOOR-quantized to BIGINT *before* the
  sum, so the aggregate is exact integer arithmetic: bit-reproducible
  under any partitioning, any row order, any cluster size (the
  ``q_embedding_centroids`` discipline). Each iteration rebuilds the
  plan from the source frame with fresh weight literals — constant plan
  depth, no lineage growth, no checkpoint needed; at scale, persist the
  (id, features, label) projection once before the loop.

Quantization bound: a summed magnitude must stay inside BIGINT —
``n_rows * scale * max|residual * x_j| < 2**63``. With the default
``scale=10_000_000`` and unit-normalized features this holds to ~10^11
rows; raise/lower ``scale`` per corpus, it only changes the fixed-point
precision, not the algorithm.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "feature_vector",
    "logistic_score",
    "logit_margin",
    "logistic_grad",
    "logistic_train",
    "quality_gate",
    "seeded_weights",
]


def feature_vector(
    df: DataFrame, cols: list[str], out_col: str = "features"
) -> DataFrame:
    """Assemble named numeric columns into the ``array<double>`` the
    classifier consumes — the bridge from engineered features (e.g.
    ``textstats.quality_features``'s ratios) to ``logistic_train`` /
    ``logistic_score``. A pure projection; every element is cast to
    double so mixed int/float feature columns fold identically on any
    engine (and the whole vector stays SQL-restateable, unlike an
    opaque assembler object)."""
    return df.withColumn(
        out_col, F.array(*[F.col(c).cast("double") for c in cols])
    )


def _dot_literal(weights: list[float], vec_col: Column) -> Column:
    """w0 + w . x as a left-to-right fold over the feature array with
    LITERAL weights — the same deterministic fold shape the ANN oracles
    replay in SQL (each element cast to double before the multiply, so
    float32 feature columns behave identically everywhere)."""
    w = F.array(*[F.lit(float(v)) for v in weights[1:]])
    return F.lit(float(weights[0])) + F.aggregate(
        F.zip_with(w, vec_col, lambda a, b: a * b.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# Loss-clamp contract shared by logistic_grad and replay_train: p is
# clamped into [_P_EPS, 1 - _P_EPS] before the logs (unclamped, a fully
# saturated p of exactly 0.0/1.0 makes log() -> -inf, and
# floor(inf*scale).cast('long') is engine-dependent: Long.MAX non-ANSI,
# error under ANSI — ADVICE r8). |z| > _Z_CAP short-circuits to the
# clamp WITHOUT evaluating exp, because Python's math.exp raises
# OverflowError past ~709 while Java's returns inf — the guard keeps
# the two paths bit-identical on ill-conditioned data. Inside the caps
# the clamp is the identity for any p in [_P_EPS, 1-_P_EPS], so
# well-conditioned training is byte-for-byte unchanged.
_P_EPS = 1e-12
_Z_CAP = 700.0


def logistic_score(
    df: DataFrame,
    weights: list[float],
    vec_col: str = "embedding",
    out_col: str = "score",
) -> DataFrame:
    """Append ``sigmoid(w0 + w . x)`` as ``out_col`` — a pure projection
    (no shuffle, no Python; plan-pinned in test_classifier.py), so it
    composes into any pipeline stage including streaming micro-batches.
    ``weights[0]`` is the bias; ``weights[1:]`` must match the feature
    array length (mismatches surface as a null fold, so we guard)."""
    if len(weights) < 2:
        raise ValueError("weights must be [bias, w1, ..., wd]")
    z = _dot_literal(weights, F.col(vec_col))
    return df.withColumn(
        out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    )


def logit_margin(
    df: DataFrame,
    weights: list[float],
    vec_col: str = "embedding",
    out_col: str = "logit",
) -> DataFrame:
    """Append the PRE-sigmoid decision margin ``z = w0 + w . x`` — the
    cross-engine-safe scoring surface: z is a left-to-right literal
    multiply-add fold any SQL engine restates bit-exactly, while
    ``exp`` (and therefore the sigmoid) differs between Java's Math.exp
    and glibc in the last ulp on ~4% of arguments (measured in
    tests/test_classifier.py). sigmoid is strictly monotone in z, so
    every threshold/top-k/ranking semantics transfers: gate on
    ``z >= logit(t)`` instead of ``sigmoid(z) >= t``. Pure projection,
    no shuffle, no Python."""
    if len(weights) < 2:
        raise ValueError("weights must be [bias, w1, ..., wd]")
    return df.withColumn(
        out_col, _dot_literal(weights, F.col(vec_col))
    )


def logistic_grad(
    df: DataFrame,
    weights: list[float],
    dim: int,
    label_col: str = "y",
    vec_col: str = "embedding",
    scale: int = 10_000_000,
) -> tuple[list[float], float, int]:
    """One full-batch gradient job: returns ``(grad, mean_log_loss, n)``
    where ``grad`` has d+1 entries (bias first) of the UNregularized
    mean gradient ``(1/n) sum_i (sigmoid(z_i) - y_i) * [1, x_i]``.

    The job is a single map-only pass ending in a global aggregate of
    d+2 BIGINT sums — partial aggregation combines per partition and
    the exchange carries ONE row of partials per partition, so the
    shuffle is O(partitions), never O(rows). Every per-row contribution
    is floor-quantized before summing (exact integer aggregation —
    order and partitioning independent); the driver de-quantizes once.
    """
    z = _dot_literal(weights, F.col(vec_col))
    raw_p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    # clamp per the module contract (see _P_EPS/_Z_CAP above): the
    # |z| guards mirror replay_train's OverflowError avoidance and the
    # greatest/least pair is Python's max/min bit-for-bit on non-NaN
    p = (
        F.when(z < F.lit(-_Z_CAP), F.lit(_P_EPS))
        .when(z > F.lit(_Z_CAP), F.lit(1.0 - _P_EPS))
        .otherwise(
            F.least(
                F.lit(1.0 - _P_EPS), F.greatest(F.lit(_P_EPS), raw_p)
            )
        )
    )
    y = F.col(label_col).cast("double")
    resid = (p - y).alias("r")
    # per-row log-loss; p strictly inside (0,1) after the clamp, so the
    # logs are always finite and the floor-quantization stays exact
    loss = -(y * F.log(p) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p))

    def q(c: Column) -> Column:
        return F.floor(c * F.lit(float(scale))).cast("long")

    base = df.select(
        resid,
        loss.alias("l"),
        *[
            F.col(vec_col)[j].cast("double").alias(f"x{j}")
            for j in range(dim)
        ],
    )
    row = base.agg(
        F.sum(q(F.col("r"))).alias("g0"),
        *[
            F.sum(q(F.col("r") * F.col(f"x{j}"))).alias(f"g{j + 1}")
            for j in range(dim)
        ],
        F.sum(q(F.col("l"))).alias("loss_q"),
        F.count("*").alias("n"),
    ).collect()[0]  # driver-ok: one row of d+2 scalars, never data-sized
    n = int(row["n"])
    if n == 0:
        raise ValueError("cannot take a gradient over an empty frame")
    grad = [
        int(row[f"g{j}"]) / float(scale) / n for j in range(dim + 1)
    ]
    mean_loss = int(row["loss_q"]) / float(scale) / n
    return grad, mean_loss, n


def logistic_train(
    df: DataFrame,
    dim: int,
    label_col: str = "y",
    vec_col: str = "embedding",
    lr: float = 1.0,
    l2: float = 0.0,
    iters: int = 20,
    scale: int = 10_000_000,
) -> tuple[list[float], list[float]]:
    """Full-batch gradient-descent training; returns ``(weights,
    loss_history)`` with ``weights = [bias, w1..wd]``.

    Deterministic end-to-end: zero init, exact quantized gradient sums
    (see :func:`logistic_grad`), float64 driver updates — two runs on
    the same data produce bit-identical weights whatever the
    partitioning (differential-pinned against a pure-Python replay in
    test_classifier.py). L2 regularization is applied driver-side to
    the mean gradient (bias excluded, the standard convention).

    Scale: ``iters`` scans of the (label, features) projection — at
    100 TB persist that projection once before calling; driver memory
    is d+1 floats and the per-iteration collect is one row.

    Conditioning: plain GD needs features of comparable O(1) magnitude
    — center/scale engineered features (a raw ``mean_token_len ~ 4.5``
    next to ratios ~0.1 stalls or diverges at useful learning rates;
    measured in the documents integration test). ``feature_vector``
    composes with any projection, so the scaling is one withColumn."""
    w = [0.0] * (dim + 1)
    history: list[float] = []
    for _ in range(iters):
        grad, loss, _n = logistic_grad(
            df, w, dim, label_col=label_col, vec_col=vec_col, scale=scale
        )
        history.append(loss)
        w = [
            wj - lr * (gj + (l2 * wj if j > 0 else 0.0))
            for j, (wj, gj) in enumerate(zip(w, grad))
        ]
    return w, history


def quality_gate(
    df: DataFrame,
    weights: list[float],
    threshold: float = 0.5,
    vec_col: str = "embedding",
    keep_score: bool = True,
) -> DataFrame:
    """Corpus gate: keep rows whose quality score clears ``threshold``.
    Still a pure projection + filter (predicate-pushdown friendly when
    the score feeds a downstream scan); drop the score column with
    ``keep_score=False`` when only the gate matters."""
    scored = logistic_score(df, weights, vec_col=vec_col, out_col="score")
    gated = scored.filter(F.col("score") >= F.lit(float(threshold)))
    return gated if keep_score else gated.drop("score")


def seeded_weights(dim: int, seed: int = 11) -> list[float]:
    """Data-independent deterministic weights (bias first) in
    [-0.5, 0.5] — the ``pq_codebooks``/``ivf_centroids`` pattern: a
    fixed literal model an external SQL oracle can embed verbatim, for
    driver-gated scoring queries where training (a driver loop) is not
    SQL-expressible. splitmix64-style integer hash, no RNG state."""
    out = []
    x = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(dim + 1):
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z ^= z >> 31
        # 53-bit mantissa slice -> exact float64 in [0, 1), then center
        out.append((z >> 11) / float(1 << 53) - 0.5)
    return out


def replay_train(
    rows: list[tuple[int, list[float]]],
    dim: int,
    lr: float = 1.0,
    l2: float = 0.0,
    iters: int = 20,
    scale: int = 10_000_000,
) -> tuple[list[float], list[float]]:
    """Pure-Python single-process replay of :func:`logistic_train` for
    differential tests: same left-to-right fold per row, same floor
    quantization, same integer sums, same float64 updates — the two
    must agree BIT-FOR-BIT, which is what makes the distributed path's
    determinism claim checkable rather than asserted."""
    w = [0.0] * (dim + 1)
    history: list[float] = []
    for _ in range(iters):
        g = [0] * (dim + 1)
        lq = 0
        n = 0
        for y, x in rows:
            acc = 0.0
            for j in range(dim):
                acc = acc + w[j + 1] * float(x[j])
            z = w[0] + acc
            if z < -_Z_CAP:
                p = _P_EPS
            elif z > _Z_CAP:
                p = 1.0 - _P_EPS
            else:
                p = 1.0 / (1.0 + math.exp(-z))
                p = min(1.0 - _P_EPS, max(_P_EPS, p))
            r = p - float(y)
            loss = -(
                float(y) * math.log(p)
                + (1.0 - float(y)) * math.log(1.0 - p)
            )
            g[0] += math.floor(r * scale)
            for j in range(dim):
                g[j + 1] += math.floor(r * float(x[j]) * scale)
            lq += math.floor(loss * scale)
            n += 1
        grad = [gj / float(scale) / n for gj in g]
        history.append(lq / float(scale) / n)
        w = [
            wj - lr * (gj + (l2 * wj if j > 0 else 0.0))
            for j, (wj, gj) in enumerate(zip(w, grad))
        ]
    return w, history
