"""Embedding similarity search (beyond-parity: ANN over array<float>).

Three tiers, all built-in-expression compositions (no Python UDFs):

- **Brute-force top-k** — exact cosine against a query vector; the baseline
  and the within-bucket scorer for the approximate tiers.
- **SRP-LSH buckets** — signed-random-projection signatures (sign of dot
  with fixed ±1 hyperplanes) bucket similar vectors together; candidate
  generation becomes an equi-join on the bucket key (same shape as the
  MinHash LSH join in dedup.py).
- **IVF assignment** — nearest-centroid inverted-file partitioning; the
  centroids arrive as a plain Python list (from spark.ml KMeans, a sample,
  or a fixed codebook), are embedded as a literal/broadcast, and probing a
  query touches only its cell.

Precision discipline: every dot product is an explicit left-to-right fold
in DOUBLE over float-casted elements (``zip_with`` + ``aggregate``). This is
bit-identical to the DuckDB oracle's ``list_sum(list_transform(...))`` fold —
unlike DuckDB's builtin ``list_dot_product``, which accumulates in FLOAT and
diverges in the 8th digit.

Scale (100 TB of embeddings):
- brute-force top-k against one query is a map + TakeOrderedAndProject —
  no shuffle at all; against a query *batch* it's a broadcast nested-loop
  over the batch, still shuffle-free.
- SRP/IVF turn all-pairs search into per-bucket joins; bucket keys are
  tiny strings/ints, and skewed buckets split under AQE.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_double(a: Column, b: Column) -> Column:
    """Exact-order double fold of the element products (see module doc)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    # try_divide: an all-zero vector (failed encode — they happen in real
    # embedding pipelines) has zero norm; its similarity is NULL (sorts
    # last under any top-k) instead of ANSI-crashing the whole scan.
    # DuckDB oracles compute the same NULL on zero division.
    return F.try_divide(
        dot_double(a, b),
        F.sqrt(dot_double(a, a)) * F.sqrt(dot_double(b, b)),
    )


def topk_cosine(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a 1-row query DataFrame.

    The query side is broadcast (it is one row); the big side is scanned
    once, scored map-side, and reduced with TakeOrderedAndProject — the
    plan you want at any scale.
    """
    q = F.broadcast(query.select(F.col(vec_col).alias("_qvec")))
    scored = vectors.crossJoin(q).select(
        id_col, cosine(F.col(vec_col), F.col("_qvec")).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), id_col).limit(k)


def srp_hyperplanes(n_planes: int = 12, dim: int = 64, seed: int = 42) -> list[list[int]]:
    """Deterministic ±1 hyperplanes (seeded) — shared with the SQL oracle."""
    rng = np.random.RandomState(seed)
    return (rng.randint(0, 2, size=(n_planes, dim)) * 2 - 1).tolist()


def srp_signature(vec_col: Column, hyperplanes: list[list[int]]) -> Column:
    """Bit-string SRP bucket key: bit_i = sign(dot(h_i, v))."""
    h_lit = F.array(
        *[F.array(*[F.lit(int(x)) for x in row]) for row in hyperplanes]
    )
    return F.array_join(
        F.transform(
            h_lit,
            lambda h: F.when(
                F.aggregate(
                    F.zip_with(h, vec_col, lambda x, y: x * y.cast("double")),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                >= 0,
                "1",
            ).otherwise("0"),
        ),
        "",
    )


def srp_bucket(
    vectors: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucket each vector by its SRP signature.

    ``dim`` is an explicit parameter: array columns carry no length in the
    schema and inferring it would mean a driver-side collect inside a
    library operator (a job launched from plan-construction code — the
    anti-pattern this module otherwise bans)."""
    planes = srp_hyperplanes(n_planes, dim, seed)
    return vectors.select(
        id_col, srp_signature(F.col(vec_col), planes).alias("bucket")
    )


def ivf_centroids(k: int = 8, dim: int = 64, seed: int = 7) -> list[list[float]]:
    """Fixed unit-norm codebook (seeded) for deterministic IVF demos/tests.
    Production path: fit with spark.ml KMeans and pass the centers here."""
    rng = np.random.RandomState(seed)
    c = rng.randn(k, dim)
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    return [[float(x) for x in row] for row in c]


def centroid_argmax(
    centroids: list[list[float]], vec_col: str = "embedding"
) -> Column:
    """Max-dot centroid index for ``vec_col`` against a LITERAL codebook
    — a pure projection column (argmax over k fold-dots), no shuffle, no
    UDF; ties break to the lower centroid id. With unit-norm centroids
    max-dot == max-cosine. The assignment expression shared by
    :func:`ivf_assign` and :func:`semantic_dedup`'s blocking key."""
    c_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in centroids]
    )
    scores = F.transform(
        c_lit,
        lambda c: F.aggregate(
            F.zip_with(c, F.col(vec_col), lambda x, y: x * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    # argmax via array_position(max); first match => lowest id on ties
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def ivf_assign(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (IVF cell).

    The codebook is a literal array-of-arrays — broadcast by value inside
    the plan; assignment is a pure projection (argmax over k fold-dots),
    no shuffle, no UDF. Ties break to the lower centroid id.
    """
    return vectors.select(
        id_col,
        centroid_argmax(centroids, vec_col).alias("centroid_id"),
    )


def ivf_probe_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    nprobe: int = 2,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Full two-stage IVF search: probe the `nprobe` best cells per query,
    score only the vectors assigned to those cells, keep the top-k.

    Scale shape: the vector side is assigned to cells as a pure projection
    (``ivf_assign``, no shuffle); the query side — always the small side —
    is broadcast after exploding its probe list, so candidate generation is
    a broadcast hash join on `centroid_id` touching ~nprobe/k_cells of the
    corpus. The final per-query top-k is one shuffle on the query id.
    Ties break deterministically (higher cosine, then lower vector id; probe
    order by score desc then lower cell id).
    """
    c_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in centroids]
    )

    def cell_scores(vec: Column) -> Column:
        return F.transform(
            c_lit,
            lambda c: F.aggregate(
                F.zip_with(c, vec, lambda x, y: x * y.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )

    assigned = vectors.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        (
            F.array_position(
                cell_scores(F.col(vec_col)),
                F.array_max(cell_scores(F.col(vec_col))),
            )
            - 1
        )
        .cast("int")
        .alias("centroid_id"),
    )
    # top-nprobe cells per query: sort (−score, cell) structs — the double
    # negation is exact, so ordering matches a desc-by-score rank
    probe_structs = F.slice(
        F.array_sort(
            F.transform(
                cell_scores(F.col(vec_col)),
                lambda s, i: F.struct(
                    (-s).alias("neg"), i.cast("int").alias("cid")
                ),
            )
        ),
        1,
        nprobe,
    )
    probes = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_q"),
        F.explode(probe_structs).alias("_p"),
    ).select(query_id_col, "_q", F.col("_p.cid").alias("centroid_id"))

    cand = assigned.join(F.broadcast(probes), "centroid_id").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = cand.select(
        query_id_col,
        F.col(id_col),
        cosine(F.col("_v"), F.col("_q")).alias("cosine"),
    )
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy(query_id_col).orderBy(
            F.col("cosine").desc(), F.col(id_col)
        )
    )
    return (
        scored.withColumn("_rk", rk).filter(F.col("_rk") <= k).drop("_rk")
    )


def normalize_quantize(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 127.0,
) -> DataFrame:
    """Embedding preprocessing: L2 norm, unit vector, int8-style quantized
    vector — the storage/compute prep step every large ANN index runs.

    The norm fold is O(dim); referencing it inside a per-element lambda
    would re-execute it per element after CollapseProject (O(dim^2)/row).
    ``array_repeat(norm, dim)`` evaluates the fold ONCE per referencing
    column and ``zip_with`` pairs each element with its copy — 3 fold
    evaluations per row total (norm/unit/q8) instead of 2*dim+1.

    Quantization truncates toward zero (int cast), not rounds — engines
    disagree on double half-rounding but agree on trunc. Zero vectors
    yield NULL elements (nullif guards the division) rather than NaN,
    which no two engines hash alike.
    """
    norm = F.sqrt(dot_double(F.col(vec_col), F.col(vec_col)))
    norm_arr = F.array_repeat(F.nullif(norm, F.lit(0.0)), F.size(F.col(vec_col)))
    unit = F.zip_with(F.col(vec_col), norm_arr, lambda x, n: x.cast("double") / n)
    q8 = F.zip_with(
        F.col(vec_col),
        norm_arr,
        lambda x, n: (x.cast("double") * F.lit(scale) / n).cast("int"),
    )
    return vectors.select(
        F.col(id_col),
        norm.alias("l2_norm"),
        unit.alias("unit"),
        q8.alias("q8"),
    )


def blocked_neighbor_pairs(
    vectors: DataFrame,
    block_col: str | Column,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block_rows: int | None = None,
) -> DataFrame:
    """All pairs with cosine >= threshold *within a blocking key* (label,
    SRP bucket, IVF cell, ...). The join explodes only within blocks —
    the standard way to keep near-dup search sub-quadratic.

    ``block_col`` may be a computed Column, so the engine's own bucketing
    operators compose directly as the blocking key — e.g.
    ``srp_signature(F.col('embedding'), planes)`` gives 2^n_planes
    content-derived blocks instead of trusting a data column's cardinality.

    Work is O(block_size^2) *within* a block, so a degenerate hot block
    (one dominant label) is the scale hazard. ``max_block_rows`` bounds it:
    each block keeps at most that many rows (deterministic survivor set,
    ranked by xxhash64 of the id — content-independent, stable across runs
    and partitionings), capping per-block work at O(cap^2). The cap is a
    recall trade (pairs involving dropped rows are lost), exactly the
    bounded-candidate policy every production LSH dedup ships; leave it
    None for exact within-block semantics. The rank adds no extra
    exchange beyond the join's own shuffle on the block key."""
    # self-norms are per-VECTOR, not per-pair: compute sqrt(dot(v,v)) once
    # before the join (n folds) instead of inside it (n^2 folds) — same
    # arithmetic, same values, 3x fewer fold-dots per pair
    blk = F.col(block_col) if isinstance(block_col, str) else block_col
    with_norm = vectors.select(
        F.col(id_col),
        blk.alias("_blk"),
        F.col(vec_col).alias("_v"),
        F.sqrt(dot_double(F.col(vec_col), F.col(vec_col))).alias("_norm"),
    )
    if max_block_rows is not None:
        from pyspark.sql import Window

        rk = F.row_number().over(
            Window.partitionBy("_blk").orderBy(F.xxhash64(F.col(id_col)))
        )
        with_norm = (
            with_norm.withColumn("_rk", rk)
            .filter(F.col("_rk") <= max_block_rows)
            .drop("_rk")
        )
    a = with_norm.select(
        F.col(id_col).alias("vec_a"),
        "_blk",
        F.col("_v").alias("_va"),
        F.col("_norm").alias("_na"),
    )
    b = with_norm.select(
        F.col(id_col).alias("vec_b"),
        "_blk",
        F.col("_v").alias("_vb"),
        F.col("_norm").alias("_nb"),
    )
    return (
        a.join(b, "_blk")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            (
                dot_double(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def kmeans_step(
    vectors: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    scale: int = 10_000_000,
) -> DataFrame:
    """One Lloyd iteration of k-means over an embedding column: assign
    each vector to its max-cosine centroid (the same literal-codebook
    argmax projection as :func:`ivf_assign`, inlined so no join is
    needed), then recompute each cell's mean vector.

    Returns long form (centroid_id, dim, centroid, n_members) — the
    refreshed codebook rows ``collect``ed by a driver-side training loop
    (k x dim values, never data-sized). Mean arithmetic is FLOOR
    1e-7-quantized exact BIGINT sums (tie-free, order/partitioning
    independent — the q_embedding_centroids discipline), so an iteration
    is bit-reproducible on any engine.

    Scale: assignment is a pure projection (no shuffle); the explode
    emits rows x dims but the single shuffle carries only (cell, dim)
    integer partial sums — k x dim cells with map-side combine. This is
    the distributed EM step behind IVF codebook training; iterate by
    feeding the output back in as the next codebook.
    """
    c_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in centroids]
    )
    scores = F.transform(
        c_lit,
        lambda c: F.aggregate(
            F.zip_with(c, F.col(vec_col), lambda x, y: x * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    assigned = vectors.select(
        (F.array_position(scores, F.array_max(scores)) - 1)
        .cast("int")
        .alias("centroid_id"),
        F.col(vec_col),
    )
    ex = assigned.select(
        "centroid_id", F.posexplode(vec_col).alias("dim0", "val")
    )
    q = F.floor(F.col("val").cast("double") * F.lit(float(scale))).cast("long")
    return (
        ex.groupBy(
            "centroid_id", (F.col("dim0") + F.lit(1)).cast("int").alias("dim")
        )
        .agg(
            (
                F.sum(q).cast("double")
                / F.count("*").cast("double")
                / F.lit(float(scale))
            ).alias("centroid"),
            F.count("*").cast("bigint").alias("n_members"),
        )
    )


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    dim: int = 64,
    iters: int = 5,
    seed: int = 7,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Train an IVF codebook: seeded unit-norm init + ``iters`` SPHERICAL
    k-means iterations — :func:`kmeans_step` means, then an L2
    renormalization of each centroid (cosine assignment needs unit-norm
    centroids; the raw mean shrinks in norm and would degrade the
    max-dot objective). Per round the driver collects only k x dim
    centroid values (never data-sized); a cell that loses all its members
    keeps its previous centroid (standard empty-cluster policy).
    Deterministic end-to-end: seeded init + bit-reproducible steps +
    driver-side float64 normalization."""
    centroids = ivf_centroids(k=k, dim=dim, seed=seed)
    for _ in range(iters):
        rows = kmeans_step(
            vectors, centroids, vec_col=vec_col
        ).collect()  # driver-ok: k x dim model state, never data-sized
        nxt = [list(c) for c in centroids]
        for r in rows:
            nxt[r.centroid_id][r.dim - 1] = r.centroid
        arr = np.asarray(nxt, dtype=np.float64)
        norms = np.linalg.norm(arr, axis=1, keepdims=True)
        arr = np.where(norms > 0, arr / np.where(norms == 0, 1.0, norms), arr)
        centroids = [[float(x) for x in row] for row in arr]
    return centroids


def gram_mean_count(
    vectors: DataFrame, dim: int, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, int]:
    """Distributed second-moment statistics: returns (G, s, n) with
    ``G = X^T X`` (d x d), ``s = column sums`` (d), ``n = rows``.

    The scale-correct shape for distributed linear algebra over tall-thin
    data: each Arrow batch contributes ONE d x d float64 partial (a local
    BLAS ``X^T X``), so the driver collects n_partitions * d^2 doubles —
    model-sized, never data-sized — and the fact never shuffles at all.
    This is the same tree-aggregation layout spark.ml uses for its
    covariance/PCA summarizers."""
    import pandas as pd

    def part(batches):
        G = np.zeros((dim, dim))
        s = np.zeros(dim)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            G += X.T @ X
            s += X.sum(axis=0)
            n += len(X)
        yield pd.DataFrame(
            {"g": [G.ravel().tolist()], "s": [s.tolist()], "n": [n]}
        )

    rows = (
        vectors.select(vec_col)
        .mapInPandas(part, schema="g array<double>, s array<double>, n long")
        .collect()  # driver-ok: n_partitions x d^2 model state, never data-sized
    )
    G = np.zeros((dim, dim))
    s = np.zeros(dim)
    n = 0
    for r in rows:
        G += np.asarray(r.g, dtype=np.float64).reshape(dim, dim)
        s += np.asarray(r.s, dtype=np.float64)
        n += int(r.n)
    return G, s, n


def pca_fit(
    vectors: DataFrame,
    dim: int,
    k: int = 2,
    vec_col: str = "embedding",
) -> tuple[np.ndarray, list[np.ndarray], list[float], float]:
    """Fit a PCA model: returns ``(mu, components, eigenvalues,
    total_variance)``.

    One distributed pass builds the covariance from the Gram/mean
    partials (:func:`gram_mean_count`); the d x d eigenproblem solves on
    the driver (``numpy.linalg.eigh`` — d is the embedding width, tiny).
    Component signs are fixed deterministically (largest-|coefficient|
    entry made positive) since eigenvectors are sign-ambiguous.
    Eigenvalues come back largest-first, paired with the components.
    The fourth element is ``trace(C)`` (total variance), for
    explained-variance accounting and the :func:`pca_verify` gate."""
    G, s, n = gram_mean_count(vectors, dim, vec_col)
    if n == 0:
        raise ValueError("pca_fit needs at least one vector")
    mu = s / n
    cov = G / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    comps = []
    eigs = []
    for i in range(1, k + 1):
        v = vecs[:, -i]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append(v)
        eigs.append(float(vals[-i]))
    return mu, comps, eigs, float(np.trace(cov))


def _centered(mu: np.ndarray, vec_col: str) -> Column:
    return F.transform(
        F.col(vec_col),
        lambda x, i: x.cast("double")
        - F.element_at(F.lit([float(m) for m in mu]), i + 1),
    )


def pca_project(
    vectors: DataFrame,
    dim: int,
    k: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project embeddings onto their top-``k`` principal components.

    :func:`pca_fit` produces the model; the components broadcast back as
    plan literals, so the projection itself is a pure JVM-side fold per
    row (``dot_double``), shuffle-free.

    Output: ``(id_col, pc1 .. pck)`` doubles. Not SQL-expressible (the
    eigensolve is iterative) — the driver-gateable form is
    :func:`pca_verify`; accuracy is additionally pinned by
    tests/test_similarity.py against a direct numpy PCA."""
    mu, comps, _, _ = pca_fit(vectors, dim, k, vec_col)
    centered = _centered(mu, vec_col)
    cols = [
        dot_double(centered, F.lit([float(x) for x in comp])).alias(
            f"pc{i}"
        )
        for i, comp in enumerate(comps, 1)
    ]
    return vectors.select(F.col(id_col), *cols)


def pca_verify(
    vectors: DataFrame,
    dim: int,
    k: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rel_tol: float = 1e-6,
    _model: tuple | None = None,
) -> DataFrame:
    """PCA with an in-plan CHECKABLE contract (the ``q_sketch_distinct``
    pattern): per-row and corpus-level boolean invariants of a correct
    PCA, stated so a SQL oracle can assert them as TRUE literals.

    The eigensolve itself is not SQL-expressible, but its *defining
    properties* are decidable from the projected scores alone, and every
    score here is recomputed IN-PLAN from the raw vectors (the same
    literal-broadcast fold :func:`pca_project` uses), independently of
    the numpy path that produced the model. Emitted per input row:

    - ``recon_ok`` — Bessel: sum(pc_i^2) <= ||x - mu||^2 for that row
      (orthonormal projections cannot exceed the centered norm).
    - ``mean_zero_ok`` — every score column's mean is ~0: centering
      actually happened in-plan.
    - ``var_match_ok`` — in-plan score variance matches the model
      eigenvalue per component: for any unit v, var(Xv) = v'Cv with the
      TRUE covariance of the data, so a wrong Gram partial, a wrong
      eigensolve, or a wrong projection literal all diverge here.
    - ``var_ordered_ok`` — var(pc1) >= var(pc2) >= ...: top-k ordering.
    - ``cov_diag_ok`` — score covariance is diagonal: cov(pc_i, pc_j)
      ~0 for i != j, true only if the components are eigenvectors of the
      data's covariance (not merely any orthonormal pair).
    - ``trace_match_ok`` — in-plan mean ||x - mu||^2 equals trace(C)
      from the driver model: gates the distributed Gram/mean pass
      against an independent single-pass recomputation.
    - ``orthonormal_ok`` — the model components are orthonormal
      (driver-checked literal; a property of the broadcast model, not of
      the data).

    All tolerances are relative (``rel_tol``, default 1e-6 — observed
    fold-order noise is ~1e-12). Aggregates run once over the scores
    (one shuffle to 1 row) and broadcast back onto the per-row output,
    so the shape is scan + 1-row crossJoin — scale-identical to
    pca_project.

    ``_model`` injects a pre-built ``(mu, comps, eigs, trace)`` — test
    hook proving the gate has teeth: a wrong model flips the booleans."""
    mu, comps, eigs, trace = (
        _model if _model is not None else pca_fit(vectors, dim, k, vec_col)
    )
    Vm = np.column_stack(comps)
    orthonormal = bool(np.allclose(Vm.T @ Vm, np.eye(k), atol=1e-9))

    centered = _centered(mu, vec_col)
    score_cols = [
        dot_double(centered, F.lit([float(x) for x in comp])).alias(
            f"_pc{i}"
        )
        for i, comp in enumerate(comps, 1)
    ]
    scored = vectors.select(
        F.col(id_col),
        dot_double(centered, centered).alias("_cnorm_sq"),
        *score_cols,
    )

    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.sum("_cnorm_sq").alias("_tr_sum"),
    ]
    for i in range(1, k + 1):
        aggs += [
            F.sum(f"_pc{i}").alias(f"_s{i}"),
            F.sum(F.col(f"_pc{i}") * F.col(f"_pc{i}")).alias(f"_sq{i}"),
        ]
    for i in range(1, k + 1):
        for j in range(i + 1, k + 1):
            aggs.append(
                F.sum(F.col(f"_pc{i}") * F.col(f"_pc{j}")).alias(
                    f"_x{i}_{j}"
                )
            )
    n = F.col("_n").cast("double")
    means = {i: F.col(f"_s{i}") / n for i in range(1, k + 1)}
    varis = {
        i: F.col(f"_sq{i}") / n - means[i] * means[i]
        for i in range(1, k + 1)
    }
    tol = F.lit(rel_tol)

    def _all(cols: list[Column]) -> Column:
        out = cols[0]
        for c in cols[1:]:
            out = out & c
        return out

    mean_zero = _all(
        [
            F.abs(means[i]) <= tol * F.sqrt(varis[i])
            for i in range(1, k + 1)
        ]
    )
    var_match = _all(
        [
            F.abs(varis[i] - F.lit(lam)) <= tol * F.lit(abs(lam))
            for i, lam in enumerate(eigs, 1)
        ]
    )
    var_ordered = _all(
        [F.lit(True)]
        + [
            varis[i] >= varis[i + 1] - tol * varis[i]
            for i in range(1, k)
        ]
    )
    cov_diag = _all(
        [F.lit(True)]
        + [
            F.abs(F.col(f"_x{i}_{j}") / n - means[i] * means[j])
            <= tol * F.sqrt(varis[i] * varis[j])
            for i in range(1, k + 1)
            for j in range(i + 1, k + 1)
        ]
    )
    trace_match = (
        F.abs(F.col("_tr_sum") / n - F.lit(trace)) <= tol * F.lit(trace)
    )
    corpus = scored.agg(*aggs).select(
        mean_zero.alias("mean_zero_ok"),
        var_match.alias("var_match_ok"),
        var_ordered.alias("var_ordered_ok"),
        cov_diag.alias("cov_diag_ok"),
        trace_match.alias("trace_match_ok"),
    )

    sq_sum = None
    for i in range(1, k + 1):
        term = F.col(f"_pc{i}") * F.col(f"_pc{i}")
        sq_sum = term if sq_sum is None else sq_sum + term
    recon_ok = sq_sum <= F.col("_cnorm_sq") * (1.0 + 1e-9) + F.lit(1e-12)
    return (
        scored.select(
            F.col(id_col),
            recon_ok.alias("recon_ok"),
            F.lit(orthonormal).alias("orthonormal_ok"),
        )
        .crossJoin(F.broadcast(corpus))
    )


def topk_int8(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 127.0,
) -> DataFrame:
    """Quantized retrieval: exact top-k by INT8 dot product — the scoring
    path a production ANN serves from (int8 rows are 4x smaller than
    float32 and the integer dot product SIMD-vectorizes), here expressed
    with the same quantizer as :func:`normalize_quantize` so index build
    and query agree bit-for-bit.

    Determinism bonus over float scoring: the score is an exact BIGINT
    (sum of int8*int8 products, <= dim * scale^2), so ranking has no
    accumulation-order sensitivity at all. Shape matches topk_cosine:
    1-row quantized query broadcast, map-side scoring,
    TakeOrderedAndProject — shuffle-free at any corpus size.
    """
    q8q = normalize_quantize(query, id_col, vec_col, scale).select(
        F.col("q8").alias("_q8q")
    )
    v8 = normalize_quantize(vectors, id_col, vec_col, scale).select(
        id_col, "q8"
    )
    score = F.aggregate(
        F.zip_with(
            F.col("q8"),
            F.col("_q8q"),
            lambda x, y: x.cast("bigint") * y.cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    scored = v8.crossJoin(F.broadcast(q8q)).select(
        id_col, score.alias("score_i8")
    )
    return scored.orderBy(F.col("score_i8").desc(), id_col).limit(k)


def semantic_dedup(
    vectors: DataFrame,
    centroids: list[list[float]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block_rows: int | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): remove SEMANTIC
    duplicates — documents whose embeddings nearly coincide even when
    they share no n-grams (paraphrases, translations, templated
    rewrites), the one duplicate class every lexical tier
    (MinHash/SimHash/n-gram/ExactSubstr) is blind to.

    The paper's recipe, composed from this engine's own blocks:

    1. cluster the embedding space with k-means (codebook from
       :func:`kmeans_fit` or any fixed unit-norm literal);
    2. within each cluster only, find pairs with cosine >=
       ``threshold`` (:func:`blocked_neighbor_pairs` with the
       :func:`centroid_argmax` assignment as the blocking key — the
       codebook is a plan literal, so blocking adds NO join);
    3. close the pairs into semantic-duplicate groups
       (``graph.duplicate_clusters``) and keep ONE deterministic
       survivor per group — the min-id member (the engine-wide
       survivor rule; the paper keeps a per-group representative too,
       its choice of which is explicitly reported as near-noise).

    Returns ``(id_col, centroid_id int, sem_cluster, is_survivor
    boolean)`` — one row per input vector; singletons are their own
    surviving cluster.

    Cross-CLUSTER near-duplicates are invisible by design (the paper's
    trade): a pair straddling a k-means boundary never meets. More
    clusters = cheaper and stricter; fewer = costlier and more
    complete.

    Scale (100 TB of embeddings): assignment is a map-only projection;
    pair generation explodes O(cell_size^2) WITHIN cells only, so size
    k with the corpus (the paper runs ~100k clusters at web scale) to
    keep cells bounded, and/or cap degenerate cells with
    ``max_block_rows`` (deterministic survivor set, documented recall
    trade). The closure is the iterative min-label fixpoint — one
    (node, long) shuffle per round on the DUPLICATE PAIRS only, never
    the corpus."""
    from asterlake.operators.graph import duplicate_clusters

    pairs = blocked_neighbor_pairs(
        vectors,
        centroid_argmax(centroids, vec_col),
        threshold,
        id_col=id_col,
        vec_col=vec_col,
        max_block_rows=max_block_rows,
    ).select("vec_a", "vec_b")
    clusters = duplicate_clusters(
        pairs,
        vectors,
        pair_a="vec_a",
        pair_b="vec_b",
        doc_id=id_col,
        max_iter=max_iter,
    )
    assigned = vectors.select(
        F.col(id_col),
        centroid_argmax(centroids, vec_col).alias("centroid_id"),
    )
    return assigned.join(clusters, id_col).select(
        id_col,
        "centroid_id",
        F.col("cluster").alias("sem_cluster"),
        (F.col(id_col) == F.col("cluster")).alias("is_survivor"),
    )


def semantic_assign_index(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Persistable SEMANTIC dedup index: ``(id_col, centroid_id int,
    vec_col)`` — every corpus vector with its k-means cell. Write it
    ``partitionBy('centroid_id')`` once and append each admitted
    batch's rows: a probe then broadcasts the (always small) new batch
    into the cell equi-join and Spark's dynamic partition pruning reads
    ONLY the cells the batch actually probes — the corpus is never
    re-assigned per ingest (assignment is a projection, but a full
    index scan per batch is exactly what a partitioned layout
    avoids)."""
    return vectors.select(
        F.col(id_col),
        centroid_argmax(centroids, vec_col).alias("centroid_id"),
        F.col(vec_col),
    )


def semantic_index_matches(
    new_vectors: DataFrame,
    index: DataFrame,
    centroids: list[list[float]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental SemDeDup screening: which NEW vectors are semantic
    duplicates of the EXISTING corpus — the daily-ingest shape for the
    semantic tier (the minhash_index_matches /
    substring_index_matches pattern: never new-vs-new; same-batch
    semantic twins flag only after their rows append to the index).

    ``index`` is the :func:`semantic_assign_index` relation (freshly
    built or read back from its cell-partitioned parquet landing). Per
    flagged new vector: ``n_candidates`` (index vectors in its cell at
    cosine >= ``threshold``), ``best_match`` (highest-cosine index id,
    ties to the lower id — deterministic, and cross-engine stable
    because the cosine is the exact left-to-right double fold both
    engines replay), ``best_cosine``. Unflagged vectors are absent.

    Scale: the new batch assigns with the literal-codebook projection
    (no join), then meets the index in ONE cell equi-join — the batch
    side broadcasts under AQE at production index:batch ratios, and a
    cell-partitioned index reads only the probed cells (DPP). Within a
    cell the work is |batch_cell| x |index_cell| scoring, bounded by
    sizing k with the corpus exactly as :func:`semantic_dedup`
    documents."""
    nb = new_vectors.select(
        F.col(id_col).alias("_new_id"),
        centroid_argmax(centroids, vec_col).alias("centroid_id"),
        F.col(vec_col).alias("_nv"),
        F.sqrt(dot_double(F.col(vec_col), F.col(vec_col))).alias("_nn"),
    )
    ix = index.select(
        F.col(id_col).alias("_idx_id"),
        "centroid_id",
        F.col(vec_col).alias("_iv"),
        F.sqrt(dot_double(F.col(vec_col), F.col(vec_col))).alias("_in"),
    )
    cos = F.try_divide(
        dot_double(F.col("_nv"), F.col("_iv")),
        F.col("_nn") * F.col("_in"),
    )
    hits = (
        nb.join(ix, "centroid_id")
        .select("_new_id", "_idx_id", cos.alias("_cos"))
        .where(F.col("_cos") >= threshold)
    )
    # best match = highest cosine, ties to the LOWER index id: max over
    # struct(cosine, -id) is deterministic and map-side combinable
    best = F.max(F.struct(F.col("_cos"), (-F.col("_idx_id")).alias("_neg")))
    return (
        hits.groupBy("_new_id")
        .agg(
            F.count("*").cast("bigint").alias("n_candidates"),
            best.alias("_best"),
        )
        .select(
            F.col("_new_id").alias(id_col),
            "n_candidates",
            (-F.col("_best._neg")).cast("bigint").alias("best_match"),
            F.col("_best._cos").alias("best_cosine"),
        )
    )


def srp_multiprobe_signatures(
    vec_col: Column, hyperplanes: list[list[int]]
) -> Column:
    """``array<string>`` of probe signatures for multi-probe SRP-LSH
    (Lv et al., VLDB 2007 applied to sign-random-projection): the
    vector's own signature plus every Hamming-distance-1 neighbor (one
    bit flipped). A near neighbor falling JUST on the other side of one
    hyperplane — the dominant SRP miss mode — lands in exactly one of
    these b+1 buckets, so probing them recovers most of the recall a
    longer signature loses, without more tables or a shorter signature's
    bucket blowup. Row-local string ops; b+1 distinct probes per row."""
    b = len(hyperplanes)
    sig = srp_signature(vec_col, hyperplanes)
    flips = F.transform(
        F.sequence(F.lit(1), F.lit(b)),
        lambda i: F.concat(
            sig.substr(F.lit(1), i - 1),
            F.when(sig.substr(i, F.lit(1)) == "1", "0").otherwise("1"),
            sig.substr(i + 1, F.lit(b)),
        ),
    )
    return F.concat(F.array(sig), flips)


def srp_multiprobe_topk(
    queries: DataFrame,
    data: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Multi-probe SRP ANN: each query probes its own bucket plus all
    1-bit-flip buckets, candidates rerank by exact cosine, top-k per
    query by (cosine DESC, id ASC).

    Scale: the data side is signed ONCE (row-local) and joined on the
    signature string — a hash equi-join, never a cartesian; candidates
    per query are (b+1)/2^b of the corpus in expectation, and the only
    other shuffle is the per-query top-k window on the query id (the
    q_ann_ivf_search shape). Self-matches are excluded."""
    planes = srp_hyperplanes(n_planes, dim, seed)
    d = data.select(
        F.col(id_col),
        F.col(vec_col),
        srp_signature(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_qvec"),
        F.explode(
            srp_multiprobe_signatures(F.col(vec_col), planes)
        ).alias("bucket"),
    )
    cand = q.join(d, "bucket").filter(
        F.col(query_id_col) != F.col(id_col)
    )
    scored = cand.select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
