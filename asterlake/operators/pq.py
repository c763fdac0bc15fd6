"""Product quantization (PQ) ANN: codebook compression for 100-TB
embedding search.

Brute-force cosine (similarity.py) reads every float of every vector:
64 dims x 4 bytes = 256 B/vector, so a 100-TB corpus scan is I/O-bound
on the embeddings themselves. PQ splits each vector into ``m``
subvectors, quantizes each against a per-subspace codebook of ``k``
centroids, and stores only the ``m`` code bytes (m=8, k=16 -> 8 B/vector,
a 32x scan reduction). Query-time scoring never touches the original
floats: an m x k lookup table of query-to-centroid distances is computed
once on the driver (float64, tiny) and broadcast as a literal; per-row
distance is ``sum_s lut[s][code_s]`` — an array-indexing fold, pure
JVM-side expression, no shuffle, TakeOrderedAndProject top-k.

Jegou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011) — the asymmetric distance computation (ADC) variant:
queries stay exact, only the corpus is quantized.

Determinism discipline (the q_ann_* oracle pattern): codebooks are either
seeded data-independent literals (:func:`pq_codebooks`, embeddable in a
DuckDB oracle the same way ivf_centroids is) or Lloyd-refined from data
with the exact quantized-BIGINT mean arithmetic of kmeans_step
(:func:`pq_train`, bit-reproducible, model state bounded at m x k x dsub
floats). Every distance fold is an explicit left-to-right DOUBLE
``zip_with`` + ``aggregate`` — bit-identical to DuckDB's
``list_sum(list_transform(...))`` fold (see similarity.py module doc).

Reference parity: the reference engine has no vector surface at all
(/root/reference/src is ETL glue); this is the beyond-parity
training-data-pipeline tier next to SRP/IVF/INT8.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pq_codebooks(
    m: int = 8, k: int = 16, dim: int = 64, seed: int = 11
) -> list[list[list[float]]]:
    """Seeded data-independent codebooks: ``m`` subspaces x ``k``
    centroids x ``dim/m`` coordinates, N(0, 1/sqrt(dim)) — the right
    scale for unit-norm-ish embedding coordinates, and (like
    ivf_centroids) a plain Python literal both the Spark plan and a
    DuckDB oracle can embed verbatim. Production path: refine with
    :func:`pq_train`."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rng = np.random.RandomState(seed)
    c = rng.randn(m, k, dim // m) / np.sqrt(dim)
    return [[[float(x) for x in row] for row in sub] for sub in c]


def _sql_double_array(vals) -> str:
    """Render a (possibly nested) list of floats as ONE Spark SQL
    array literal string — `F.expr` then builds the whole literal in a
    single py4j round trip. Building the same literal with nested
    `F.array(F.lit(...))` costs one py4j call PER ELEMENT: a m=8 x k=16
    x 8-dim codebook is ~1k calls, ~2-3s of pure driver time per query
    CONSTRUCTION (measured — execution was fine, building the plan
    wasn't). Java's Double.parseDouble is correctly rounded, so the
    repr round-trip is value-exact."""
    if isinstance(vals, (list, tuple)):
        inner = ", ".join(_sql_double_array(v) for v in vals)
        return f"array({inner})"
    return repr(float(vals)) + "D"


def _sq_dist(c: Column, v: Column) -> Column:
    """Left-to-right double fold of the squared coordinate deltas —
    same associativity contract as similarity.dot_double."""
    d = F.zip_with(
        c,
        v,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def _dists_to(cb: Column, sub: Column) -> Column:
    """transform(cb, c -> sq_dist(c, sub)) via a closure — a default-arg
    lambda would have TWO parameters, which PySpark's transform treats
    as the (element, index) form and binds the index to the capture."""
    return F.transform(cb, lambda c: _sq_dist(c, sub))


def _codebooks_lit(codebooks: list[list[list[float]]]) -> Column:
    return F.expr(_sql_double_array(codebooks))


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantize each vector to its ``m`` nearest-centroid codes
    (``codes`` array<int>, code s in [0, k)).

    Pure projection: the codebook is a literal broadcast by value, each
    subspace's argmin is a k-fold over the sliced subvector, no shuffle,
    no UDF. The argmin is a SINGLE-PASS (dist, idx)-struct fold with a
    strict < compare — ties break to the lower code exactly like the
    previous array_position(dists, array_min(dists)) form (first index
    achieving the minimum, = DuckDB's list_position), but each centroid
    distance is evaluated ONCE instead of twice: the dists array was
    referenced by both array_position and array_min, and Catalyst
    duplicates (not CSEs) a non-cheap HOF expression per reference
    (measured 2x the encode cost). This is the write-path operator: at
    100 TB the codes column is what lands in the hot table; the float
    vectors stay in cold storage for reranking only.
    """
    codes = F.expr(_encode_codes_sql(codebooks, vec_col))
    return vectors.select(id_col, codes.alias("codes"))


def _encode_codes_sql(
    codebooks: list[list[list[float]]], vec_sql: str
) -> str:
    """The pq_encode codes array as ONE SQL expression string over an
    arbitrary vector expression ``vec_sql`` (a column name, or a
    let-bound lambda variable — see opq_encode). One JVM-parsed string:
    the equivalent Column-API build creates ~6 higher-order-function
    lambdas per subspace, each a ~30ms py4j negotiation — 1.4s of
    driver time per plan CONSTRUCTION (profiled; execution unchanged).
    """
    m = len(codebooks)
    k = len(codebooks[0])
    dsub = len(codebooks[0][0])
    per_sub = []
    for s in range(m):
        cb_sql = _sql_double_array(codebooks[s])
        sub_sql = f"slice({vec_sql}, {s * dsub + 1}, {dsub})"
        dists_sql = (
            f"transform({cb_sql}, c -> aggregate("
            f"zip_with(c, {sub_sql}, (x, y) -> "
            "(x - CAST(y AS DOUBLE)) * (x - CAST(y AS DOUBLE))), "
            "0.0D, (acc, x) -> acc + x))"
        )
        best_sql = (
            f"aggregate(zip_with({dists_sql}, sequence(1, {k}), "
            "(d, i) -> struct(d AS d, i AS i)), "
            "struct(CAST('Infinity' AS DOUBLE) AS d, 0 AS i), "
            "(acc, x) -> CASE WHEN x.d < acc.d THEN x ELSE acc END)"
        )
        per_sub.append(f"CAST({best_sql}.i - 1 AS INT)")
    return "array(" + ", ".join(per_sub) + ")"


def adc_topk(
    codes_df: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query stays exact,
    the corpus is its codes.

    The m x k LUT (squared distance from each query subvector to each
    centroid) is computed on the driver in float64 — bounded model
    state, never data-sized — and embedded as a literal. Per-row
    distance is a left-to-right fold of ``lut[s][code_s]`` (array
    indexing only: the plan touches 8 ints per row, not 64 floats), and
    the ORDER BY ... LIMIT k compiles to TakeOrderedAndProject — no
    global sort, no shuffle beyond the top-k combine. Ordering is made
    total with the id tiebreak; NULL codes (a NULL input vector) sort
    last."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if len(query_vec) != m * dsub:
        raise ValueError(
            f"query dim {len(query_vec)} != m*dsub {m * dsub}"
        )
    lut = []
    for s in range(m):
        q = query_vec[s * dsub : (s + 1) * dsub]
        row = []
        for c in codebooks[s]:
            acc = 0.0
            for x, y in zip(c, q):
                d = float(x) - float(y)
                acc += d * d
            row.append(acc)
        lut.append(row)
    # sum_s lut[s][codes[s]] as zip_with(lut, codes) -> one left-to-right
    # fold, as a single JVM-parsed SQL expression. CRITICAL: `codes` is
    # referenced exactly ONCE — when codes_df is the (unmaterialized)
    # pq_encode plan, CollapseProject substitutes the whole encode
    # expression into every `codes` call site, so a per-subspace
    # element_at(codes, s+1) form re-evaluated the encode m times per
    # row (measured 5.4s -> 0.7s at sf0.1). The fold order
    # (lut[0][c0] + ... + lut[m-1][c_{m-1}], from 0.0) matches the
    # oracle's list_sum exactly.
    dist = F.expr(
        f"aggregate(zip_with({_sql_double_array(lut)}, codes, "
        "(row, c) -> element_at(row, c + 1)), "
        "0.0D, (acc, v) -> acc + v)"
    )
    return (
        codes_df.select(id_col, dist.alias("adc_dist"))
        .orderBy(F.asc_nulls_last("adc_dist"), id_col)
        .limit(k)
    )


def adc_topk_multi(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_shards: int = 16,
) -> DataFrame:
    """Batch multi-query ADC search — the SERVING shape of
    :func:`adc_topk`: the queries arrive as a TABLE (id, vector), not
    a literal, and every query gets its own top-k in one pass over the
    codes. Returns ``(query_id, vec_id, adc_dist)``, k rows per query.

    Scale shape: each query's m x k LUT is computed IN-PLAN on the
    (small) query side — one projection over the broadcast-bound query
    table, so the broadcast carries m*k doubles per query instead of
    shipping the raw vector to every scoring site and re-deriving.
    Candidate scoring is then codes x broadcast(luts): a
    BroadcastNestedLoopJoin whose per-row cost is the same
    8-array-lookups fold as the single-query path, touching m bytes of
    corpus per (row, query). The per-query top-k runs TWO-LEVEL: a
    first row_number window over (query, shard) with
    ``shard = xxhash64(id) % n_shards`` — every task sorts at most
    corpus/n_shards rows per query, no single reducer sees a whole
    query — then a second window over the surviving
    ``n_shards * k`` rows per query (bounds-sized). The two-level
    result is exactly the global top-k (each shard keeps its own
    top-k, which contains every global winner in that shard).
    Ordering is total via the (dist, id) tiebreak; NULL codes sort
    last at both levels."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    lut = F.expr(
        f"transform({_sql_double_array(codebooks)}, (sub, s) -> "
        f"transform(sub, c -> aggregate(zip_with(c, "
        f"slice({vec_col}, s * {dsub} + 1, {dsub}), "
        "(x, y) -> (x - CAST(y AS DOUBLE)) * (x - CAST(y AS DOUBLE))), "
        "0.0D, (acc, v) -> acc + v)))"
    )
    luts = queries.select(
        F.col(id_col).alias(query_id_col), lut.alias("_lut")
    )
    dist = F.expr(
        "aggregate(zip_with(_lut, codes, "
        "(row, c) -> element_at(row, c + 1)), "
        "0.0D, (acc, v) -> acc + v)"
    )
    scored = codes_df.crossJoin(F.broadcast(luts)).select(
        query_id_col, id_col, dist.alias("adc_dist")
    )
    from pyspark.sql import Window

    shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    w1 = Window.partitionBy(query_id_col, "_shard").orderBy(
        F.asc_nulls_last("adc_dist"), F.col(id_col)
    )
    w2 = Window.partitionBy(query_id_col).orderBy(
        F.asc_nulls_last("adc_dist"), F.col(id_col)
    )
    return (
        scored.withColumn("_shard", shard)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= k)
        .drop("_shard", "_r1", "_r2")
    )


def pq_search(
    vectors: DataFrame,
    codes_df: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage PQ search — the production shape: ADC over the compact
    codes table produces a ``shortlist`` of candidates (the only
    full-corpus pass, touching m bytes/row), then the float vectors of
    just those ids are fetched and reranked by EXACT cosine.

    The shortlist ids broadcast into a hash semi-join against the vector
    table — at 100 TB that fetch prunes to the candidate files when the
    table is id-ordered (layout.py's range layout + parquet min/max
    skipping), so the expensive float column is read for ~shortlist
    rows, not the corpus. Final ordering is (cosine desc, id) — total and
    deterministic. Quality contract: the result equals exact brute-force
    top-k whenever the true top-k survives the shortlist (measured
    recall pins in tests/test_pq.py)."""
    from asterlake.operators.similarity import cosine

    cand = adc_topk(
        codes_df, query_vec, codebooks, k=shortlist, id_col=id_col
    ).select(id_col)
    q_lit = F.expr(_sql_double_array(query_vec))
    return (
        vectors.join(F.broadcast(cand), id_col)
        .select(
            id_col,
            cosine(F.col(vec_col), q_lit).alias("cos_sim"),
        )
        .orderBy(F.desc_nulls_last("cos_sim"), id_col)
        .limit(k)
    )


def ivfpq_index(
    vectors: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Build the FAISS-style IVF+PQ index layout: assign each vector to
    its max-cosine IVF cell (similarity.ivf_assign semantics, inlined),
    then PQ-encode the RESIDUAL ``v - centroid_cell`` — residuals
    concentrate near zero, so the same codebook budget quantizes them
    far better than raw vectors (Jegou et al. 2011, IVFADC).

    Pure projection: both codebooks are literals, assignment is an
    argmax fold, the residual a ``zip_with`` subtraction — no shuffle,
    no UDF. At 100 TB this (cell, codes) table IS the hot index:
    ~1 int + m bytes per vector, cell-partitionable, the float vectors
    stay cold."""
    m = len(codebooks)
    k = len(codebooks[0])
    dsub = len(codebooks[0][0])
    cl = _sql_double_array(centroids)
    # SQL-text expressions with LET bindings (the single-element
    # transform idiom: `transform(array(e), x -> body)[1]` evaluates e
    # once and lets body reference it as a cheap lambda variable) — the
    # same two hazards fixed in pq_encode/adc_topk apply here:
    # element-wise Column literals cost ~1k py4j calls of plan
    # construction, and CollapseProject re-evaluates a non-cheap
    # expression per reference (the residual fed all m subspace slices,
    # and the argmax cell fed the residual). Semantics are unchanged:
    # first-max assignment, first-min codes, identical fold orders
    # (the committed oracle replays these exactly).
    dot = (
        "aggregate(zip_with(c, {vec}, (x, y) -> "
        "x * CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
    ).format(vec=vec_col)
    cell_expr = (
        f"element_at(transform(array(transform({cl}, c -> {dot})), "
        "sc -> CAST(array_position(sc, array_max(sc)) - 1 AS INT)), 1)"
    )
    per_sub = []
    for s in range(m):
        cb_sql = _sql_double_array(codebooks[s])
        dists_sql = (
            f"transform({cb_sql}, c -> aggregate("
            f"zip_with(c, slice(r, {s * dsub + 1}, {dsub}), "
            "(x, y) -> (x - y) * (x - y)), "
            "0.0D, (acc, x) -> acc + x))"
        )
        per_sub.append(
            f"element_at(transform(array({dists_sql}), ds -> "
            "CAST(array_position(ds, array_min(ds)) - 1 AS INT)), 1)"
        )
    codes_expr = (
        "element_at(transform(array("
        f"zip_with({vec_col}, element_at({cl}, cell + 1), "
        "(x, y) -> CAST(x AS DOUBLE) - y)), "
        f"r -> array({', '.join(per_sub)})), 1)"
    )
    return (
        vectors.select(id_col, vec_col, F.expr(cell_expr).alias("cell"))
        .withColumn("codes", F.expr(codes_expr))
        .select(id_col, "cell", "codes")
    )


def ivfpq_search(
    spark,
    index_df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVFADC search: probe the query's ``nprobe`` best cells, score
    only those cells' codes with per-cell residual LUTs.

    Driver side computes nprobe m x k LUTs (squared distance from the
    query's per-cell residual subvectors to the codebook centroids) —
    nprobe x m x k float64s, bounded model state. They ship as a tiny
    broadcast (cell, lut) table; the probe is a BroadcastHashJoin on
    the cell id (so only probed cells' index rows are even scored —
    with a cell-partitioned index the scan itself prunes), the distance
    an array-indexing fold, the top-k a TakeOrderedAndProject. No
    corpus-sized shuffle anywhere."""
    import math

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if len(query_vec) != m * dsub:
        raise ValueError(f"query dim {len(query_vec)} != m*dsub {m * dsub}")
    q = [float(x) for x in query_vec]
    qn = math.sqrt(sum(x * x for x in q))
    # nprobe best cells by cosine (driver-side: k x dim literals)
    cell_scores = []
    for ci, c in enumerate(centroids):
        dot = 0.0
        for x, y in zip(c, q):
            dot += float(x) * y
        cn = math.sqrt(sum(float(x) * float(x) for x in c))
        cell_scores.append((-(dot / (cn * qn) if cn and qn else 0.0), ci))
    probed = [ci for _, ci in sorted(cell_scores)[:nprobe]]
    lut_rows = []
    for ci in probed:
        r = [q[d] - float(centroids[ci][d]) for d in range(m * dsub)]
        lut = []
        for s in range(m):
            rs = r[s * dsub : (s + 1) * dsub]
            row = []
            for c in codebooks[s]:
                acc = 0.0
                for x, y in zip(c, rs):
                    d = float(x) - y
                    acc += d * d
                row.append(acc)
            lut.append(row)
        lut_rows.append((ci, lut))
    luts = spark.createDataFrame(lut_rows, ["cell", "_lut"])
    # same single-reference zip_with fold as adc_topk (the index stores
    # codes as a real column here, but the uniform shape keeps both ADC
    # paths bit-identical and CollapseProject-proof)
    dist = F.aggregate(
        F.zip_with(
            F.col("_lut"),
            F.col("codes"),
            lambda row, c: F.element_at(row, c + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        index_df.join(F.broadcast(luts), "cell")
        .select(id_col, dist.alias("adc_dist"))
        .orderBy(F.asc_nulls_last("adc_dist"), id_col)
        .limit(k)
    )


def pq_reconstruction_sse(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Total squared reconstruction error of the codebooks over the
    corpus (one double + one count row) — the Lloyd objective. Exposed
    so training improvement is a pinnable fact, not a belief. One scan,
    map-side-combinable aggregate."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    per_sub = []
    for s in range(m):
        sub = F.slice(F.col(vec_col), s * dsub + 1, dsub)
        cb = F.expr(_sql_double_array(codebooks[s]))
        dists = _dists_to(cb, sub)
        per_sub.append(F.array_min(dists))
    row_err = sum(per_sub[1:], per_sub[0])
    return vectors.select(row_err.alias("_e")).agg(
        F.sum("_e").alias("sse"), F.count("*").cast("bigint").alias("n")
    )


def pq_train(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    iters: int = 4,
    seed: int = 11,
    vec_col: str = "embedding",
    scale: int = 10_000_000,
    init: str = "moments",
) -> list[list[list[float]]]:
    """Lloyd-refine PQ codebooks from data: ``iters`` rounds of
    assign-to-nearest + per-(subspace, code, dim) exact mean.

    All m subspaces train in ONE job per iteration: each vector explodes
    into m (sub, subvec) rows, assignment indexes the literal codebook
    stack by sub (projection, no join), and the single shuffle carries
    only (sub, code, dim) quantized-BIGINT partial sums with map-side
    combine — m x k x dsub = k x dim cells, the same bounded model state
    and FLOOR 1e-7 quantized tie-free mean discipline as
    similarity.kmeans_step, so training is bit-reproducible. The driver
    collects k x dim values per round, never data-sized. A code that
    loses all members keeps its previous centroid (standard
    empty-cluster policy).

    ``init='moments'`` (default) matches the seeded unit Gaussians to
    the data's per-(subspace, dim) location/scale — ``mu + sigma * g``
    from ONE exact-integer moments pre-pass — so Lloyd starts inside
    the cloud it is quantizing. The fixed-scale ``init='seeded'``
    Gaussians (N(0, 1/sqrt(dim)), the pq_codebooks literal) collapse
    when a dimension's scale is far from 1/sqrt(dim): measured on the
    rotated low-rank corpus in tests/test_pq.py, most centroids start
    outside the data, lose every point on round one, and the
    empty-cluster policy freezes them dead — trained SSE 339.7 vs
    251.5 for the SAME data when the init matches moments. The moments
    are quantized-BIGINT / DECIMAL(38,0) sums, so the init (and hence
    the whole trajectory) stays bit-reproducible under any
    partitioning."""
    codebooks = pq_codebooks(m=m, k=k, dim=dim, seed=seed)
    dsub = dim // m
    if init == "moments":
        subs0 = F.array(
            *[
                F.slice(F.col(vec_col), s * dsub + 1, dsub)
                for s in range(m)
            ]
        )
        exd0 = vectors.select(
            F.posexplode(subs0).alias("sub", "subvec")
        ).select("sub", F.posexplode("subvec").alias("dim0", "val"))
        q0 = F.floor(
            F.col("val").cast("double") * F.lit(float(scale))
        ).cast("long")
        # E[x^2] sums overflow BIGINT at corpus scale (q^2 ~ 1e14 per
        # row), so the second moment accumulates in DECIMAL(38,0)
        stats = (
            exd0.groupBy("sub", "dim0")
            .agg(
                F.sum(q0).cast("double").alias("s1"),
                F.sum(
                    q0.cast("decimal(38,0)") * q0.cast("decimal(38,0)")
                )
                .cast("double")
                .alias("s2"),
                F.count("*").cast("double").alias("n"),
            )
            .collect()  # driver-ok: m x dsub moment rows, never data
        )
        mu = [[0.0] * dsub for _ in range(m)]
        sigma = [[0.0] * dsub for _ in range(m)]
        for r in stats:
            mean_q = r.s1 / r.n
            var_q = max(r.s2 / r.n - mean_q * mean_q, 0.0)
            mu[r.sub][r.dim0] = mean_q / scale
            sigma[r.sub][r.dim0] = var_q**0.5 / scale
        raw = np.random.RandomState(seed).randn(m, k, dsub)
        codebooks = [
            [
                [
                    mu[s][d] + sigma[s][d] * float(raw[s][c][d])
                    for d in range(dsub)
                ]
                for c in range(k)
            ]
            for s in range(m)
        ]
    elif init != "seeded":
        raise ValueError(f"unknown init {init!r}")
    for _ in range(iters):
        cb_lit = _codebooks_lit(codebooks)
        subs = F.array(
            *[
                F.slice(F.col(vec_col), s * dsub + 1, dsub)
                for s in range(m)
            ]
        )
        ex = vectors.select(F.posexplode(subs).alias("sub", "subvec"))
        dists = F.transform(
            F.element_at(cb_lit, F.col("sub") + 1),
            lambda c: _sq_dist(c, F.col("subvec")),
        )
        assigned = ex.select(
            "sub",
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias("code"),
            "subvec",
        )
        exd = assigned.select(
            "sub", "code", F.posexplode("subvec").alias("dim0", "val")
        )
        q = F.floor(F.col("val").cast("double") * F.lit(float(scale))).cast(
            "long"
        )
        rows = (
            exd.groupBy("sub", "code", "dim0")
            .agg(
                (
                    F.sum(q).cast("double")
                    / F.count("*").cast("double")
                    / F.lit(float(scale))
                ).alias("centroid")
            )
            .collect()  # driver-ok: m x k x dsub model values, never data
        )
        nxt = [
            [list(row) for row in sub] for sub in codebooks
        ]
        for r in rows:
            nxt[r.sub][r.code][r.dim0] = r.centroid
        codebooks = nxt
    return codebooks


# ---------------------------------------------------------------------------
# Optimized product quantization (OPQ): a learned orthogonal rotation in
# front of PQ — Ge, He, Ke, Sun, "Optimized Product Quantization"
# (CVPR 2013 / TPAMI 2014), the parametric (eigenvalue-allocation)
# solution of §4. Completes the FAISS-style ladder IVF -> PQ -> IVFADC
# -> OPQ: same code bytes, strictly better subspace balance.
#
# Why it helps: PQ quantizes each of the m coordinate slices
# independently, so all its modeling budget is spent in the COORDINATE
# basis — correlated dimensions waste centroids and high-variance
# directions crowd out the rest. The parametric OPQ rotation (a) aligns
# the data with its PCA basis (decorrelates), then (b) permutes the
# principal directions so every subspace receives (near-)equal variance
# PRODUCT — the independence + balance assumptions under which PQ's
# distortion bound is minimized for a Gaussian source. At equal code
# bytes this is free recall: the rotation is one orthogonal matrix
# applied at encode/query time, and ADC/LUT machinery is unchanged.
#
# Scale/determinism discipline: training reads the corpus ONCE through
# similarity.gram_mean_count (each Arrow batch ships one d x d BLAS
# partial — model-sized, no shuffle), the d x d eigenproblem solves on
# the driver, and the rotation ships as a 6-decimal-quantized literal
# exactly like the ivf/pq codebooks — so a DuckDB oracle replays the
# rotated-space encode/ADC folds digit-for-digit.
# ---------------------------------------------------------------------------


def opq_train_rotation(
    vectors: DataFrame,
    m: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    round_decimals: int = 6,
) -> list[list[float]]:
    """Train the parametric OPQ rotation: PCA basis + eigenvalue
    allocation. Returns ``R`` as a ``dim x dim`` row-major matrix
    (``y = R @ x``; row j is output dimension j).

    Eigenvalue allocation (CVPR 2013 §4.2): principal directions are
    dealt, largest eigenvalue first, to the subspace with the smallest
    current eigenvalue log-product (ties to the lower subspace index),
    bounded at dim/m directions each — greedy balancing of the variance
    product, which the paper shows minimizes the Gaussian distortion
    bound. Eigenvector signs are fixed deterministically (largest-|x|
    coefficient made positive, the pca_fit convention) and every
    coefficient is quantized to ``round_decimals`` so the matrix is a
    stable plan/oracle literal."""
    from asterlake.operators.similarity import gram_mean_count

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    G, s, n = gram_mean_count(vectors, dim, vec_col)
    if n == 0:
        raise ValueError("opq_train_rotation needs at least one vector")
    mu = s / n
    cov = G / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    vals = vals[order]
    vecs = vecs[:, order]
    for j in range(dim):
        v = vecs[:, j]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            vecs[:, j] = -v
    dsub = dim // m
    buckets: list[list[int]] = [[] for _ in range(m)]
    logs = [0.0] * m
    # Min-load greedy balancing needs NON-NEGATIVE load increments:
    # with eigenvalues < 1 the raw log-loads are negative, so "smallest
    # product" keeps pointing at the bucket that already took the big
    # eigenvalues and the greedy degenerates to the identity permutation
    # (measured: a rank-6 spectrum all landed in subspace 0 — the worst
    # allocation). Every bucket ends with exactly dsub items, so
    # shifting every log by a constant shifts every bucket total by
    # dsub * c — the balance objective is invariant. Shift by the
    # smallest log.
    logvals = [float(np.log(max(v, 1e-12))) for v in vals]
    shift = min(logvals)
    for j in range(dim):
        open_b = [b for b in range(m) if len(buckets[b]) < dsub]
        b = min(open_b, key=lambda i: (logs[i], i))
        buckets[b].append(j)
        logs[b] += logvals[j] - shift
    perm = [j for bucket in buckets for j in bucket]
    R = vecs[:, perm].T
    return [
        [round(float(x), round_decimals) for x in row] for row in R
    ]


def _rotated_sql(rotation: list[list[float]], vec_col: str) -> str:
    dims = []
    for row in rotation:
        row_sql = _sql_double_array(row)
        dims.append(
            f"aggregate(zip_with({row_sql}, {vec_col}, "
            "(r, x) -> r * CAST(x AS DOUBLE)), "
            "0.0D, (acc, v) -> acc + v)"
        )
    return "array(" + ", ".join(dims) + ")"


def rotate_vectors(
    vectors: DataFrame,
    rotation: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Apply ``y = R @ x`` row-wise as ONE shuffle-free SQL projection:
    output dimension j is the left-to-right double fold of row j of the
    literal matrix against the vector — the exact fold DuckDB's
    ``list_sum(list_transform(...))`` evaluates, so rotated values are
    bit-identical across engines (they feed the encode argmin and the
    ADC ranking, both order-sensitive). The matrix is a plan literal
    broadcast by value; per-row cost is d^2 multiply-adds, the same
    arithmetic a BLAS gemv would do, kept JVM-side."""
    rotated = F.expr(_rotated_sql(rotation, vec_col))
    return vectors.select(id_col, rotated.alias(vec_col))


def opq_encode(
    vectors: DataFrame,
    rotation: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Rotate + PQ-encode in ONE projection with the rotated vector
    LET-BOUND via the single-element-transform idiom (the ivfpq_index
    discipline): ``transform(array(<rotation>), _rv -> <codes over
    _rv>)[0]``. Composing rotate_vectors with pq_encode instead lets
    CollapseProject substitute the whole d^2 rotation fold into EVERY
    subspace slice reference — m=8 re-evaluations per row (measured
    2.6s -> 0.9s warm at sf0.1). The lambda variable is evaluated once
    per row; values are bit-identical to the two-step composition."""
    spark = vectors.sparkSession
    rot_df = spark.createDataFrame(
        [([list(map(float, row)) for row in rotation],)],
        "_rotm array<array<double>>",
    )
    d = len(rotation)
    # the matrix rides a 1-row broadcast column, not a plan literal:
    # parsing the 4096-double literal cost 4.5s of driver time per
    # plan CONSTRUCTION (measured; the codebook literals are 10x
    # smaller and stay inline). Values are identical — createDataFrame
    # round-trips IEEE doubles exactly.
    rot_sql = "array(" + ", ".join(
        f"aggregate(zip_with(element_at(_rotm, {j + 1}), {vec_col}, "
        "(r, x) -> r * CAST(x AS DOUBLE)), "
        "0.0D, (acc, v) -> acc + v)"
        for j in range(d)
    ) + ")"
    codes_sql = _encode_codes_sql(codebooks, "_rv")
    codes = F.expr(
        f"transform(array({rot_sql}), _rv -> {codes_sql})[0]"
    )
    return vectors.crossJoin(F.broadcast(rot_df)).select(
        id_col, codes.alias("codes")
    )


def rotate_query(
    rotation: list[list[float]], query_vec: list[float]
) -> list[float]:
    """Driver-side twin of :func:`rotate_vectors` for the (tiny) query
    vector: the same left-to-right float64 fold per output dimension,
    so the literal the plan embeds equals the literal an oracle built
    from the same call embeds."""
    out = []
    for row in rotation:
        acc = 0.0
        for r, x in zip(row, query_vec):
            acc += float(r) * float(x)
        out.append(acc)
    return out


def opq_train(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    iters: int = 4,
    seed: int = 11,
    vec_col: str = "embedding",
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Full parametric-OPQ training: the eigenvalue-allocation rotation
    (:func:`opq_train_rotation`, one corpus pass), then Lloyd-refined PQ
    codebooks (:func:`pq_train`) over the ROTATED corpus. Returns
    ``(rotation, codebooks)`` — both quantized literals, both bounded
    model state (d^2 + m*k*d/m floats), pinnable exactly like the
    BPE/unigram tokenizer models."""
    rotation = opq_train_rotation(vectors, m=m, dim=dim, vec_col=vec_col)
    rotated = rotate_vectors(vectors, rotation, vec_col=vec_col)
    codebooks = pq_train(
        rotated, m=m, k=k, dim=dim, iters=iters, seed=seed,
        vec_col=vec_col,
    )
    return rotation, codebooks


def opq_search(
    vectors: DataFrame,
    query_vec: list[float],
    rotation: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage OPQ search: rotate corpus + query into the trained
    basis, PQ-encode and ADC-shortlist there (m bytes/row scanned, LUT
    literal, TakeOrderedAndProject), then rerank the shortlist by EXACT
    cosine on the ORIGINAL vectors — an orthogonal rotation preserves
    cosine, so reranking in the original space is both exact and skips
    re-rotating the fetched floats. Same plan shape and code bytes as
    :func:`pq_search`; the rotation buys subspace balance, not cost."""
    # r15: the rotate+encode projection is the query's dominant cost
    # (d^2 fold per row) and the corpus scan is single-row-group at
    # bench scale — spread ONLY the encode input (guide §2.5; the
    # rerank side stays on the raw scan: it fetches ~shortlist rows
    # through a broadcast semi-join and must not pay an exchange of
    # the full float column). No-op when the scan is already wide.
    from asterlake.tables import fan_out_small_scan

    codes = opq_encode(
        fan_out_small_scan(vectors), rotation, codebooks, id_col, vec_col
    )
    rq = rotate_query(rotation, query_vec)
    cand = adc_topk(
        codes, rq, codebooks, k=shortlist, id_col=id_col
    ).select(id_col)
    from asterlake.operators.similarity import cosine

    q_lit = F.expr(_sql_double_array(query_vec))
    return (
        vectors.join(F.broadcast(cand), id_col)
        .select(
            id_col,
            cosine(F.col(vec_col), q_lit).alias("cos_sim"),
        )
        .orderBy(F.desc_nulls_last("cos_sim"), id_col)
        .limit(k)
    )
