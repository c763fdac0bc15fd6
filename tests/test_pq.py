"""Product-quantization ANN (operators/pq.py): encode/ADC bit-exactness
against a same-fold Python replay, Lloyd training improvement, bounded
model state, and the no-Python-in-plan / top-k plan shape.

R9 driver-query candidate: the seeded-codebook encode+ADC pipeline is
fully arithmetic, so the oracle restates it with the codebook literal
embedded the same way q_ann_ivf_search embeds ivf_centroids.
"""

from __future__ import annotations

import pytest

from asterlake.operators.pq import (
    adc_topk,
    pq_codebooks,
    pq_encode,
    pq_reconstruction_sse,
    pq_train,
)

M, K, DIM = 8, 16, 64


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    yield df
    df.unpersist()


def _replay_code(vec, codebooks, s):
    """Nearest-centroid code with the EXACT left-to-right double fold the
    Spark expression evaluates — first minimum wins, like array_position."""
    dsub = len(codebooks[0][0])
    sub = vec[s * dsub : (s + 1) * dsub]
    dists = []
    for c in codebooks[s]:
        acc = 0.0
        for x, y in zip(c, sub):
            d = float(x) - float(y)
            acc += d * d
        dists.append(acc)
    return dists.index(min(dists))


def test_encode_matches_python_replay_bit_for_bit(vectors):
    codebooks = pq_codebooks(m=M, k=K, dim=DIM)
    sample = vectors.filter("vec_id < 40")
    got = {r.vec_id: list(r.codes) for r in pq_encode(sample, codebooks).collect()}
    raw = {r.vec_id: [float(x) for x in r.embedding] for r in sample.collect()}
    assert len(got) == len(raw) > 0
    for vid, vec in raw.items():
        want = [_replay_code(vec, codebooks, s) for s in range(M)]
        assert got[vid] == want, vid
    for codes in got.values():
        assert all(0 <= c < K for c in codes) and len(codes) == M


def test_adc_topk_matches_python_replay_exactly(vectors):
    codebooks = pq_codebooks(m=M, k=K, dim=DIM)
    query = [float(x) for x in vectors.filter("vec_id = 0").collect()[0].embedding]
    codes_df = pq_encode(vectors, codebooks)
    got = [(r.vec_id, r.adc_dist) for r in adc_topk(codes_df, query, codebooks, k=10).collect()]
    # replay: LUT in float64, dist = left-to-right fold over subspaces
    dsub = DIM // M
    lut = []
    for s in range(M):
        q = query[s * dsub : (s + 1) * dsub]
        row = []
        for c in codebooks[s]:
            acc = 0.0
            for x, y in zip(c, q):
                d = float(x) - float(y)
                acc += d * d
            row.append(acc)
        lut.append(row)
    raw = {r.vec_id: [float(x) for x in r.embedding] for r in vectors.collect()}
    dists = []
    for vid, vec in raw.items():
        codes = [_replay_code(vec, codebooks, s) for s in range(M)]
        acc = 0.0
        for s in range(M):
            acc += lut[s][codes[s]]
        dists.append((acc, vid))
    dists.sort()
    want = [(vid, d) for d, vid in dists[:10]]
    assert got == want  # ids AND doubles, bit-for-bit


def test_adc_topk_multi_matches_single_query_path(vectors):
    """Batch serving twin: the multi-query result restricted to one
    query equals adc_topk with that query's vector as the literal —
    ids AND doubles (the in-plan LUT reproduces the driver-computed
    LUT bit-for-bit); the two-level shard top-k equals the global
    top-k at any shard count."""
    from asterlake.operators.pq import adc_topk_multi

    codebooks = pq_codebooks(m=M, k=K, dim=DIM)
    codes_df = pq_encode(vectors, codebooks)
    queries = vectors.filter("vec_id < 3")
    got = adc_topk_multi(codes_df, queries, codebooks, k=7, n_shards=5)
    by_query = {}
    for r in got.collect():
        by_query.setdefault(r.query_id, []).append((r.vec_id, r.adc_dist))
    assert set(by_query) == {0, 1, 2}
    for qid, rows in by_query.items():
        qvec = [
            float(x)
            for x in vectors.filter(f"vec_id = {qid}").collect()[0].embedding
        ]
        want = [
            (r.vec_id, r.adc_dist)
            for r in adc_topk(codes_df, qvec, codebooks, k=7).collect()
        ]
        # multi output is unordered across queries; sort rows by rank key
        rows.sort(key=lambda t: (t[1], t[0]))
        assert rows == want, qid
    # shard-count invariance: 1 shard (plain per-query window) == 5
    one = {
        (r.query_id, r.vec_id, r.adc_dist)
        for r in adc_topk_multi(
            codes_df, queries, codebooks, k=7, n_shards=1
        ).collect()
    }
    assert one == {
        (q, v, d) for q, rows in by_query.items() for v, d in rows
    }


def test_adc_topk_multi_plan_shape(vectors):
    from asterlake.operators.pq import adc_topk_multi

    codebooks = pq_codebooks(m=M, k=K, dim=DIM)
    codes_df = pq_encode(vectors, codebooks)
    plan = (
        adc_topk_multi(codes_df, vectors.filter("vec_id < 3"), codebooks)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    # the query side broadcasts (nested-loop on the bounds-sized side)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_adc_rejects_dim_mismatch():
    codebooks = pq_codebooks(m=M, k=K, dim=DIM)
    with pytest.raises(ValueError, match="query dim"):
        adc_topk(None, [0.0] * 63, codebooks)
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks(m=7, k=K, dim=DIM)


def test_train_reduces_reconstruction_error_and_is_deterministic(vectors):
    sample = vectors.filter("vec_id < 200")
    init = pq_codebooks(m=M, k=K, dim=DIM)
    trained = pq_train(sample, m=M, k=K, dim=DIM, iters=3)
    sse0 = pq_reconstruction_sse(sample, init).collect()[0]
    sse1 = pq_reconstruction_sse(sample, trained).collect()[0]
    assert sse0.n == sse1.n == 200
    # Lloyd with exact quantized means: strictly better than the random
    # init on real data (not just non-increasing)
    assert sse1.sse < sse0.sse * 0.9
    # bit-reproducible: same seed + data -> identical floats
    again = pq_train(sample, m=M, k=K, dim=DIM, iters=3)
    assert trained == again
    # bounded model state
    assert len(trained) == M and all(len(s) == K for s in trained)
    assert all(len(c) == DIM // M for s in trained for c in s)


def test_two_stage_search_machinery_and_recall(vectors):
    """Two-stage pq_search at m=8, k=64 codes, exact-cosine rerank.

    (a) Machinery pin: with the shortlist covering the whole corpus
    (500), pq_search must equal brute-force cosine top-10 EXACTLY — ids
    and order — for every probe; any divergence is a join/ordering/
    scoring bug, not quantization.
    (b) Quality pin: at shortlist=50 (10% of the corpus), recall@10
    floors. The synthetic embeddings are near-uniform on the sphere —
    PQ's distance-concentration worst case — and still measure
    {7: 10, 123: 8, 250: 9, 401: 8, 42: 6}; floor 5, sum floor 37."""
    from asterlake.operators.pq import pq_search
    from asterlake.operators.similarity import topk_cosine

    trained = pq_train(vectors, m=M, k=64, dim=DIM, iters=3)
    codes = pq_encode(vectors, trained)
    total = 0
    for qid in (7, 123, 250, 401, 42):
        query_df = vectors.filter(f"vec_id = {qid}")
        query = [float(x) for x in query_df.collect()[0].embedding]
        exact = [
            r.vec_id for r in topk_cosine(vectors, query_df, k=10).collect()
        ]
        full = [
            r.vec_id
            for r in pq_search(
                vectors, codes, query, trained, k=10, shortlist=500
            ).collect()
        ]
        assert full == exact, qid
        got50 = {
            r.vec_id
            for r in pq_search(
                vectors, codes, query, trained, k=10, shortlist=50
            ).collect()
        }
        rec = len(set(exact) & got50)
        assert rec >= 5, (qid, rec)
        total += rec
    assert total >= 37, total


def test_shortlist_recall_floor_at_compact_codes(vectors):
    """ADC shortlist quality at the most aggressive setting (m=8, k=16:
    4 bits/subspace, 8 B/vector): the 50-candidate shortlist must catch
    most of the exact top-10 for every probe query. Measured per-query
    recall on this data: {7: 7, 123: 5, 250: 5, 401: 5, 42: 8} of 10 —
    the synthetic embeddings are near-uniform on the sphere (no cluster
    structure for Lloyd to exploit; training's value is pinned by the
    SSE test, its recall effect here is within noise of the seeded
    codebooks), so the floor is 4 with a sum floor of 25."""
    from asterlake.operators.similarity import topk_cosine

    trained = pq_train(vectors, m=M, k=K, dim=DIM, iters=3)
    codes = pq_encode(vectors, trained)
    total = 0
    for qid in (7, 123, 250, 401, 42):
        query_df = vectors.filter(f"vec_id = {qid}")
        query = [float(x) for x in query_df.collect()[0].embedding]
        exact = {
            r.vec_id
            for r in topk_cosine(vectors, query_df, k=11).collect()
            if r.vec_id != qid
        }
        short = {
            r.vec_id
            for r in adc_topk(codes, query, trained, k=50).collect()
        }
        rec = len(exact & short)
        assert rec >= 4, (qid, rec)
        total += rec
    assert total >= 25, total


def test_plan_shape_no_python_and_topk(vectors):
    codebooks = pq_codebooks(m=M, k=K, dim=DIM)
    codes_df = pq_encode(vectors, codebooks)
    plan = adc_topk(codes_df, [0.0] * DIM, codebooks, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    enc_plan = codes_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in enc_plan  # encode is a pure projection
    assert "BatchEvalPython" not in enc_plan


def _replay_cell(vec, centroids):
    """argmax cosine, first max wins (array_position semantics)."""
    import math

    qn = math.sqrt(sum(x * x for x in vec))
    best, best_s = 0, None
    for ci, c in enumerate(centroids):
        dot = 0.0
        for x, y in zip(c, vec):
            dot += float(x) * y
        cn = math.sqrt(sum(float(x) * float(x) for x in c))
        s = dot / (cn * qn) if cn and qn else 0.0
        if best_s is None or s > best_s:
            best, best_s = ci, s
    return best


def test_ivfpq_index_and_fullprobe_search_match_replay(vectors):
    """IVFADC machinery: cell assignment, residual codes, and the
    full-probe (nprobe = n_cells) search must all equal a same-fold
    Python replay — ids AND distance doubles."""
    from asterlake.operators.pq import ivfpq_index, ivfpq_search
    from asterlake.operators.similarity import ivf_centroids

    spark = vectors.sparkSession
    cents = ivf_centroids(k=8, dim=DIM, seed=7)
    codebooks = pq_codebooks(m=M, k=K, dim=DIM)
    idx = {(r.vec_id): (r.cell, list(r.codes))
           for r in ivfpq_index(vectors, cents, codebooks).collect()}
    raw = {r.vec_id: [float(x) for x in r.embedding] for r in vectors.collect()}
    assert len(idx) == len(raw)
    dsub = DIM // M
    for vid, vec in raw.items():
        cell = _replay_cell(vec, cents)
        resid = [vec[d] - float(cents[cell][d]) for d in range(DIM)]
        codes = [_replay_code(resid, codebooks, s) for s in range(M)]
        assert idx[vid] == (cell, codes), vid
    # full-probe search replay
    query = raw[7]
    got = [
        (r.vec_id, r.adc_dist)
        for r in ivfpq_search(
            spark, ivfpq_index(vectors, cents, codebooks), query,
            cents, codebooks, k=10, nprobe=8,
        ).collect()
    ]
    dists = []
    for vid, (cell, codes) in idx.items():
        r = [query[d] - float(cents[cell][d]) for d in range(DIM)]
        acc = 0.0
        for s in range(M):
            rs = r[s * dsub : (s + 1) * dsub]
            c = codebooks[s][codes[s]]
            lut = 0.0
            for x, y in zip(c, rs):
                d = float(x) - y
                lut += d * d
            acc += lut
        dists.append((acc, vid))
    dists.sort()
    assert got == [(vid, d) for d, vid in dists[:10]]


def test_ivfpq_probe_prunes_and_recall_floor(vectors):
    """nprobe=2 of 8 cells: the scored row set shrinks to the probed
    cells, and recall@10 against exact brute force clears the measured
    floor with residual-trained codebooks."""
    from asterlake.operators.pq import ivfpq_index, ivfpq_search, pq_train
    from asterlake.operators.similarity import ivf_centroids, topk_cosine
    from pyspark.sql import functions as F

    spark = vectors.sparkSession
    cents = ivf_centroids(k=8, dim=DIM, seed=7)
    # train the PQ codebooks on the RESIDUALS (the IVFADC discipline)
    c_lit = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in cents])
    from asterlake.operators.similarity import dot_double
    scores = F.transform(c_lit, lambda c: dot_double(c, F.col("embedding")))
    cell = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    resid_df = vectors.select(
        F.zip_with(
            F.col("embedding"),
            F.element_at(c_lit, cell + 1),
            lambda x, y: x.cast("double") - y,
        ).alias("embedding")
    )
    codebooks = pq_train(resid_df, m=M, k=64, dim=DIM, iters=3)
    idx_df = ivfpq_index(vectors, cents, codebooks)
    query_df = vectors.filter("vec_id = 7")
    query = [float(x) for x in query_df.collect()[0].embedding]
    exact = {r.vec_id for r in topk_cosine(vectors, query_df, k=10).collect()}
    got = ivfpq_search(spark, idx_df, query, cents, codebooks, k=50, nprobe=2)
    rows = got.collect()
    # pruning: every returned row sits in one of the 2 probed cells
    cells = {r.cell for r in idx_df.join(
        got.select("vec_id"), "vec_id").select("cell").collect()}
    assert len(cells) <= 2
    rec = len(exact & {r.vec_id for r in rows})
    assert rec >= 5, rec  # measured: nprobe=2 keeps most of the top-10


def test_ivfpq_plan_shape(vectors):
    from asterlake.operators.pq import ivfpq_index, ivfpq_search
    from asterlake.operators.similarity import ivf_centroids

    spark = vectors.sparkSession
    cents = ivf_centroids(k=8, dim=DIM, seed=7)
    codebooks = pq_codebooks(m=M, k=K, dim=DIM)
    idx_df = ivfpq_index(vectors, cents, codebooks)
    enc_plan = idx_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in enc_plan and "BatchEvalPython" not in enc_plan
    plan = ivfpq_search(
        spark, idx_df, [0.0] * DIM, cents, codebooks, k=5, nprobe=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# OPQ (parametric eigenvalue-allocation rotation, Ge et al. CVPR 2013)
# ---------------------------------------------------------------------------


def test_opq_rotation_orthogonal_deterministic(vectors):
    """The trained rotation is orthogonal (within the 6-decimal literal
    quantization) and bit-reproducible across retrains — the properties
    that make it a safe plan/oracle literal and make original-space
    cosine reranking exact."""
    import numpy as np

    from asterlake.operators.pq import opq_train_rotation

    R = np.array(opq_train_rotation(vectors, m=M, dim=DIM))
    assert R.shape == (DIM, DIM)
    err = np.abs(R @ R.T - np.eye(DIM)).max()
    # 64 products of two 6-decimal-quantized coords: << 1e-3
    assert err < 1e-3, err
    again = np.array(opq_train_rotation(vectors, m=M, dim=DIM))
    assert (R == again).all()


def test_opq_matches_pq_on_isotropic_corpus(vectors):
    """Honest no-gain pin: this corpus is isotropic (its covariance
    eigen-spread sits below the Marchenko-Pastur sampling-noise bound —
    measured in the r12 notes), so OPQ at equal code bytes must land
    WITHIN TRAINING NOISE of coordinate PQ, not beat it. Pinning parity
    here keeps the recall claim honest; the gain is pinned on planted
    anisotropy below."""
    from asterlake.operators.pq import (
        opq_train,
        pq_reconstruction_sse,
        pq_train,
        rotate_vectors,
    )

    pq_cb = pq_train(vectors, m=M, k=K, dim=DIM, iters=2)
    pq_sse = pq_reconstruction_sse(vectors, pq_cb).collect()[0].sse
    rot, opq_cb = opq_train(vectors, m=M, k=K, dim=DIM, iters=2)
    opq_sse = (
        pq_reconstruction_sse(rotate_vectors(vectors, rot), opq_cb)
        .collect()[0]
        .sse
    )
    assert opq_sse < 1.10 * pq_sse, (opq_sse, pq_sse)


def _planted_lowrank(spark, vectors):
    """A fixed low-rank-plus-ridge linear map over the corpus:
    ``A = 5 * U @ V.T + 0.2 * I`` with seeded orthonormal U, V (64 x 6)
    — the correlation structure real learned embeddings have (a few
    dominant factors smeared across every coordinate, so no coordinate
    slice is aligned with them). Coordinate PQ re-quantizes the same
    factors in every subspace; OPQ's PCA step concentrates them and
    eigenvalue allocation deals one factor direction per subspace.
    (Pure variance-scaling plants showed NO gain here — at m=8/k<=256
    on 500 points, per-subspace distortion tracks TOTAL variance, which
    is rotation-invariant; the measurable OPQ win is decorrelation of
    low-rank structure, matching the paper's SIFT/GIST results.)"""
    import numpy as np

    from asterlake.operators.pq import rotate_vectors

    rng = np.random.RandomState(7)
    U, _ = np.linalg.qr(rng.randn(DIM, 6))
    V, _ = np.linalg.qr(rng.randn(DIM, 6))
    A = 5.0 * U @ V.T + 0.2 * np.eye(DIM)
    A_lit = [[round(float(x), 6) for x in row] for row in A]
    return rotate_vectors(vectors, A_lit)


def test_opq_beats_pq_on_correlated_data(spark, vectors):
    """The measured OPQ gain (r11 verdict ask #3 said "measure"): on
    the planted low-rank-correlation corpus, equal-code-byte OPQ cuts
    reconstruction SSE vs coordinate PQ — measured at pin time: OPQ
    12.5 vs PQ 259.3 (a 95% cut: allocation spreads the six recovered
    factor directions one per subspace, where they get scalar-
    quantized almost exactly). The margin leaves 6x headroom over the
    measured ratio while still requiring a structural win."""
    from asterlake.operators.pq import (
        opq_train,
        pq_reconstruction_sse,
        pq_train,
        rotate_vectors,
    )

    skewed = _planted_lowrank(spark, vectors).cache()
    try:
        skewed.count()
        pq_cb = pq_train(skewed, m=M, k=64, dim=DIM, iters=3)
        pq_sse = pq_reconstruction_sse(skewed, pq_cb).collect()[0].sse
        rot, opq_cb = opq_train(skewed, m=M, k=64, dim=DIM, iters=3)
        opq_sse = (
            pq_reconstruction_sse(rotate_vectors(skewed, rot), opq_cb)
            .collect()[0]
            .sse
        )
        assert opq_sse < 0.30 * pq_sse, (opq_sse, pq_sse)
    finally:
        skewed.unpersist()


def test_opq_search_plan_shape(spark, sf_dir):
    """Same 100-TB plan contract as pq_search: no Python in the plan,
    broadcast shortlist join, TakeOrderedAndProject top-k."""
    from asterlake.queries import QUERIES

    df = QUERIES["q_ann_opq_search"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
