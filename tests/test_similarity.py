"""Semantic tests for embedding similarity search: oracle parity proves
Spark==DuckDB on the declared queries; these prove the ANN machinery is
internally consistent (full-probe IVF == exact brute force)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asterlake.operators.similarity import (
    ivf_assign,
    ivf_centroids,
    ivf_probe_topk,
    topk_cosine,
)


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    yield df
    df.unpersist()  # a lingering cache rewrites later tests' plans


def test_ivf_full_probe_equals_bruteforce(spark, vectors):
    """nprobe == n_cells means IVF scans everything — it must reproduce
    exact brute-force top-k for every query, cosine included."""
    cents = ivf_centroids(k=8, dim=64, seed=7)
    queries = vectors.filter("vec_id < 3")
    got = {
        (r.query_id, r.vec_id, round(r.cosine, 9))
        for r in ivf_probe_topk(
            vectors, queries, cents, nprobe=8, k=5
        ).collect()
    }
    want = set()
    for q in queries.collect():
        one = vectors.filter(F.col("vec_id") == q.vec_id)
        rest = vectors.filter(F.col("vec_id") != q.vec_id)
        for r in topk_cosine(rest, one, k=5).collect():
            want.add((q.vec_id, r.vec_id, round(r.cosine, 9)))
    assert got == want


def test_ivf_probe_results_lie_in_probed_cells(spark, vectors):
    """Every returned neighbor must belong to one of the query's nprobe
    best cells — the invariant that makes IVF an *inverted file*."""
    cents = ivf_centroids(k=8, dim=64, seed=7)
    queries = vectors.filter("vec_id < 3")
    res = ivf_probe_topk(vectors, queries, cents, nprobe=2, k=10)
    cells = {
        r.vec_id: r.centroid_id for r in ivf_assign(vectors, cents).collect()
    }
    # recompute each query's probe set from the assignment scores
    import numpy as np

    c = np.array(cents)
    for row in res.collect():
        qv = np.array(
            vectors.filter(F.col("vec_id") == row.query_id)
            .select("embedding")
            .first()[0],
            dtype=np.float64,
        )
        scores = c @ qv
        probe = list(np.argsort(-scores, kind="stable")[:2])
        assert cells[row.vec_id] in probe


def test_blocked_pairs_srp_composition_agrees_with_label_blocking(spark):
    """The SRP-bucket-blocked path must produce the same cosine for every
    pair BOTH blockings admit (common subset): blocking changes candidate
    generation, never pair scoring. Synthetic clusters of near-identical
    vectors guarantee collisions under both blockings."""
    import numpy as np

    from asterlake.operators.similarity import (
        blocked_neighbor_pairs,
        srp_hyperplanes,
        srp_signature,
    )

    dim = 16
    rng = np.random.RandomState(3)
    centers = rng.randn(4, dim)
    rows = []
    for i in range(40):
        c = i % 4
        v = centers[c] + 0.01 * rng.randn(dim)  # tight cluster => same bucket
        rows.append((i, f"lbl{c}", [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")

    planes = srp_hyperplanes(n_planes=8, dim=dim, seed=42)
    by_label = {
        (r.vec_a, r.vec_b): round(r.cosine, 9)
        for r in blocked_neighbor_pairs(df, "label", 0.4).collect()
    }
    by_srp = {
        (r.vec_a, r.vec_b): round(r.cosine, 9)
        for r in blocked_neighbor_pairs(
            df, srp_signature(F.col("embedding"), planes), 0.4
        ).collect()
    }
    common = set(by_label) & set(by_srp)
    assert common, "expected some pairs to collide under both blockings"
    for pair in common:
        assert by_label[pair] == by_srp[pair]


def test_blocked_pairs_max_block_rows_caps_hot_block(spark):
    """A degenerate hot block (every row shares one key) must obey the cap:
    the surviving candidate set is min(n, cap) rows -> at most cap*(cap-1)/2
    pairs, with a deterministic (run-stable) survivor set."""
    from asterlake.operators.similarity import blocked_neighbor_pairs

    n, cap = 40, 10
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.lit("hot").alias("label"),
        F.array(F.lit(1.0), F.lit(0.5)).alias("embedding"),  # all identical
    )
    capped = blocked_neighbor_pairs(
        df, "label", 0.9, max_block_rows=cap
    ).collect()
    assert len(capped) == cap * (cap - 1) // 2
    # deterministic survivor set: same result on a re-run
    again = blocked_neighbor_pairs(df, "label", 0.9, max_block_rows=cap).collect()
    assert sorted((r.vec_a, r.vec_b) for r in capped) == sorted(
        (r.vec_a, r.vec_b) for r in again
    )
    # uncapped would be the full quadratic set
    full = blocked_neighbor_pairs(df, "label", 0.9).count()
    assert full == n * (n - 1) // 2


def test_kmeans_fit_reduces_assignment_cost_and_is_deterministic(spark):
    """5 Lloyd iterations must not worsen (and in practice improve) the
    mean max-cosine assignment score vs the seeded init, and the whole
    fit is bit-deterministic across runs."""
    from pyspark.sql import functions as F

    from asterlake.operators.similarity import (
        ivf_centroids,
        kmeans_fit,
        kmeans_step,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def mean_best_cosine(centroids):
        c_lit = F.array(
            *[F.array(*[F.lit(float(x)) for x in row]) for row in centroids]
        )
        scores = F.transform(
            c_lit,
            lambda c: F.aggregate(
                F.zip_with(
                    c, F.col("embedding"), lambda x, y: x * y.cast("double")
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        return e.select(F.array_max(scores).alias("s")).agg(
            F.avg("s")
        ).collect()[0][0]

    init = ivf_centroids(k=8, dim=64, seed=7)
    fitted = kmeans_fit(e, k=8, dim=64, iters=5, seed=7)
    assert mean_best_cosine(fitted) >= mean_best_cosine(init)
    assert fitted == kmeans_fit(e, k=8, dim=64, iters=5, seed=7)
    # the gated step over the fitted codebook still returns k x dim rows
    assert kmeans_step(e, fitted).count() <= 8 * 64


def test_pca_project_matches_numpy_reference(spark):
    import numpy as np

    from asterlake.operators.similarity import pca_project

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {
        r.vec_id: (r.pc1, r.pc2)
        for r in pca_project(e, dim=64, k=2).collect()
    }

    pdf = e.toPandas().sort_values("vec_id")
    X = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    Xc = X - X.mean(axis=0)
    cov = Xc.T @ Xc / len(X)
    _, vecs = np.linalg.eigh(cov)
    for i, comp in enumerate([vecs[:, -1], vecs[:, -2]], 0):
        pivot = int(np.argmax(np.abs(comp)))
        if comp[pivot] < 0:
            comp = -comp
        ref = Xc @ comp
        for vid, r in zip(pdf.vec_id, ref):
            assert abs(got[vid][i] - r) < 1e-9, (vid, i, got[vid][i], r)


def test_pca_project_partitioning_invariant_and_shuffle_free(spark):
    from asterlake.operators.similarity import pca_project
    from asterlake.plans.inspect import node_count, plan_string

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {r.vec_id: r.pc1 for r in pca_project(e, dim=64, k=1).collect()}
    b = {
        r.vec_id: r.pc1
        for r in pca_project(e.repartition(13), dim=64, k=1).collect()
    }
    for vid in a:
        # Gram partials sum in collect order -> same values to float
        # round-off; the projection itself is a fixed-order fold
        assert abs(a[vid] - b[vid]) < 1e-9
    # the projection pass is a pure per-row fold: no exchange at all
    plan = plan_string(pca_project(e, dim=64, k=2))
    assert node_count(plan, "Exchange") == 0


def test_pca_verify_invariants_all_true(spark):
    from asterlake.operators.similarity import pca_verify

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = pca_verify(e, dim=64, k=2).collect()
    assert len(rows) == e.count()
    flags = [
        "recon_ok",
        "orthonormal_ok",
        "mean_zero_ok",
        "var_match_ok",
        "var_ordered_ok",
        "cov_diag_ok",
        "trace_match_ok",
    ]
    for r in rows:
        for f in flags:
            assert r[f] is True, (r["vec_id"], f)


def test_pca_verify_gate_has_teeth(spark):
    """A deliberately wrong model must flip the in-plan booleans — the
    gate is a real verifier, not a tautology."""
    import numpy as np

    from asterlake.operators.similarity import pca_fit, pca_verify

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    mu, comps, eigs, trace = pca_fit(e, dim=64, k=2)

    # swap the two components: variances no longer descend, and neither
    # matches its claimed eigenvalue
    swapped = (mu, [comps[1], comps[0]], eigs, trace)
    r = pca_verify(e, dim=64, k=2, _model=swapped).limit(1).collect()[0]
    assert r.var_match_ok is False
    assert r.var_ordered_ok is False

    # perturb a component off the eigenbasis: score covariance is no
    # longer diagonal and the variance!=eigenvalue check trips
    v1 = np.asarray(comps[0]) * 0.6 + np.asarray(comps[1]) * 0.8
    v1 /= np.linalg.norm(v1)
    tilted = (mu, [v1, comps[1]], eigs, trace)
    r = pca_verify(e, dim=64, k=2, _model=tilted).limit(1).collect()[0]
    assert r.cov_diag_ok is False

    # wrong mean: score means drift off zero
    off = (mu + 0.05, comps, eigs, trace)
    r = pca_verify(e, dim=64, k=2, _model=off).limit(1).collect()[0]
    assert r.mean_zero_ok is False

    # wrong trace claim (a broken Gram pass): trace_match trips
    bad_tr = (mu, comps, eigs, trace * 1.01)
    r = pca_verify(e, dim=64, k=2, _model=bad_tr).limit(1).collect()[0]
    assert r.trace_match_ok is False


def test_cosine_zero_vector_is_null_not_crash(spark):
    """A zero-norm embedding (failed encode) must score NULL against any
    query — sorting last under top-k — instead of ANSI-crashing the scan
    (r6 hazard sweep). DuckDB computes the same NULL on zero division."""
    from pyspark.sql import functions as F

    from asterlake.operators.similarity import cosine

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    q = F.lit([1.0, 0.0]).cast("array<double>")
    rows = {
        r.vec_id: r.c
        for r in df.select(
            "vec_id", cosine(F.col("embedding"), q).alias("c")
        ).collect()
    }
    assert rows[1] is None
    assert rows[2] == 1.0


def test_semantic_dedup_matches_bruteforce_within_cluster(spark, vectors):
    """SemDeDup differential: the operator (literal-codebook blocking +
    blocked pairs + min-label closure) must reproduce a brute-force
    numpy twin — assign every vector to its max-dot centroid, scan ALL
    within-cluster pairs, union-find components, min-id survivor —
    on a kmeans_fit-TRAINED codebook (the full training+dedup
    composition, not just the seeded demo codebook)."""
    import numpy as np

    from asterlake.operators.similarity import kmeans_fit, semantic_dedup

    small = vectors.filter("vec_id < 200")
    cents = kmeans_fit(small, k=6, dim=64, iters=3, seed=11)
    got = {
        r.vec_id: (r.centroid_id, r.sem_cluster, r.is_survivor)
        for r in semantic_dedup(small, cents, 0.35).collect()
    }

    rows = sorted(
        (r.vec_id, np.asarray(r.embedding, dtype=np.float64))
        for r in small.collect()
    )
    ids = [i for i, _ in rows]
    X = np.stack([v for _, v in rows])
    C = np.asarray(cents, dtype=np.float64)
    assign = (X @ C.T).argmax(axis=1)  # ties->lower id, argmax matches
    norms = np.linalg.norm(X, axis=1)

    parent = {i: i for i in ids}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if assign[i] != assign[j]:
                continue
            cos = (X[i] @ X[j]) / (norms[i] * norms[j])
            if cos >= 0.35:
                ra, rb = find(ids[i]), find(ids[j])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {
        ids[i]: (int(assign[i]), find(ids[i]), find(ids[i]) == ids[i])
        for i in range(n)
    }
    assert got == want
    # the run is non-degenerate: at least one real semantic-dup group
    assert any(not surv for _, _, surv in got.values())


def test_semantic_dedup_is_partitioning_invariant(spark, vectors):
    """Same output under a different input partitioning — no engine
    hash or partition order leaks into clusters or survivors."""
    from asterlake.operators.similarity import ivf_centroids, semantic_dedup

    cents = ivf_centroids(k=8, dim=64, seed=7)
    small = vectors.filter("vec_id < 300")
    a = {
        tuple(r)
        for r in semantic_dedup(small, cents, 0.4).collect()
    }
    b = {
        tuple(r)
        for r in semantic_dedup(
            small.repartition(7, "vec_id"), cents, 0.4
        ).collect()
    }
    assert a == b and len(a) == 300


def test_semantic_index_matches_bruteforce_and_never_new_vs_new(spark, vectors):
    """Incremental SemDeDup differential: flagged set, candidate counts,
    best match and best cosine equal a brute-force numpy twin computed
    within cells only; new-vs-new pairs never flag."""
    import numpy as np

    from asterlake.operators.similarity import (
        ivf_centroids,
        semantic_assign_index,
        semantic_index_matches,
    )

    cents = ivf_centroids(k=8, dim=64, seed=7)
    allv = vectors.filter("vec_id < 300")
    new = allv.filter("vec_id % 10 = 0")
    idxd = allv.filter("vec_id % 10 != 0")
    index = semantic_assign_index(idxd, cents)
    got = {
        r.vec_id: (r.n_candidates, r.best_match, round(r.best_cosine, 9))
        for r in semantic_index_matches(new, index, cents, 0.35).collect()
    }

    rows = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in allv.collect()}
    C = np.asarray(cents, dtype=np.float64)
    assign = {i: int((v @ C.T).argmax()) for i, v in rows.items()}
    want = {}
    for ni, nv in rows.items():
        if ni % 10 != 0:
            continue
        cands = []
        for ii, iv in rows.items():
            if ii % 10 == 0 or assign[ii] != assign[ni]:
                continue
            cos = (nv @ iv) / (np.linalg.norm(nv) * np.linalg.norm(iv))
            if cos >= 0.35:
                cands.append((cos, ii))
        if cands:
            bc = max(c for c, _ in cands)
            bm = min(i for c, i in cands if c == bc)
            want[ni] = (len(cands), bm, round(bc, 9))
    assert got == want
    assert want, "fixture must produce at least one flagged vector"


def test_semantic_index_partitioned_landing_round_trip(spark, vectors):
    """The persistable-index contract: cell-partitioned parquet landing
    round-trips (partition column type included) and screening results
    are identical to the fresh in-memory index."""
    import tempfile

    from asterlake.operators.similarity import (
        ivf_centroids,
        semantic_assign_index,
        semantic_index_matches,
    )

    cents = ivf_centroids(k=8, dim=64, seed=7)
    allv = vectors.filter("vec_id < 200")
    new = allv.filter("vec_id % 10 = 0")
    idxd = allv.filter("vec_id % 10 != 0")
    d = tempfile.mkdtemp()
    semantic_assign_index(idxd, cents).write.partitionBy(
        "centroid_id"
    ).mode("overwrite").parquet(d)
    persisted = spark.read.parquet(d).select(
        "vec_id", F.col("centroid_id").cast("int").alias("centroid_id"),
        "embedding",
    )
    a = {tuple(r) for r in semantic_index_matches(
        new, semantic_assign_index(idxd, cents), cents, 0.35).collect()}
    b = {tuple(r) for r in semantic_index_matches(
        new, persisted, cents, 0.35).collect()}
    assert a == b and a


def test_srp_multiprobe_signatures_hamming1(spark):
    from asterlake.operators.similarity import (
        srp_hyperplanes,
        srp_multiprobe_signatures,
    )

    planes = srp_hyperplanes(n_planes=5, dim=8, seed=3)
    df = spark.createDataFrame(
        [(1, [float(i % 3 - 1) for i in range(8)])],
        "vec_id long, embedding array<double>",
    )
    probes = df.select(
        srp_multiprobe_signatures(F.col("embedding"), planes).alias("p")
    ).collect()[0].p
    assert len(probes) == 6 and len(set(probes)) == 6
    own = probes[0]
    for flip in probes[1:]:
        assert len(flip) == len(own)
        assert sum(a != b for a, b in zip(own, flip)) == 1


def test_srp_multiprobe_recall_superset_of_single_probe(spark, sf_dir):
    """Multiprobe candidates strictly contain the single-bucket
    candidates, so its top-k cosine floor can only improve."""
    from asterlake.operators.similarity import (
        srp_bucket,
        srp_multiprobe_topk,
    )
    from asterlake.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0)
    multi = {
        r.vec_id
        for r in srp_multiprobe_topk(
            q, e, dim=64, k=10**6, n_planes=4, seed=42
        ).collect()
    }
    buckets = srp_bucket(e, dim=64, n_planes=4, seed=42)
    q_bucket = buckets.filter(F.col("vec_id") == 0).collect()[0].bucket
    single = {
        r.vec_id
        for r in buckets.filter(
            (F.col("bucket") == q_bucket) & (F.col("vec_id") != 0)
        ).collect()
    }
    assert single <= multi
    assert len(multi) > len(single)  # the flips probe real extra buckets
