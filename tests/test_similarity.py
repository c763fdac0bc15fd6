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
