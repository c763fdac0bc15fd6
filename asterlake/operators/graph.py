"""Connected components over candidate-pair edges (duplicate clustering).

Every dedup family in this engine (exact digests, MinHash/SimHash LSH,
n-gram Jaccard — operators/dedup.py) stops at *pairs*. A training-data
pipeline needs the transitive closure: if A~B and B~C, all three are one
duplicate *cluster* and one survivor should represent it. That closure is
connected components — the canonical iterative algorithm Spark has no
built-in operator for (GraphFrames is an external package), so it is
implemented here as a driver-coordinated fixpoint of DataFrame joins.

Algorithm: min-label propagation. Every vertex starts labeled with its own
id; each round every vertex takes the min of its label and its neighbors'
labels; converged when no label changes. Rounds = graph diameter.

Scale (100 TB corpus, billions of candidate edges):

- Each round is ONE shuffle join (labels ⋈ edges on the vertex id) + ONE
  partial-aggregated groupBy min — both key-partitioned on the vertex id,
  so AQE coalesces/splits per-round. Nothing driver-side except the
  convergence counter (a count() action per round — the unavoidable
  driver decision every iterative dataflow makes, same as GraphFrames/
  GraphX supersteps).
- Lineage is truncated every round with ``localCheckpoint`` — without it
  the plan doubles per iteration and round k replays rounds 1..k-1.
- Diameter bound: duplicate-cluster graphs are near-cliques (every member
  pairs with most others), so propagation converges in 2-3 rounds
  regardless of corpus size. For adversarial long-path graphs the
  large-star/small-star variant (Kiveris et al., "Connected Components in
  MapReduce and Beyond") converges in O(log^2 n) rounds; this simple
  propagation is the right trade for dedup workloads and is exact for any
  graph, just slower on pathological chains (``max_iter`` guards those).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """Label every vertex with the min vertex id reachable from it.

    ``edges`` is undirected input (each pair listed once is enough).
    ``vertices`` optionally supplies the full vertex set — pass it so
    isolated vertices (no edges) appear as their own singleton components;
    otherwise the vertex set is inferred from the edges alone.

    Returns ``(id_col, component)`` with component = min id in the
    component. Deterministic for any input partitioning.
    """
    und = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).unionByName(
        edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d"))
    )
    if vertices is None:
        vertices = und.select(F.col("_s").alias(id_col)).distinct()
    labels = vertices.select(
        F.col(id_col), F.col(id_col).alias("component")
    ).localCheckpoint()
    und = und.localCheckpoint()

    for _ in range(max_iter):
        # each vertex's best neighbor label this round
        nbr_min = (
            und.join(labels, und["_d"] == labels[id_col])
            .groupBy("_s")
            .agg(F.min("component").alias("_nbr"))
        )
        new_labels = (
            labels.join(nbr_min, labels[id_col] == nbr_min["_s"], "left")
            .select(
                F.col(id_col),
                F.least(
                    F.col("component"), F.coalesce(F.col("_nbr"), F.col("component"))
                ).alias("component"),
                (
                    F.coalesce(F.col("_nbr"), F.col("component"))
                    < F.col("component")
                ).alias("_changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels


def duplicate_clusters(
    doc_pairs: DataFrame,
    documents: DataFrame,
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
    doc_id: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Near-dup pairs -> one cluster id per document (singletons included).

    The survivor policy downstream is then trivial: keep
    ``doc_id == cluster`` (the min-id member) and drop the rest.
    """
    return connected_components(
        doc_pairs,
        vertices=documents.select(doc_id),
        src=pair_a,
        dst=pair_b,
        id_col=doc_id,
        max_iter=max_iter,
    ).withColumnRenamed("component", "cluster")
