"""Reciprocal-rank fusion (RRF) for hybrid retrieval.

Cormack, Clarke & Buettcher (SIGIR 2009): fuse N rankings by
``score(d) = sum_i 1 / (k + rank_i(d))`` — the scale-free fusion that
needs no score normalization across legs (BM25 and cosine live on
incomparable scales; q_hybrid_search's weighted sum needed a
saturation transform first). The standard k = 60.

Determinism discipline: the reciprocal is taken in exact integer
micro-units — ``rrf_micros(d) = sum_i 10^12 div (k + rank_i(d))`` —
so fused scores are exact BIGINTs, hash-gateable, and orderable
without any float summation-order hazard. (10^12 keeps three
significant digits of separation between ranks ~10^3 apart at k=60.)

Scale: retrieval legs are top-k lists — bounds-sized by construction
— so the per-leg rank window and the fused aggregation run over
(n_legs x k) rows, never the corpus. A document absent from a leg
contributes nothing for that leg (the standard RRF convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rrf_fuse"]

_MICROS = 1_000_000_000_000


def rrf_fuse(
    rankings: list[tuple[DataFrame, str]],
    id_col: str = "doc_id",
    k: int = 60,
    top: int | None = None,
) -> DataFrame:
    """Fuse retrieval legs into ``(id, rrf_micros, n_legs)``.

    ``rankings`` is a list of ``(frame, score_col)`` — each frame one
    leg's results (bounds-sized top-k lists: the per-leg rank window is
    intentionally unpartitioned, single-task per leg — correct and
    cheap for retrieval lists, NOT for corpus-sized frames; that
    precondition is the caller's contract), ranked within the leg by
    ``(score_col DESC, id ASC)`` (the id tiebreak makes ranks total,
    so fusion is deterministic under score ties). Duplicate ids within
    one leg collapse to their best score BEFORE ranking — a document
    contributes at most one rank per leg, so ``n_legs`` never exceeds
    ``len(rankings)``. ``top`` optionally truncates the fused output
    (TakeOrderedAndProject); ``top=0`` means zero rows, not
    "unlimited"."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    legs = []
    for frame, score_col in rankings:
        w = Window.orderBy(F.desc("_s"), F.asc(id_col))
        legs.append(
            frame.select(id_col, F.col(score_col).alias("_s"))
            .groupBy(id_col)
            .agg(F.max("_s").alias("_s"))
            .withColumn("_rank", F.row_number().over(w))
            .select(
                F.col(id_col).alias("_id"),
                F.expr(
                    f"CAST({_MICROS} div ({k} + _rank) AS BIGINT)"
                ).alias("_contrib"),
            )
        )
    unioned = legs[0]
    for other in legs[1:]:
        unioned = unioned.unionByName(other)
    fused = unioned.groupBy(F.col("_id").alias(id_col)).agg(
        F.sum("_contrib").cast("bigint").alias("rrf_micros"),
        F.count("*").cast("bigint").alias("n_legs"),
    )
    out = fused.orderBy(F.desc("rrf_micros"), F.asc(id_col))
    return out.limit(top) if top is not None else out
