"""Benchmark decontamination: drop training documents that overlap an
evaluation set (training-data pipeline staple).

A corpus that contains the test questions of the benchmarks it will be
evaluated on produces inflated scores; the standard defence (GPT-3 appendix
C, PaLM, Llama papers) is n-gram overlap: a training document is
*contaminated* if it shares at least one word n-gram with any benchmark
document, and contaminated documents are dropped (or flagged for audit)
before training.

Scale shape (100 TB corpus vs a benchmark of ~10^4-10^6 documents):

- The benchmark side is tiny relative to the corpus, so its DISTINCT
  n-gram set is built once and **broadcast**; the corpus side never
  shuffles for the membership test — each corpus partition explodes its
  own shingles and probes the broadcast hash set map-side
  (``LEFT SEMI`` + broadcast hint => ``BroadcastHashJoin ... LeftSemi``).
- The per-document hit count aggregates (doc_id, shingle) rows that
  already passed the semi-join — i.e. only *contaminated* shingles reach
  the one shuffle, a vanishing fraction of the corpus.
- The final keep/drop is an anti-join of the corpus against the
  contaminated ID SET (ids only, never bodies), again broadcastable while
  the contaminated set is small; left un-hinted so AQE degrades it to a
  shuffle join gracefully if contamination is pervasive.

Shingling is shared with the dedup family (``operators/dedup.py:
word_shingles`` — distinct word n-grams), so the DuckDB oracle reuses the
same `_DUCK_SHINGLES` fragment and both engines see identical sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from asterlake.operators.dedup import word_shingles


def benchmark_ngrams(
    benchmark: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """The benchmark's distinct word n-gram set (one `shingle` column)."""
    return (
        benchmark.select(F.explode(word_shingles(text_col, n)).alias("shingle"))
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per contaminated document: how many of its distinct n-grams appear
    anywhere in the benchmark. Documents with zero overlap are absent."""
    corpus_sh = docs.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("shingle")
    )
    hits = corpus_sh.join(
        F.broadcast(benchmark_ngrams(benchmark, n, text_col)), "shingle", "left_semi"
    )
    return hits.groupBy(id_col).agg(F.count("*").alias("n_hit_ngrams"))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The corpus minus every document sharing >= 1 n-gram with the
    benchmark (all original columns preserved)."""
    contaminated = contamination_report(docs, benchmark, n, id_col, text_col).select(
        id_col
    )
    return docs.join(contaminated, id_col, "left_anti")


def contamination_scores(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GRADED contamination per document — every doc, not just hits:
    ``(id, n_ngrams, n_contaminated, contamination_ratio)``.

    The boolean drop (:func:`decontaminate`) is right for exact test-set
    matches; production pipelines also score the gray zone (popular
    quotes, licenses, boilerplate share n-grams with benchmarks without
    being leaks) and threshold on the overlap FRACTION. Totals are a
    row-local projection (``size(word_shingles(...))``), hits reuse the
    broadcast semi-join (only contaminated shingles reach a shuffle), and
    the ratio is one double division of exact BIGINTs. Shingle-less docs
    (< n tokens) get a NULL ratio, not 0 — no evidence either way.
    """
    totals = docs.select(
        F.col(id_col),
        F.size(word_shingles(text_col, n)).cast("bigint").alias("n_ngrams"),
    )
    hits = contamination_report(docs, benchmark, n, id_col, text_col)
    joined = totals.join(
        hits.select(
            F.col(id_col), F.col("n_hit_ngrams").alias("_hits")
        ),
        id_col,
        "left",
    )
    n_cont = F.coalesce(F.col("_hits"), F.lit(0)).cast("bigint")
    return joined.select(
        F.col(id_col),
        "n_ngrams",
        n_cont.alias("n_contaminated"),
        F.when(
            F.col("n_ngrams") > 0,
            n_cont.cast("double") / F.col("n_ngrams").cast("double"),
        ).alias("contamination_ratio"),
    )
