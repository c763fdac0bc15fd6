"""Document chunking: sliding fixed-token windows over each document
(RAG / embedding-index preparation).

Retrieval pipelines embed fixed-size chunks, not whole documents; the
standard scheme is a token window of ``chunk_tokens`` advanced by
``stride`` (< chunk for overlap), with the last window clipped at the
document end. Chunk count per document is
``ceil(max(n_tokens - chunk, 0) / stride) + 1`` — chosen so the final
window always covers the tail.

Scale shape: entirely row-local — ONE tokenization per document builds
every chunk text in a single higher-order expression, then ``posexplode``
emits (chunk_id, chunk_text) rows. No shuffle, no UDF, linear in
executors. The token array is bound once inside a ``transform(array(...))``
wrapper: referencing ``split()`` from the per-chunk lambda directly would
re-tokenize once per CHUNK after CollapseProject (the measured 20x pitfall
documented at operators/dedup.py's simhash fold).

All-integer window arithmetic (`div`), so the DuckDB oracle (list
comprehension + unnest of (id, text) structs) matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode every document into overlapping token-window chunks.

    Returns ``(id_col, chunk_id, chunk_text, n_chunk_tokens)``; chunk_id
    counts from 0 in window order. Empty documents produce one empty
    chunk (kept: downstream joins stay total over doc ids).
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    chunks = F.expr(
        f"""
        element_at(transform(array(split({text_col}, ' ')), ts ->
          transform(
            sequence(0,
              (greatest(size(ts) - {chunk_tokens}, 0) + {stride} - 1)
                div {stride}),
            i -> array_join(slice(ts, i * {stride} + 1, {chunk_tokens}), ' ')
          )), 1)
        """
    )
    exploded = docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_text")
    )
    return exploded.select(
        id_col,
        "chunk_id",
        "chunk_text",
        F.size(F.split(F.col("chunk_text"), " ")).alias("n_chunk_tokens"),
    )
