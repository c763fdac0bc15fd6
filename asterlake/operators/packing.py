"""Sequence packing: lay a tokenized corpus end-to-end into fixed-size
training sequences (GPT-style concat-and-chunk).

LLM pre-training consumes fixed-length sequences (e.g. 2048/4096 tokens);
documents are concatenated in a deterministic order and the stream is cut
every ``budget`` tokens. The operator computes, for every document, where
its tokens land: the global token offset, the pack (sequence) id, and the
offset inside that pack. Documents MAY straddle a pack boundary — that is
the concat-and-chunk contract (no padding waste); ``end_pack_id`` exposes
the straddle so a writer can route the document's token range to every
pack it touches.

The hard part at scale is the **global cumulative sum**: a single
``Window.orderBy(...)`` over the whole corpus collapses to ONE partition —
a non-starter at 100 TB. This implements the classic two-phase scan
instead:

1. Documents are assigned to ``n_buckets`` deterministic hash buckets
   (``sampling.hash_bucket`` — md5-keyed, partitioning-independent); the
   packing order is ``(bucket, id)``, which doubles as the corpus shuffle
   LLM training wants (hash order ~ random order, yet reproducible on any
   engine — same rationale as operators/sampling.py).
2. Phase 1: per-bucket prefix sums — ``Window.partitionBy(bucket)``, so
   the heavy scan runs at full parallelism (one partition per bucket;
   pick ``n_buckets`` ~ cluster cores x a few).
3. Phase 2: per-bucket totals (``n_buckets`` rows) get an exclusive
   prefix sum on a single trivially-small partition, then broadcast-join
   back: ``offset = bucket_prefix + intra_bucket_prefix``.

All arithmetic is int64 — bit-identical on any engine, so the DuckDB
oracle (one window over the same (bucket, id) order) matches exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from asterlake.operators.sampling import hash_bucket


def pack_sequences(
    docs: DataFrame,
    n_tokens: Column,
    budget: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document its slot in the packed token stream.

    Returns ``(id_col, n_tokens, offset, pack_id, pack_offset,
    end_pack_id)`` where ``offset`` is the document's first token's global
    position in (bucket, id) order, ``pack_id = offset // budget``,
    ``pack_offset = offset % budget``, and ``end_pack_id`` is the pack of
    its LAST token (> pack_id iff the document straddles packs).
    Zero-token documents occupy no slot; they keep offset semantics
    (end_pack_id = pack of the position they would start at).
    """
    base = docs.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        hash_bucket(F.col(id_col), n_buckets).alias("_bucket"),
    )
    intra = Window.partitionBy("_bucket").orderBy(id_col)
    with_intra = base.withColumn(
        "_intra_end", F.sum("n_tokens").over(intra)
    )
    totals = base.groupBy("_bucket").agg(F.sum("n_tokens").alias("_bucket_total"))
    # n_buckets rows: the single-partition window is over a broadcast-sized
    # table by construction, never the corpus
    prefix = totals.withColumn(
        "_bucket_prefix",
        F.coalesce(
            F.sum("_bucket_total").over(
                Window.orderBy("_bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_bucket", "_bucket_prefix")
    offset = F.col("_bucket_prefix") + F.col("_intra_end") - F.col("n_tokens")
    # `div`, not floor(a / b): long / long is a DOUBLE divide in Spark, and
    # doubles lose integer exactness past 2^53 — within reach of a 100 TB
    # corpus's global token offsets. Integral division stays exact.
    return (
        with_intra.join(F.broadcast(prefix), "_bucket")
        .withColumn("offset", offset)
        .selectExpr(
            id_col,
            "n_tokens",
            "offset",
            f"offset div {budget} AS pack_id",
            f"offset % {budget} AS pack_offset",
            f"(offset + greatest(n_tokens - 1, 0L)) div {budget} AS end_pack_id",
        )
    )
