"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003 —
the MOSS algorithm).

The fingerprint families this engine already has are either whole-document
(``textstats.rolling_hash`` — any edit changes everything) or set-similarity
sketches (MinHash/SimHash — no positional guarantee). Winnowing fills the
gap between them: select a GUARANTEED-dense subset of k-gram hashes such
that any shared substring of at least ``w + k - 1`` tokens between two
documents is certain to share at least one selected fingerprint, while the
selected set stays ~2/(w+1) of all k-grams. That detection guarantee is
what plagiarism/mirror detection needs and sampling cannot give.

Algorithm (robust winnowing): hash every token k-gram; slide a window of
``w`` consecutive k-gram hashes; in each window select the minimum hash,
breaking ties by the RIGHTMOST position (so runs of equal hashes re-select
the same position across overlapping windows — the "robust" variant that
minimizes fingerprint count on low-entropy text).

Portability: hashes are the same explicit left-to-right polynomial folds as
``textstats.rolling_hash`` (char fold base 31, token fold base 131, mod
1e9+7), so DuckDB replays them bit-for-bit and every query here is
hash-gateable. The rightmost-argmin is expressed as
``position(reverse(window), min(window))`` — first match in the reversed
window IS the rightmost in the original — which both engines implement with
the same integer semantics.

Scale (100 TB corpus):

- Fingerprint extraction is ONE shuffle-free projection: tokens, k-gram
  hashes, window argmins are all row-local higher-order-function
  expressions, JVM-side (no Python). Cost per doc is O(n_tokens * (k + w))
  integer ops.
- The overlap join shuffles only (fingerprint, doc_id) int pairs — never
  text. Boilerplate fingerprints (headers, license blocks) are hot keys:
  ``max_df`` drops fingerprints shared by more than that many documents
  BEFORE the pair expansion, the standard MOSS practice — bounding every
  bucket's pair fan-out at max_df^2 and making the worst key finite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_hash_col",
    "kgram_hash_col",
    "winnow_select_col",
    "winnow_fingerprints",
    "winnow_overlap_pairs",
    "winnow_index",
    "winnow_index_matches",
]

MOD = 1_000_000_007
CHAR_BASE = 31
TOKEN_BASE = 131


def _tokens_sql(text_col: str) -> str:
    """NULL-safe whitespace tokenizer (the engine-wide convention):
    NULL text tokenizes to the EMPTY array, never NULL."""
    return (
        f"filter(split(trim(coalesce({text_col}, '')), '\\\\s+'), "
        "t -> t != '')"
    )


def token_hash_col(text_col: str) -> Column:
    """``array<long>`` of per-token polynomial char-fold hashes.

    MUST be materialized as its own projection column BEFORE the k-gram
    stage: inlining it into the per-k-gram lambda recomputes the O(chars)
    fold once per k-gram position — O(n^2) per document (measured 7.4s vs
    ~1s for the sf0.01 overlap query)."""
    tok_hash = (
        "aggregate(transform(sequence(1, length(t), 1), "
        "i -> ascii(substring(t, i, 1))), "
        f"0L, (acc, c) -> (acc * {CHAR_BASE} + c) % {MOD})"
    )
    return F.expr(
        f"transform({_tokens_sql(text_col)}, t -> {tok_hash})"
    )


def kgram_hash_col(th_col: str, k: int) -> Column:
    """``array<long>`` of polynomial k-gram hashes over the token-hash
    array column (from :func:`token_hash_col`). Position i (1-based)
    folds token hashes i..i+k-1 — O(n*k) long ops per row. Rows with
    fewer than k tokens produce the empty array."""
    # sequence(1, 0) is ILLEGAL in Spark (not empty) — guard short docs
    return F.expr(
        f"""
        if(size({th_col}) >= {k},
           transform(
             sequence(1, size({th_col}) - {k} + 1, 1),
             i -> aggregate(
               slice({th_col}, i, {k}),
               0L, (acc, h) -> (acc * {TOKEN_BASE} + h) % {MOD})),
           cast(array() as array<bigint>))
        """
    )


def winnow_select_col(kh_col: str, w: int) -> Column:
    """Distinct selected positions (1-based, ``array<int>``) under robust
    winnowing with window size ``w`` over the k-gram hash array column.

    Rightmost tie-break via first-match-in-reversed-window. A document
    with 0 < m < w k-grams gets exactly one window covering all m (so
    every non-trivial document yields at least one fingerprint); m = 0
    selects nothing."""
    win = f"slice({kh_col}, j, {w})"
    # sequence(1, 0) is ILLEGAL in Spark — empty hash arrays short-circuit
    return F.expr(
        f"""
        if(size({kh_col}) >= 1,
           array_distinct(transform(
             sequence(1, greatest(size({kh_col}) - {w} + 1, 1), 1),
             j -> cast(j + size({win})
                         - array_position(reverse({win}), array_min({win}))
                       as int))),
           cast(array() as array<int>))
        """
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exploded fingerprint table ``(id_col, pos, fp)`` — one row per
    selected k-gram: ``pos`` the 1-based token position of the k-gram,
    ``fp`` its polynomial hash. ONE shuffle-free projection + explode."""
    return (
        docs.select(
            F.col(id_col),
            token_hash_col(text_col).alias("_th"),
        )
        .select(
            F.col(id_col),
            kgram_hash_col("_th", k).alias("_kh"),
        )
        .select(
            F.col(id_col),
            F.explode(winnow_select_col("_kh", w)).alias("pos"),
            F.col("_kh"),
        )
        .select(
            F.col(id_col),
            F.col("pos"),
            F.element_at(F.col("_kh"), F.col("pos")).alias("fp"),
        )
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-duplicate pairs by shared winnowed fingerprints.

    Returns ``(id_a, id_b, shared_fps)`` with ``id_a < id_b`` and
    ``shared_fps >= min_shared`` — shared_fps counts DISTINCT shared
    fingerprint values (positions ignored, so reordered/shifted copies
    still match). ``max_df`` drops boilerplate fingerprints appearing in
    more than that many documents before the pair expansion (None keeps
    all — only safe at test scale)."""
    fps = (
        winnow_fingerprints(docs, k, w, id_col, text_col)
        .select(F.col(id_col).alias("_id"), "fp")
        .distinct()
        # landing zone: the index is referenced by the df-count, the
        # semi-join, and BOTH pair sides — without the pin Catalyst
        # re-runs the whole extraction once per reference. This is the
        # (doc, fp) index MOSS persists anyway.
        .localCheckpoint()
    )
    if max_df is not None:
        # map-side-combinable count, then semi-join — the hot-key-safe
        # shape (never a count-over window on the fingerprint)
        ok = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("fp")
        )
        fps = fps.join(ok, "fp", "left_semi")
    a = fps.select(F.col("_id").alias("id_a"), "fp")
    b = fps.select(F.col("_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("bigint").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def winnow_index(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Persistable corpus fingerprint index: the DISTINCT winnowed
    fingerprint values (one ``fp`` long per row — no text, no ids, no
    positions). Write once, append each admitted batch — the
    minhash/substring/semantic incremental-index discipline."""
    return (
        winnow_fingerprints(docs, k, w, id_col, text_col)
        .select("fp")
        .distinct()
    )


def winnow_index_matches(
    batch: DataFrame,
    index: DataFrame,
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Screen a NEW batch against the persisted fingerprint index:
    per batch document, its distinct fingerprint count, how many hit
    the index, and whether it is flagged (>= ``min_shared`` hits).
    NEVER new-vs-new — same-batch repeats only flag after their
    fingerprints are appended to the index (the incremental-dedup
    contract shared by every index tier). One semi-joinable inner join
    on the fp long; batch side broadcastable at production
    index:batch ratios."""
    fps = (
        winnow_fingerprints(batch, k, w, id_col, text_col)
        .select(F.col(id_col), "fp")
        .distinct()
    )
    hits = (
        fps.join(index.select("fp"), "fp", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_hits"))
    )
    totals = fps.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_fps")
    )
    return totals.join(hits, id_col, "left").select(
        F.col(id_col),
        "n_fps",
        F.coalesce(F.col("n_hits"), F.lit(0).cast("bigint")).alias(
            "n_hits"
        ),
        (
            F.coalesce(F.col("n_hits"), F.lit(0).cast("bigint"))
            >= F.lit(min_shared)
        ).alias("flagged"),
    )
