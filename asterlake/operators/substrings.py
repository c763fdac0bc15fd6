"""Corpus-wide exact repeated-substring detection and scrubbing — the
suffix-array dedup tier of Lee et al., "Deduplicating Training Data
Makes Language Models Better" (ACL 2022): find every substring of at
least ``min_tokens`` tokens that occurs more than once ANYWHERE in the
corpus (across documents or within one), report each document's maximal
duplicated spans, and optionally scrub every occurrence but the
corpus-first one.

The reference (VictorClvtt/nasa_asteroid_data_lakehouse) has no dedup
surface at all — this module is beyond-parity scale tooling, the one
major dedup tier §8.3 still lacked: ``dedup.span_dedup`` scrubs FIXED
segment-grid spans and ``chunking.cdc_chunks`` finds shared content-
defined chunks, but neither finds the *maximal* repeated substrings at
every alignment, which is exactly what ExactSubstr's suffix array
yields.

Distributed shape (the sorted-k-mer-anchoring approximation of a
suffix array): a length->=L repeated substring exists iff every one of
its L-token windows is corpus-duplicated, so

1. every document emits one (digest, doc, pos) row per L-token window
   — ROW-LOCAL, the token array bound once per document (the
   CollapseProject re-tokenization pitfall documented at
   dedup.word_shingles);
2. a map-side-combined groupBy count flags duplicated digests, joined
   back to the window table (semi-join) — the shuffles carry (16-byte
   digest, doc, pos) triples and (digest, count) pairs, NEVER window
   text (at 100 TB the windows are ~L x corpus size; text-keyed
   shuffles are the non-starter a suffix array exists to avoid), and
   a hot boilerplate digest combines to one partial row per map
   partition instead of flooding a single window partition;
3. per-document gaps-and-islands over the duplicated positions merges
   coverage-touching duplicated windows (next start within L of the
   previous) into MAXIMAL spans: a merged run of starts [a..b] covers
   the contiguous tokens [a, b+L) — one doc-keyed shuffle of
   (doc, pos) int pairs.

Equality is judged on md5 digests, not window text — the same
16-byte-digest trust ``dedup.span_dedup`` pins: a false merge needs an
md5 collision between two L-token windows of the same corpus
(~n^2/2^128; at 10^13 windows, ~10^-13). The DuckDB oracles group on
the raw window TEXT, so the declared queries also differentially pin
the no-collision fact on real data every round.

Scrubbing keeps the corpus-FIRST occurrence of every duplicated window
(min (doc, pos) within its digest group — deterministic, never an
engine hash) and drops every token covered by any LATER occurrence;
documents rebuild from their surviving tokens. This is ExactSubstr's
"remove all but one copy" at window granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "substring_windows",
    "repeated_substring_spans",
    "scrub_repeated_substrings",
    "substring_digest_index",
    "substring_index_matches",
]


def _windows_sql(text_col: str, k: int) -> str:
    """One (pos, dig) struct per k-token window — whitespace/NULL-safe
    tokenization (NULL text = empty stream), token array bound ONCE via
    the 1-element transform wrapper, md5 over the space-joined window."""
    toks = (
        f"filter(split(trim(coalesce({text_col}, '')), '\\\\s+'),"
        " t -> t != '')"
    )
    return f"""
    flatten(transform(array({toks}), toks ->
      CASE WHEN size(toks) >= {k}
           THEN transform(sequence(0, size(toks) - {k}),
                  i -> named_struct(
                         'pos', i,
                         'dig', md5(array_join(slice(toks, i + 1, {k}), ' '))))
           ELSE CAST(array() AS array<struct<pos:int,dig:string>>)
      END))
    """


def substring_windows(
    docs: DataFrame,
    min_tokens: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id_col, pos int, dig string)`` — one row per ``min_tokens``-
    token window of every document, at every alignment. Row-local
    (one tokenization per document); the explode multiplies rows by
    ~n_tokens but each carries only (id, int, 16-byte digest)."""
    return docs.select(
        F.col(id_col), F.explode(F.expr(_windows_sql(text_col, min_tokens))).alias("_w")
    ).select(id_col, F.col("_w.pos").alias("pos"), F.col("_w.dig").alias("dig"))


def repeated_substring_spans(
    docs: DataFrame,
    min_tokens: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal corpus-duplicated spans per document:
    ``(id_col, start_tok int, end_tok int, span_tokens int)`` with
    ``[start_tok, end_tok)`` 0-based token indices — exactly the token
    ranges covered by some >= ``min_tokens``-token substring that
    occurs >= 2 times in the corpus (Lee et al. 2022 semantics; any
    two occurrences count, same-document repeats included).

    Duplicate detection is a groupBy-count + semi-join, NOT a
    ``count(*) OVER (PARTITION BY dig)`` window (ADVICE r10): a hot
    boilerplate digest would shuffle every one of its occurrences into
    a single window partition — the groupBy is map-side combinable (the
    hot key contributes ONE combined row per map partition to the count
    shuffle) and the semi-join's probe-side skew is AQE-splittable,
    which a window partition never is. Three exchanges total (count
    partials, probe repartition, doc-keyed island merge) — every one
    carrying int triples / (digest, count) pairs, never text.
    """
    win = substring_windows(docs, min_tokens, id_col, text_col)
    dup_digests = (
        win.groupBy("dig")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") >= 2)
        .select("dig")
    )
    dup = win.join(dup_digests, "dig", "left_semi").select(id_col, "pos")
    return _maximal_spans(dup, min_tokens, id_col)


def _maximal_spans(
    flagged: DataFrame, min_tokens: int, id_col: str
) -> DataFrame:
    """Merge flagged window starts ``(id_col, pos)`` into MAXIMAL covered
    spans — gaps-and-islands by token COVERAGE: window [p, p+L) and the
    next start q merge iff q <= p + L (their covered regions touch or
    overlap — all windows share length L, so the previous start is the
    running coverage frontier); a merged run [a..b] of starts covers the
    contiguous tokens [a, b+L). One doc-keyed shuffle of (id, int)
    pairs; the final groupBy reuses the doc partitioning."""
    w = Window.partitionBy(id_col).orderBy("pos")
    new_island = F.when(
        F.lag("pos").over(w).isNull()
        | (F.col("pos") - F.lag("pos").over(w) > F.lit(min_tokens)),
        F.lit(1),
    ).otherwise(F.lit(0))
    grp = (
        F.sum(new_island)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_grp")
    )
    return (
        flagged.select(F.col(id_col), F.col("pos"), grp)
        .groupBy(id_col, "_grp")
        .agg(
            F.min("pos").alias("start_tok"),
            (F.max("pos") + F.lit(min_tokens)).alias("end_tok"),
        )
        .select(
            id_col,
            F.col("start_tok").cast("int").alias("start_tok"),
            F.col("end_tok").cast("int").alias("end_tok"),
            (F.col("end_tok") - F.col("start_tok"))
            .cast("int")
            .alias("span_tokens"),
        )
    )


def scrub_repeated_substrings(
    docs: DataFrame,
    min_tokens: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ExactSubstr scrubbing, corpus-first survivor: for every
    duplicated window, the occurrence with the smallest (doc, pos)
    survives; every token covered by a LATER occurrence is dropped, and
    each document rebuilds from its surviving tokens. Returns
    ``(id_col, n_tokens int, n_scrubbed int, text_clean string)``.

    A token survives iff NO non-canonical duplicated window covers it —
    so a document that shares a boilerplate block with an earlier
    document loses the whole block, while the earliest copy keeps it
    (unless a different, earlier-duplicated window also covers those
    tokens). Deterministic: ranks order by (doc, pos), never an engine
    hash or partition order.

    The canonical-occurrence pick is a groupBy min(struct(doc, pos)) +
    join, not a digest-partitioned row_number window (ADVICE r10, same
    hot-digest rationale as :func:`repeated_substring_spans`): the
    min-struct aggregate combines map-side, so a boilerplate digest
    with millions of occurrences ships one partial row per map
    partition instead of concentrating every occurrence in one window
    partition, and the probe-side join skew is AQE-splittable.

    Shuffles: digest count/min partials + probe repartition, doc-keyed
    covered-position distinct, doc-keyed anti-join + rebuild — all
    (id, int) payloads except the final token rebuild, which is
    doc-local text."""
    win = substring_windows(docs, min_tokens, id_col, text_col)
    firsts = (
        win.groupBy("dig")
        .agg(
            F.count("*").alias("_n"),
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first"),
        )
        .where(F.col("_n") >= 2)
        .select("dig", "_first")
    )
    later = (
        win.join(firsts, "dig")
        .where(F.struct(F.col(id_col), F.col("pos")) != F.col("_first"))
        .select(id_col, "pos")
    )
    covered = later.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(min_tokens - 1))
        ).alias("ti"),
    ).distinct()
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != "",
    )
    pos_tok = docs.select(
        F.col(id_col), F.posexplode_outer(toks).alias("ti", "tok")
    )
    kept = pos_tok.join(covered, [id_col, "ti"], "left_anti")
    kept_agg = kept.groupBy(id_col).agg(
        # posexplode_outer keeps empty docs as one null-token row, and
        # count("tok") ignores it; collect_list skips the null structs
        F.count("tok").cast("int").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("tok").isNotNull(),
                            F.struct(F.col("ti"), F.col("tok")),
                        )
                    )
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text_clean"),
    )
    # docs drives the join: a FULLY-scrubbed document still comes back
    # (n_kept 0, empty text), it must not vanish from the output
    return (
        docs.select(F.col(id_col), F.size(toks).alias("n_tokens"))
        .join(kept_agg, id_col, "left")
        .select(
            id_col,
            F.col("n_tokens").cast("int").alias("n_tokens"),
            (
                F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))
            )
            .cast("int")
            .alias("n_scrubbed"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )


def substring_digest_index(
    docs: DataFrame,
    min_tokens: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Persistable corpus window-digest INDEX: the DISTINCT 16-byte md5
    digests of every ``min_tokens``-token window in ``docs`` — one
    string column ``dig``. The production ingest shape (r10 verdict ask
    #3, the ``minhash_band_table`` layout for the ExactSubstr tier):
    write it once for the standing corpus, append each admitted batch's
    digests, and screen every NEW batch against it with
    :func:`substring_index_matches` — the corpus is never re-windowed
    per ingest and new documents are never compared against each other.
    ~16 bytes x distinct windows: no text, no positions, no doc ids."""
    return (
        substring_windows(docs, min_tokens, id_col, text_col)
        .select("dig")
        .distinct()
    )


def substring_index_matches(
    new_docs: DataFrame,
    index: DataFrame,
    min_tokens: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental ExactSubstr screening: which NEW documents contain a
    >= ``min_tokens``-token substring already present in the corpus
    index — the triage row a quarantine/scrub decision needs, without
    ever comparing new-vs-new (same-batch repeats do NOT flag; they are
    next batch's problem, after this batch's digests append to the
    index). ``index`` is the ``dig`` relation from
    :func:`substring_digest_index` (freshly built or read back from its
    parquet landing).

    Per flagged new document: ``n_spans`` (maximal index-covered spans,
    merged by the same coverage islands as
    :func:`repeated_substring_spans`), ``dup_tokens`` (total tokens
    covered), ``max_span_tokens`` (longest single span) — unflagged
    documents are absent.

    Scale: the new batch is orders of magnitude smaller than the index,
    so the semi-join on ``dig`` broadcasts the BATCH side's windows
    under AQE while the index streams map-side; shuffles carry (digest)
    and (id, int) rows only, never text."""
    win = substring_windows(new_docs, min_tokens, id_col, text_col)
    hits = win.join(index.select("dig"), "dig", "left_semi").select(
        id_col, "pos"
    )
    spans = _maximal_spans(hits, min_tokens, id_col)
    return spans.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_spans"),
        F.sum("span_tokens").cast("bigint").alias("dup_tokens"),
        F.max("span_tokens").cast("int").alias("max_span_tokens"),
    )
