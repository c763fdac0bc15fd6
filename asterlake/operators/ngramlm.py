"""Distributed n-gram language-model training and document scoring —
the KenLM role in a training-data pipeline: perplexity-filter a corpus
against an in-domain LM (Heafield, "KenLM: Faster and Smaller Language
Model Queries", WMT 2011; the CCNet/RefinedWeb quality-filter stage).

The reference (VictorClvtt/nasa_asteroid_data_lakehouse) has no LM
surface at all — this module is beyond-parity scale tooling, same tier
as :mod:`asterlake.operators.bpe` / :mod:`asterlake.operators.unigram`.

Model construction (closed vocabulary, add-k smoothing):

1. ``top_vocab`` — the top ``vocab_size`` unigrams by exact corpus
   count. Every out-of-vocabulary token maps to ``<unk>`` BEFORE
   bigram counting (the standard closed-vocab construction), so the
   model is finite and broadcastable no matter the corpus size.
2. ``bigram_counts`` — one corpus pass: adjacent token pairs with a
   ``<s>`` sentence-start context, exploded and group-summed.
   Map-side combinable; the shuffle carries DISTINCT (w1, w2) pairs
   only — Zipf-bounded (vocab_size+2 squared worst case), never
   corpus-sized.
3. ``bigram_train`` — conditional log-probabilities
   ``logp(w2 | w1) = ln((c(w1,w2) + k) / (c(w1,*) + k * V))``
   quantized to integer MICRO-NATS at train time. The shipped model is
   the quantized table — exactly how production LMs ship quantized
   probabilities — so every downstream score is an exact BIGINT sum,
   bit-identical under any partitioning, engine, or fold order.
   The collect is model-sized (observed distinct pairs, bounded by
   (V+2)^2), never data-sized. ``replay_bigram_train`` is the pure-
   Python differential twin pinned in tests/test_ngramlm.py.

Scoring (``bigram_score``): per-document total log-likelihood of the
token stream under the pinned model. Pure row-local projection — the
quantized model rides into the plan as a literal map (models a trainer
ships are small; for a giant model use ``bigram_score_join``), the
per-pair lookups fold left-to-right via ``aggregate``, and the sum is
exact BIGINT arithmetic. No shuffle, no UDF, predicate-pushdown
friendly: at 100 TB this is one map-only pass.

``bigram_score_join`` is the big-model variant: pairs explode, hash-
join the model relation (broadcast when it fits), exact BIGINT groupBy
sum — shuffle carries (doc_id, micros) only.

Perplexity gating never computes a float: ``ppl <= t`` is equivalent
to ``loglik_micros >= -ln(t)_micros * n_pairs`` — an exact integer
cross-multiply both engines evaluate identically.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "BOS",
    "UNK",
    "top_vocab",
    "bigram_counts",
    "bigram_train",
    "replay_bigram_train",
    "bigram_score",
    "bigram_score_cols",
    "bigram_score_join",
    "model_relation",
    "segment_quality_scrub",
]

BOS = "<s>"
UNK = "<unk>"
MICROS = 1_000_000


def _tokens(text_col: str) -> F.Column:
    # NULL text tokenizes to the EMPTY stream (n_pairs=0, score=0),
    # never NULL — a NULL array would propagate through zip_with/
    # aggregate to NULL scores while the SQL oracles coalesce to 0
    # (ADVICE r9 parity hazard)
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    return F.filter(toks, lambda t: t != "")


def _mapped(toks: F.Column, vocab: list[str]) -> F.Column:
    """OOV tokens collapse to <unk> (closed-vocabulary construction)."""
    v = F.lit(vocab)
    return F.transform(
        toks, lambda t: F.when(F.array_contains(v, t), t).otherwise(UNK)
    )


def top_vocab(docs: DataFrame, text_col: str, vocab_size: int) -> list[str]:
    """Top ``vocab_size`` unigrams by (count DESC, token ASC) — the
    exact deterministic order, so two trainings of the same corpus
    pick the same vocabulary. One corpus pass, map-side combined;
    the collect is vocab-sized."""
    rows = (
        docs.select(F.explode(_tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .collect()  # driver-ok: vocab-sized (<= vocab_size rows), never data-sized
    )
    return [r["tok"] for r in rows]


def bigram_counts(
    docs: DataFrame, text_col: str, vocab: list[str]
) -> DataFrame:
    """(w1, w2, n) adjacent-pair counts with a <s> start context and
    OOV collapsed to <unk>. Shuffle carries distinct pairs only."""
    toks = _mapped(_tokens(text_col), vocab)
    ctx = F.concat(F.array(F.lit(BOS)), toks)  # w1 stream
    pairs = F.zip_with(
        F.slice(ctx, 1, F.size(toks)),
        toks,
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        docs.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def _context_totals(pair_rows: list[tuple[str, str, int]]) -> dict[str, int]:
    tot: dict[str, int] = {}
    for w1, _w2, n in pair_rows:
        tot[w1] = tot.get(w1, 0) + n
    return tot


def _quantize(c: int, ctx_total: int, k_num: int, k_den: int, v: int) -> int:
    """floor(1e6 * ln((c + k) / (ctx + k*V))) with k = k_num/k_den —
    the rational is formed exactly in integers, ln'd once, floored.
    Same arithmetic in the distributed path and the replay twin."""
    num = c * k_den + k_num
    den = ctx_total * k_den + k_num * v
    return math.floor(MICROS * math.log(num / den))


def bigram_train(
    docs: DataFrame,
    text_col: str,
    vocab_size: int = 128,
    k_num: int = 1,
    k_den: int = 10,
) -> tuple[list[str], dict[str, int], int]:
    """Train the quantized bigram model. Returns ``(vocab,
    {"w1 w2": logp_micros}, unk_floor_micros)``. The table is the
    FULL add-k model: every (observed context, emission) pair incl.
    zero counts — so per-context probabilities normalize and unseen-
    under-observed-context lookups score the true add-k value
    (ADVICE r9). ``unk_floor`` is the smoothed log-prob for an UNSEEN
    context (a pair whose w1 never occurred in training:
    ln(k / (k*V)) = -ln(V)) — the lookup default.

    SIZE CLASS (ADVICE r10): densifying makes the trained table
    (observed contexts) x (V+1) entries — O(V^2), ~17k at the default
    ``vocab_size=128``, but a few-thousand-word vocab means a
    multi-million-entry driver dict, plan-literal map
    (:func:`bigram_score`) and :func:`model_relation`. Large-vocab
    callers should keep ``vocab_size`` in the hundreds or score via
    :func:`bigram_score_join` against a SPARSE counts relation instead
    of this dense literal table.

    The corpus is touched twice (vocab pass + pair pass), shuffles
    carry distinct tokens/pairs only. Bit-reproducible under any
    partitioning: counts are exact BIGINTs and the quantization is a
    pure function of them (differential + invariance pins in
    tests/test_ngramlm.py)."""
    vocab = top_vocab(docs, text_col, vocab_size)
    rows = bigram_counts(
        docs, text_col, vocab
    ).collect()  # driver-ok: model-sized ((V+2)^2 worst case), never data-sized
    pair_rows = [(r["w1"], r["w2"], r["n"]) for r in rows]
    # V = emission alphabet: vocab + <unk> (never <s>, which only
    # appears as context)
    v = len(vocab) + 1
    tot = _context_totals(pair_rows)
    model = _full_table(pair_rows, tot, vocab, k_num, k_den, v)
    unk_floor = math.floor(MICROS * math.log(k_num / (k_num * v)))
    return vocab, model, unk_floor


def _full_table(
    pair_rows,
    tot: dict[str, int],
    vocab: list[str],
    k_num: int,
    k_den: int,
    v: int,
) -> dict[str, int]:
    """Materialize EVERY (observed context, emission) add-k score —
    including zero-count pairs — so lookups for an unseen w2 under an
    OBSERVED w1 return the true add-k value ln(k / (c(w1,*) + kV)),
    not the unseen-context floor (ADVICE r9). Bounded by
    (V+2) x (V+1) entries; the <s> context appears only when observed.
    Only genuinely unseen CONTEXTS fall to the unk_floor default."""
    counts = {(w1, w2): n for w1, w2, n in pair_rows}
    emissions = list(vocab) + [UNK]
    return {
        f"{w1} {w2}": _quantize(
            counts.get((w1, w2), 0), ctx_total, k_num, k_den, v
        )
        for w1, ctx_total in sorted(tot.items())
        for w2 in emissions
    }


def replay_bigram_train(
    corpus: list[str],
    vocab_size: int = 128,
    k_num: int = 1,
    k_den: int = 10,
) -> tuple[list[str], dict[str, int], int]:
    """Pure-Python twin of :func:`bigram_train` — the differential pin
    that proves the distributed trainer computes THE model, not A
    model."""
    uni: dict[str, int] = {}
    for text in corpus:
        for t in text.split():
            uni[t] = uni.get(t, 0) + 1
    vocab = [
        t for t, _ in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:vocab_size]
    vset = set(vocab)
    pairs: dict[tuple[str, str], int] = {}
    for text in corpus:
        toks = [t if t in vset else UNK for t in text.split()]
        if not toks:
            continue
        stream = [BOS] + toks
        for a, b in zip(stream, stream[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    v = len(vocab) + 1
    tot: dict[str, int] = {}
    for (w1, _w2), n in pairs.items():
        tot[w1] = tot.get(w1, 0) + n
    model = _full_table(
        [(w1, w2, n) for (w1, w2), n in pairs.items()],
        tot, vocab, k_num, k_den, v,
    )
    unk_floor = math.floor(MICROS * math.log(k_num / (k_num * v)))
    return vocab, model, unk_floor


def bigram_score(
    docs: DataFrame,
    vocab: list[str],
    model: dict[str, int],
    unk_floor: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram log-likelihood under the pinned quantized
    model: ``(id_col, n_pairs int, loglik_micros bigint)``.

    Pure row-local projection — the model rides in as a literal map,
    pair scores come from ``transform`` + ``element_at`` lookups with
    the unseen-pair floor as default, and the doc total is
    ``aggregate`` over exact BIGINTs. No shuffle, no UDF; at 100 TB
    this is one map-only pass the optimizer can push filters through.
    For models too large for a plan literal use
    :func:`bigram_score_join`."""
    n_pairs, loglik = bigram_score_cols(vocab, model, unk_floor, text_col)
    return docs.select(
        F.col(id_col),
        n_pairs.alias("n_pairs"),
        loglik.alias("loglik_micros"),
    )


def bigram_score_cols(
    vocab: list[str],
    model: dict[str, int],
    unk_floor: int,
    text_col: str = "text",
) -> tuple[F.Column, F.Column]:
    """``(n_pairs, loglik_micros)`` as composable COLUMNS — the same
    row-local literal-map fold :func:`bigram_score` projects, for
    pipelines that need the score alongside other columns (e.g. the
    streaming curation chain). ``n_pairs`` equals the document's token
    count (every token scores once against its left context, <s>
    included), so it doubles as the packing token count downstream."""
    lit_model = F.map_from_arrays(
        F.lit(list(model.keys())),
        F.lit([model[k] for k in model]),
    )
    toks = _mapped(_tokens(text_col), vocab)
    ctx = F.concat(F.array(F.lit(BOS)), toks)
    keys = F.zip_with(
        F.slice(ctx, 1, F.size(toks)), toks,
        lambda a, b: F.concat_ws(" ", a, b),
    )
    micros = F.transform(
        keys,
        lambda kk: F.coalesce(
            F.element_at(lit_model, kk), F.lit(unk_floor).cast("bigint")
        ),
    )
    return (
        F.size(keys),
        F.aggregate(
            micros, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ),
    )


def model_relation(spark, model: dict[str, int]) -> DataFrame:
    """The model as a relation ``(pair string, logp_micros bigint)`` —
    the join-side shape for models that outgrow a plan literal."""
    return spark.createDataFrame(
        [(k, v) for k, v in model.items()], "pair string, logp_micros bigint"
    )


def bigram_score_join(
    docs: DataFrame,
    vocab: list[str],
    model_rel: DataFrame,
    unk_floor: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Big-model scoring: explode pairs, broadcast-join the model
    relation, exact BIGINT groupBy sum. The shuffle carries
    ``(doc_id, micros)`` rows only; result is bit-identical to
    :func:`bigram_score` (pinned in tests/test_ngramlm.py)."""
    toks = _mapped(_tokens(text_col), vocab)
    ctx = F.concat(F.array(F.lit(BOS)), toks)
    keys = F.zip_with(
        F.slice(ctx, 1, F.size(toks)), toks,
        lambda a, b: F.concat_ws(" ", a, b),
    )
    pairs = docs.select(
        F.col(id_col), F.posexplode_outer(keys).alias("pos", "pair")
    )
    joined = pairs.join(F.broadcast(model_rel), "pair", "left")
    # the outer explode emits one null-pair row for an empty doc (so the
    # doc survives the groupBy with a 0 score) — it must contribute 0,
    # not the unseen-pair floor
    per_pair = F.when(F.col("pair").isNull(), F.lit(0).cast("bigint")).otherwise(
        F.coalesce(F.col("logp_micros"), F.lit(unk_floor).cast("bigint"))
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("pair").cast("int").alias("n_pairs"),
            F.coalesce(F.sum(per_pair), F.lit(0).cast("bigint")).alias(
                "loglik_micros"
            ),
        )
    )


def segment_quality_scrub(
    docs: DataFrame,
    vocab: list[str],
    model: dict[str, int],
    unk_floor: int,
    gate_micros: int,
    segment_tokens: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style PARTIAL-document quality filtering (Wenzek et al.
    2020): instead of admitting or dropping whole documents, segment
    each one into fixed ``segment_tokens``-token blocks, score every
    block with the pinned bigram LM, drop the blocks failing the
    per-token perplexity gate (``loglik_micros >= gate_micros *
    n_tokens`` — the engine-wide exact cross-multiply, no division),
    and reassemble the document from its surviving blocks in order.
    A mostly-good document keeps its good parts where the whole-doc
    gate would discard everything; boilerplate/garbled blocks vanish
    from otherwise-clean documents.

    Returns ``(id_col, n_segments int, n_kept int, dropped_tokens int,
    text_clean string)`` — one row per input document (empty/NULL text
    yields 0/0/0/'' rather than vanishing: the whole operator is a
    projection, total over rows by construction).

    Scale: the ENTIRE pipeline — tokenize once, segment, per-block
    literal-map fold, gate, reassemble — is ONE shuffle-free row-local
    projection (the q_quality_ensemble discipline): no explode, no
    join, no window, no Python. The token array and the scored-segment
    array are each bound once (1-element transform wrappers), so
    CollapseProject cannot re-tokenize or re-score per consumer."""
    if segment_tokens <= 0:
        raise ValueError("segment_tokens must be positive")
    seg = int(segment_tokens)
    lit_model = F.map_from_arrays(
        F.lit(list(model.keys())),
        F.lit([model[k] for k in model]),
    )
    v = F.lit(list(vocab))
    gate = F.lit(int(gate_micros)).cast("bigint")
    floor = F.lit(int(unk_floor)).cast("bigint")

    def seg_loglik(st: F.Column) -> F.Column:
        mapped = F.transform(
            st, lambda t: F.when(F.array_contains(v, t), t).otherwise(UNK)
        )
        ctx = F.concat(F.array(F.lit(BOS)), mapped)
        keys = F.zip_with(
            F.slice(ctx, 1, F.size(mapped)),
            mapped,
            lambda a, b: F.concat_ws(" ", a, b),
        )
        micros = F.transform(
            keys, lambda kk: F.coalesce(F.element_at(lit_model, kk), floor)
        )
        return F.aggregate(
            micros, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        )

    def body(toks: F.Column) -> F.Column:
        nsegs = F.ceil(F.size(toks) / F.lit(seg)).cast("int")
        segs = F.when(
            nsegs >= 1,
            F.transform(
                F.sequence(F.lit(0), nsegs - 1),
                lambda i: F.slice(toks, i * seg + 1, seg),
            ),
        ).otherwise(F.array().cast("array<array<string>>"))
        scored = F.transform(
            segs,
            lambda st: F.struct(
                st.alias("toks"),
                F.size(st).cast("bigint").alias("n"),
                seg_loglik(st).alias("ll"),
            ),
        )
        kept = F.filter(scored, lambda s: s["ll"] >= gate * s["n"])
        return F.struct(
            F.size(scored).cast("int").alias("n_segments"),
            F.size(kept).cast("int").alias("n_kept"),
            (
                F.size(toks)
                - F.aggregate(
                    kept,
                    F.lit(0).cast("bigint"),
                    lambda acc, s: acc + s["n"],
                ).cast("int")
            )
            .cast("int")
            .alias("dropped_tokens"),
            F.array_join(
                F.flatten(F.transform(kept, lambda s: s["toks"])), " "
            ).alias("out"),
        )

    # toks bound ONCE, the scored/kept arrays bound once inside body —
    # referencing _tokens() twice would re-tokenize per consumer after
    # CollapseProject (the word_shingles pitfall)
    res = F.element_at(
        F.transform(F.array(_tokens(text_col)), body), 1
    ).alias("_r")
    return docs.select(F.col(id_col), res).select(
        id_col,
        F.col("_r.n_segments").alias("n_segments"),
        F.col("_r.n_kept").alias("n_kept"),
        F.col("_r.dropped_tokens").alias("dropped_tokens"),
        F.col("_r.out").alias("text_clean"),
    )
