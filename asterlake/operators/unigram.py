"""Distributed unigram-LM tokenizer training (SentencePiece's model):
learn a subword vocabulary with probabilities by Viterbi-EM.

The companion to :mod:`asterlake.operators.bpe` — BPE learns merge
RULES greedily; the unigram LM (Kudo, "Subword Regularization: Improving
Neural Network Translation Models with Multiple Subword Candidates",
ACL 2018) learns a probabilistic piece VOCABULARY by expectation-
maximization, segmenting with the Viterbi-best decomposition. Both
exploit the same classic reduction: training statistics are a function
of the WORD FREQUENCY dictionary (Zipf: vocabulary-sized even for
terabytes of text), not the raw corpus, so after ONE corpus-sized
aggregation (:func:`asterlake.operators.bpe.word_counts`) every EM
round runs over the ``(word, n)`` table.

Spark shapes:

- :func:`seed_vocab` — candidate pieces = every substring (up to
  ``max_piece_len``) of every dictionary word, weighted by word count:
  explode + map-side-combinable sum, shuffle carries distinct
  substrings only; the top ``seed_size`` by (count, piece) plus ALL
  single characters (the coverage floor — any word stays segmentable
  no matter how hard pruning bites).
- :func:`unigram_train` — Viterbi-EM driver loop: the E-step segments
  the word dictionary under the current piece log-probs (row-local
  Arrow-batched pandas UDF, probs broadcast by closure) and aggregates
  exact BIGINT piece counts (map-side combine; the exchange carries at
  most |vocab| partial rows per task); the M-step collects the
  vocab-sized count table — the MODEL, bounded by ``seed_size``, never
  data-sized — re-normalizes on the driver, and prunes the weakest
  multi-char pieces. Counts are exact integers and every float is
  derived from them identically on any partitioning, so training is
  bit-reproducible (differential + invariance pins in
  tests/test_unigram.py).
- :func:`unigram_segment` — apply the trained model to documents:
  per-word Viterbi under literal log-probs, row-local, no shuffle.

Viterbi determinism contract (shared by the distributed path and the
pure-Python replay): best[j] maximizes ``best[i] + logp(word[i:j])``
scanning candidate start positions i left to right and STRICTLY
greater-than comparing — on exact float ties the EARLIEST start index
wins each cell (the longest-final-piece parse), so two engines
agreeing on the log-prob doubles agree on the parse.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "seed_vocab",
    "unigram_train",
    "unigram_segment",
    "viterbi_segment",
    "replay_unigram_train",
]


def seed_vocab(
    words: DataFrame,
    max_piece_len: int = 6,
    seed_size: int = 512,
) -> DataFrame:
    """Candidate pieces from the ``(word, n)`` dictionary: every
    substring of length 1..``max_piece_len``, corpus-weighted.

    Returns ``(piece string, n bigint)`` — the top ``seed_size`` by
    (n DESC, piece ASC — exact deterministic order) UNIONed with all
    single characters regardless of rank, so pruning can never strand
    an unsegmentable word. The explode emits O(len^2) substrings per
    DISTINCT word (the dictionary, not the corpus), and the groupBy
    combines map-side; the shuffle carries distinct substrings only."""
    subs = F.expr(
        "flatten(transform(sequence(1, length(word)), i -> "
        "transform(sequence(i, least(length(word), i + {L} - 1)), j -> "
        "substring(word, i, j - i + 1))))".format(L=max_piece_len)
    )
    counts = (
        words.select(F.explode(subs).alias("piece"), F.col("n"))
        .groupBy("piece")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )
    ranked = (
        counts.orderBy(F.desc("n"), F.asc("piece"))
        .limit(int(seed_size))
    )
    chars = counts.where(F.length("piece") == 1)
    return ranked.unionByName(chars).groupBy("piece").agg(
        F.max("n").cast("bigint").alias("n")
    )


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int
) -> list[str]:
    """Viterbi-best segmentation of one word under piece log-probs —
    the shared kernel of the distributed E-step, the apply operator,
    and the pure-Python replay (one definition, so the differential
    pin tests the DISTRIBUTION, not a reimplementation). Pieces absent
    from ``logp`` are unusable except single characters, which fall
    back to ``unk_logp`` = min(logp) - 10.0 (finite, so coverage never
    produces -inf chains; exact same constant both paths)."""
    n = len(word)
    if n == 0:
        return []
    unk = (min(logp.values()) if logp else 0.0) - 10.0
    best = [float("-inf")] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_piece_len), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                if j - i > 1:
                    continue
                lp = unk
            cand = best[i] + lp
            if cand > best[j]:
                best[j] = cand
                back[j] = i
    out: list[str] = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    out.reverse()
    return out


def _logp_from_counts(counts: dict[str, int]) -> dict[str, float]:
    """Normalize exact integer counts to log-probs — the only float
    derivation in training, computed ONCE on the driver per round from
    partitioning-independent integers, so it is identical everywhere."""
    total = sum(counts.values())
    return {
        p: math.log(c) - math.log(total) for p, c in counts.items() if c > 0
    }


def _mstep_prune(
    counts: dict[str, int], vocab_size: int, prune_frac: float
) -> dict[str, int]:
    """Shared M-step prune (one definition for the distributed loop and
    the replay, like viterbi_segment): keep every single character (the
    coverage floor), rank multi-char pieces weakest-first by the total
    order (count ASC, piece DESC), and drop the weakest ``prune_frac``
    — but never below the ``vocab_size`` budget's multi-char share."""
    multi = sorted(
        (p for p in counts if len(p) > 1),
        key=lambda p: (counts[p], tuple(-ord(c) for c in p)),
    )
    n_char = sum(1 for p in counts if len(p) == 1)
    target_multi = max(0, int(vocab_size) - n_char)
    keep = max(target_multi, int(len(multi) * (1.0 - float(prune_frac))))
    out = dict(counts)
    for piece in multi[: max(0, len(multi) - keep)]:
        del out[piece]
    return out


def _estep_counts(
    words: DataFrame,
    logp: dict[str, float],
    max_piece_len: int,
) -> DataFrame:
    """E-step: Viterbi-segment the word dictionary under ``logp``
    (row-local pandas UDF, model broadcast by closure) and aggregate
    corpus-weighted piece counts — exact BIGINT, map-side combined."""
    lp = dict(logp)
    mpl = int(max_piece_len)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg(ws: pd.Series) -> pd.Series:
        return pd.Series(
            [viterbi_segment(w or "", lp, mpl) for w in ws]
        )

    return (
        words.select(F.explode(seg(F.col("word"))).alias("piece"), "n")
        .groupBy("piece")
        .agg(F.sum("n").cast("bigint").alias("cnt"))
    )


def unigram_train(
    words: DataFrame,
    vocab_size: int = 128,
    max_piece_len: int = 6,
    seed_size: int = 512,
    n_iters: int = 4,
    prune_frac: float = 0.25,
) -> dict[str, float]:
    """Viterbi-EM unigram-LM training over a ``(word, n)`` dictionary.

    Each round: ONE distributed E-step job (Viterbi segment + exact
    BIGINT count aggregate) whose collected result is the vocab-sized
    model table (bounded by ``seed_size``, never data-sized), then a
    driver-side M-step (re-normalize) and prune: drop the weakest
    ``prune_frac`` of multi-char pieces by (count ASC, piece DESC)
    until ``vocab_size`` remains; single characters are never pruned
    (coverage floor). Stops early at ``vocab_size``. Returns the final
    ``{piece: logprob}`` model.

    Determinism: counts are exact integers under any partitioning, the
    prune order is a total order on (count, piece), and all floats
    derive from the integers once per round on the driver —
    bit-reproducible (pinned against :func:`replay_unigram_train`)."""
    seed = seed_vocab(words, max_piece_len, seed_size)
    counts = {
        r["piece"]: int(r["n"])
        for r in seed.collect()  # driver-ok: the vocab-sized seed MODEL
    }
    logp = _logp_from_counts(counts)
    for _ in range(int(n_iters)):
        est = _estep_counts(words, logp, max_piece_len)
        counts = {
            r["piece"]: int(r["cnt"])
            for r in est.collect()  # driver-ok: vocab-sized model state
        }
        # coverage floor: single chars survive even at count 0
        for p in list(logp):
            if len(p) == 1 and p not in counts:
                counts[p] = 1
        counts = _mstep_prune(counts, vocab_size, prune_frac)
        logp = _logp_from_counts(counts)
        if len(counts) <= int(vocab_size):
            break
    return logp


def replay_unigram_train(
    rows: list[tuple[str, int]],
    vocab_size: int = 128,
    max_piece_len: int = 6,
    seed_size: int = 512,
    n_iters: int = 4,
    prune_frac: float = 0.25,
) -> dict[str, float]:
    """Pure-Python single-process replay of :func:`unigram_train` for
    differential tests: same seed ranking, same Viterbi kernel (the
    SAME function object), same exact-integer counts, same prune
    order, same float derivations — must agree BIT-FOR-BIT."""
    sub_counts: dict[str, int] = {}
    for w, n in rows:
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_piece_len) + 1):
                piece = w[i:j]
                sub_counts[piece] = sub_counts.get(piece, 0) + n
    ranked = sorted(
        sub_counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[: int(seed_size)]
    counts = dict(ranked)
    for p, c in sub_counts.items():
        if len(p) == 1:
            counts[p] = max(counts.get(p, 0), c)
    logp = _logp_from_counts(counts)
    for _ in range(int(n_iters)):
        counts = {}
        for w, n in rows:
            for piece in viterbi_segment(w, logp, max_piece_len):
                counts[piece] = counts.get(piece, 0) + n
        # coverage floor: single chars survive even at count 0
        for p in list(logp):
            if len(p) == 1 and p not in counts:
                counts[p] = 1
        counts = _mstep_prune(counts, vocab_size, prune_frac)
        logp = _logp_from_counts(counts)
        if len(counts) <= int(vocab_size):
            break
    return logp


def unigram_segment(
    docs: DataFrame,
    logp: dict[str, float],
    max_piece_len: int = 6,
    text_col: str = "body",
    out_col: str = "pieces",
) -> DataFrame:
    """Tokenize documents with a trained unigram model: per-word
    Viterbi under the broadcast log-probs, Arrow-batched, row-local —
    the same honest-UDF choice as :func:`bpe.bpe_segment` (a DP over
    word positions does not unroll into a fixed expression tree)."""
    lp = dict(logp)
    mpl = int(max_piece_len)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg(texts: pd.Series) -> pd.Series:
        # Zipf cache (same as bpe_segment): Viterbi each DISTINCT word
        # once per worker; every other occurrence is a dict hit. Pure
        # evaluation memo — outputs byte-identical either way.
        memo: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").split():
                pieces = memo.get(w)
                if pieces is None:
                    pieces = viterbi_segment(w, lp, mpl)
                    memo[w] = pieces
                toks.extend(pieces)
            out.append(toks)
        return pd.Series(out)

    return docs.withColumn(out_col, seg(F.col(text_col)))
