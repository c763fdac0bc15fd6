"""Bigram LM training + scoring (operators/ngramlm.py): bit-for-bit
differential against the pure-Python replay trainer, partitioning
invariance, literal-fold vs broadcast-join scoring equality, and the
exact-integer perplexity gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from asterlake.operators.ngramlm import (
    BOS,
    MICROS,
    UNK,
    bigram_counts,
    bigram_score,
    bigram_score_join,
    bigram_train,
    model_relation,
    replay_bigram_train,
    top_vocab,
)

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the cat saw the dog",
    "dogs and cats and logs",
    "",
    "   ",
    "zebra quokka xylophone",  # rare tokens -> OOV at small vocab
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id bigint, text string"
    )


def ref_score(
    text: str, vocab: list[str], model: dict[str, int], unk: int
) -> tuple[int, int]:
    vset = set(vocab)
    toks = [t if t in vset else UNK for t in text.split()]
    stream = [BOS] + toks
    micros = [
        model.get(f"{a} {b}", unk) for a, b in zip(stream, stream[1:])
    ]
    return len(micros), sum(micros)


def test_train_matches_pure_python_replay(spark):
    d = _docs(spark)
    got = bigram_train(d, "text", vocab_size=8, k_num=1, k_den=10)
    want = replay_bigram_train(CORPUS, vocab_size=8, k_num=1, k_den=10)
    assert got == want


def test_train_invariant_under_repartitioning(spark):
    d = _docs(spark)
    one = bigram_train(d.coalesce(1), "text", vocab_size=8)
    many = bigram_train(d.repartition(13), "text", vocab_size=8)
    assert one == many


def test_vocab_is_count_then_lexicographic(spark):
    d = _docs(spark)
    vocab = top_vocab(d, "text", 4)
    # 'the' 6x, 'and' 3x, then cat/dog/on/sat at 3/3/2/2 ... exact order
    uni: dict[str, int] = {}
    for t in CORPUS:
        for w in t.split():
            uni[w] = uni.get(w, 0) + 1
    want = [
        t for t, _ in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:4]
    assert vocab == want


def test_counts_collapse_oov_and_add_bos(spark):
    d = _docs(spark)
    vocab = ["the", "cat", "dog"]
    rows = {
        (r["w1"], r["w2"]): r["n"]
        for r in bigram_counts(d, "text", vocab).collect()
    }
    # every non-empty doc contributes exactly one <s>-context pair
    n_bos = sum(n for (w1, _), n in rows.items() if w1 == BOS)
    assert n_bos == sum(1 for t in CORPUS if t.split())
    # 'zebra quokka xylophone' -> (<s>,<unk>) (<unk>,<unk>) (<unk>,<unk>)
    assert rows[(UNK, UNK)] >= 2
    assert all(w1 != "" and w2 != "" for (w1, w2) in rows)


def test_score_matches_reference_per_doc(spark):
    d = _docs(spark)
    vocab, model, unk = bigram_train(d, "text", vocab_size=8)
    got = {
        r["doc_id"]: (r["n_pairs"], r["loglik_micros"])
        for r in bigram_score(d, vocab, model, unk).collect()
    }
    for i, text in enumerate(CORPUS):
        assert got[i] == ref_score(text, vocab, model, unk), (i, text)


def test_score_empty_doc_is_zero(spark):
    d = _docs(spark)
    vocab, model, unk = bigram_train(d, "text", vocab_size=8)
    got = {r["doc_id"]: r for r in bigram_score(d, vocab, model, unk).collect()}
    assert (got[5]["n_pairs"], got[5]["loglik_micros"]) == (0, 0)
    assert (got[6]["n_pairs"], got[6]["loglik_micros"]) == (0, 0)


def test_join_variant_bit_identical_to_literal_fold(spark):
    d = _docs(spark)
    vocab, model, unk = bigram_train(d, "text", vocab_size=8)
    lit = {
        r["doc_id"]: (r["n_pairs"], r["loglik_micros"])
        for r in bigram_score(d, vocab, model, unk).collect()
    }
    rel = model_relation(spark, model)
    jn = {
        r["doc_id"]: (r["n_pairs"], r["loglik_micros"])
        for r in bigram_score_join(d, vocab, rel, unk).collect()
    }
    assert lit == jn


def test_quantization_is_floor_micros_of_log(spark):
    d = _docs(spark)
    vocab, model, unk = bigram_train(d, "text", vocab_size=8, k_num=1, k_den=10)
    rows = {
        (r["w1"], r["w2"]): r["n"]
        for r in bigram_counts(d, "text", vocab).collect()
    }
    tot: dict[str, int] = {}
    for (w1, _), n in rows.items():
        tot[w1] = tot.get(w1, 0) + n
    v = len(vocab) + 1
    for (w1, w2), n in rows.items():
        want = math.floor(
            MICROS * math.log((n * 10 + 1) / (tot[w1] * 10 + v))
        )
        assert model[f"{w1} {w2}"] == want
    assert unk == math.floor(MICROS * math.log(1 / v))
    # probabilities, so every entry is negative
    assert all(m < 0 for m in model.values())


def test_perplexity_gate_is_exact_cross_multiply(spark):
    d = _docs(spark)
    vocab, model, unk = bigram_train(d, "text", vocab_size=8)
    # pick a threshold strictly between two observed mean log-probs so
    # the gate provably separates (no fixed magic number: the corpus is
    # tiny and <unk>-bigrams are IN the model, so even an all-OOV doc
    # scores like an in-domain one)
    means = sorted(
        ll // n  # micro-nats per pair (loglik is already micros)
        for n, ll in (
            ref_score(t, vocab, model, unk) for t in CORPUS if t.split()
        )
    )
    lo, hi = means[0], means[-1]
    assert lo < hi
    thr = (lo + hi) // 2
    scored = bigram_score(d, vocab, model, unk).withColumn(
        "kept",
        F.col("loglik_micros") >= F.lit(thr) * F.col("n_pairs"),
    )
    kept = {r["doc_id"]: r["kept"] for r in scored.collect()}
    for i, text in enumerate(CORPUS):
        n, ll = ref_score(text, vocab, model, unk)
        assert kept[i] == (ll >= thr * n), (i, text)
    assert any(kept.values()) and not all(kept.values())


def test_model_is_full_addk_table(spark):
    """ADVICE r9: every (observed context, emission) pair is in the
    table — including ZERO-count pairs, at the true add-k score
    ln(k / (c(w1,*) + kV)) — so per-context probabilities normalize
    and only genuinely unseen CONTEXTS fall to the unk_floor."""
    d = _docs(spark)
    vocab, model, unk = bigram_train(d, "text", vocab_size=8, k_num=1, k_den=10)
    rows = {
        (r["w1"], r["w2"]): r["n"]
        for r in bigram_counts(d, "text", vocab).collect()
    }
    tot: dict[str, int] = {}
    for (w1, _), n in rows.items():
        tot[w1] = tot.get(w1, 0) + n
    v = len(vocab) + 1
    emissions = list(vocab) + [UNK]
    # exactly contexts x emissions, nothing more, nothing less
    assert set(model) == {
        f"{w1} {w2}" for w1 in tot for w2 in emissions
    }
    # a zero-count pair under an observed context scores add-k, not unk
    zero_pairs = [
        (w1, w2) for w1 in tot for w2 in emissions if (w1, w2) not in rows
    ]
    assert zero_pairs, "corpus too dense for the zero-count pin"
    for w1, w2 in zero_pairs:
        want = math.floor(MICROS * math.log(1 / (tot[w1] * 10 + v)))
        assert model[f"{w1} {w2}"] == want, (w1, w2)
    # per-context probabilities normalize (to quantization tolerance:
    # each of the v entries is floored by < 1 micro-nat)
    for w1, t in tot.items():
        s = sum(
            math.exp(model[f"{w1} {w2}"] / MICROS) for w2 in emissions
        )
        assert 1 - v * 2e-6 <= s <= 1 + 1e-9, (w1, s)


def test_score_null_text_is_zero(spark):
    """ADVICE r9: NULL text tokenizes to the empty stream on the Spark
    side (n_pairs=0, loglik=0), matching the SQL oracles' coalesce —
    in both the literal-fold and the broadcast-join scorer."""
    d = spark.createDataFrame(
        [(0, "the cat"), (1, None)], "doc_id bigint, text string"
    )
    vocab, model, unk = bigram_train(d, "text", vocab_size=4)
    for scored in (
        bigram_score(d, vocab, model, unk),
        bigram_score_join(d, vocab, model_relation(spark, model), unk),
    ):
        got = {r["doc_id"]: r for r in scored.collect()}
        assert (got[1]["n_pairs"], got[1]["loglik_micros"]) == (0, 0)
        assert got[0]["n_pairs"] == 2


def _replay_segment_scrub(corpus, vocab, model, unk_floor, gate, seg):
    """Pure-Python twin of segment_quality_scrub."""
    out = {}
    for i, text in enumerate(corpus):
        toks = (text or "").split()
        segs = [toks[j : j + seg] for j in range(0, len(toks), seg)]
        kept, dropped = [], 0
        for st in segs:
            mapped = [t if t in vocab else "<unk>" for t in st]
            ctx = ["<s>"] + mapped
            ll = sum(
                model.get(f"{a} {b}", unk_floor)
                for a, b in zip(ctx[: len(mapped)], mapped)
            )
            if ll >= gate * len(st):
                kept.append(st)
            else:
                dropped += len(st)
        out[i] = (
            len(segs),
            len(kept),
            dropped,
            " ".join(t for st in kept for t in st),
        )
    return out


def test_segment_scrub_matches_pure_python_replay(spark):
    """Segment-level CCNet scrub differential: per-doc segment counts,
    kept counts, dropped tokens and the reassembled text all equal the
    pure-Python twin, on a TRAINED model — and the fixture exercises
    both directions (some segments kept, some dropped, whole docs
    emptied, empty docs kept as empty rows)."""
    from asterlake.operators.ngramlm import bigram_train, segment_quality_scrub

    vocab, model, unk = bigram_train(_docs(spark), "text", vocab_size=8)
    seg, gate = 4, -2_500_000
    got = {
        r.doc_id: (r.n_segments, r.n_kept, r.dropped_tokens, r.text_clean)
        for r in segment_quality_scrub(
            _docs(spark), vocab, model, unk, gate, seg
        ).collect()
    }
    want = _replay_segment_scrub(CORPUS, vocab, model, unk, gate, seg)
    assert got == want
    assert len(got) == len(CORPUS)  # total over rows: nothing vanishes
    kinds = {(v[0] > 0, v[1] > 0) for v in got.values()}
    assert (True, True) in kinds     # something kept
    assert (True, False) in kinds or any(
        v[0] > v[1] > 0 for v in got.values()
    )  # something dropped
    assert got[5][0] == 0 and got[5][3] == ""  # empty doc -> 0 segs, ''


def test_segment_scrub_is_projection_only(spark):
    """The whole segment pipeline must stay ONE shuffle-free row-local
    projection: no Exchange, no Generate (explode), no join, no
    Python."""
    from asterlake.operators.ngramlm import bigram_train, segment_quality_scrub
    from asterlake.plans.inspect import has_node, node_count, plan_string

    vocab, model, unk = bigram_train(_docs(spark), "text", vocab_size=8)
    plan = plan_string(
        segment_quality_scrub(_docs(spark), vocab, model, unk, -2_500_000, 4)
    )
    assert node_count(plan, "Exchange") == 0
    assert not has_node(plan, "Generate")
    assert not has_node(plan, "BatchEvalPython")
    assert not has_node(plan, "ArrowEvalPython")
