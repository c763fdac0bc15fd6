"""ExactSubstr repeated-substring dedup (operators/substrings.py):
differential against a brute-force pure-Python oracle, maximality of
the merged spans, survivor determinism of the scrub, and edge cases
(NULL text, empty docs, docs shorter than the window)."""

from __future__ import annotations

from collections import Counter

import pytest

from asterlake.operators.substrings import (
    repeated_substring_spans,
    scrub_repeated_substrings,
    substring_windows,
)

# shared 6-token boilerplate in docs 0/2/5, an internal repeat in doc 1,
# an overlapping-run case in docs 3/4 (shifted shared block -> merged
# maximal span), plus NULL / empty / too-short docs
CORPUS: list[tuple[int, str | None]] = [
    (0, "alpha beta gamma delta epsilon zeta unique0 tail0"),
    (1, "x y z w q r x y z w q r coda"),
    (2, "head2 alpha beta gamma delta epsilon zeta mid2 end2"),
    (3, "one two three four five six seven eight nine ten"),
    (4, "zero one two three four five six seven eight other"),
    (5, "alpha beta gamma delta epsilon zeta"),
    (6, None),
    (7, ""),
    (8, "short doc"),
    (9, "  spaced   tokens   here   spaced   tokens   here  "),
]
K = 4


def ref_windows(corpus, k):
    wins = []
    for d, t in corpus:
        toks = (t or "").split()
        for p in range(max(len(toks) - k + 1, 0)):
            wins.append((" ".join(toks[p : p + k]), d, p))
    return wins


def ref_spans(corpus, k):
    wins = ref_windows(corpus, k)
    cnt = Counter(w for w, _, _ in wins)
    duppos: dict[int, list[int]] = {}
    for w, d, p in wins:
        if cnt[w] >= 2:
            duppos.setdefault(d, []).append(p)
    spans = []
    for d, ps in duppos.items():
        ps.sort()
        a = b = ps[0]
        for p in ps[1:]:
            if p <= b + k:  # coverage touches/overlaps -> same region
                b = p
            else:
                spans.append((d, a, b + k, b + k - a))
                a = b = p
        spans.append((d, a, b + k, b + k - a))
    return sorted(spans)


def ref_scrub(corpus, k):
    wins = ref_windows(corpus, k)
    occs: dict[str, list[tuple[int, int]]] = {}
    for w, d, p in wins:
        occs.setdefault(w, []).append((d, p))
    covered: set[tuple[int, int]] = set()
    for w, ps in occs.items():
        if len(ps) < 2:
            continue
        for d, p in sorted(ps)[1:]:  # corpus-first occurrence survives
            covered.update((d, ti) for ti in range(p, p + k))
    out = {}
    for d, t in corpus:
        toks = (t or "").split()
        keep = [tk for i, tk in enumerate(toks) if (d, i) not in covered]
        out[d] = (len(toks), len(toks) - len(keep), " ".join(keep))
    return out


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


def test_windows_enumerate_every_alignment(docs):
    got = {
        (r["doc_id"], r["pos"]): r["dig"]
        for r in substring_windows(docs, K).collect()
    }
    want = ref_windows(CORPUS, K)
    assert set(got) == {(d, p) for _, d, p in want}
    # equal window text <-> equal digest (the md5-trust differential)
    by_dig: dict[str, set[str]] = {}
    for w, d, p in want:
        by_dig.setdefault(got[(d, p)], set()).add(w)
    assert all(len(ws) == 1 for ws in by_dig.values())
    texts = [ws.pop() for ws in by_dig.values()]
    assert len(texts) == len(set(texts))


def test_spans_match_bruteforce_oracle(docs):
    got = sorted(
        (r["doc_id"], r["start_tok"], r["end_tok"], r["span_tokens"])
        for r in repeated_substring_spans(docs, K).collect()
    )
    assert got == ref_spans(CORPUS, K)


def test_spans_are_maximal_and_cover_every_duplicated_substring(docs):
    """Union-of-duplicated-windows is EXACTLY the token set covered by
    some >=K-token substring occurring >=2 times (Lee et al. 2022)."""
    spans = {
        r["doc_id"]: []
        for r in repeated_substring_spans(docs, K).collect()
    }
    for r in repeated_substring_spans(docs, K).collect():
        spans[r["doc_id"]].append((r["start_tok"], r["end_tok"]))
    # brute force: every duplicated substring of every length >= K
    texts = {d: (t or "").split() for d, t in CORPUS}
    all_subs = Counter()
    for d, toks in texts.items():
        for ln in range(K, len(toks) + 1):
            for p in range(len(toks) - ln + 1):
                all_subs[" ".join(toks[p : p + ln])] += 1
    covered_want: dict[int, set[int]] = {d: set() for d in texts}
    for d, toks in texts.items():
        for ln in range(K, len(toks) + 1):
            for p in range(len(toks) - ln + 1):
                if all_subs[" ".join(toks[p : p + ln])] >= 2:
                    covered_want[d].update(range(p, p + ln))
    covered_got = {d: set() for d in texts}
    for d, ss in spans.items():
        for a, b in ss:
            covered_got[d].update(range(a, b))
    for d in texts:
        assert covered_got.get(d, set()) == covered_want[d], d
    # maximality: islands never touch (merged spans are gap-separated)
    for d, ss in spans.items():
        ss = sorted(ss)
        assert all(b < a2 for (_, b), (a2, _) in zip(ss, ss[1:]))


def test_scrub_matches_bruteforce_and_keeps_first_occurrence(docs):
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_scrubbed"], r["text_clean"])
        for r in scrub_repeated_substrings(docs, K).collect()
    }
    want = ref_scrub(CORPUS, K)
    assert got == want
    # every document comes back, even NULL/empty/fully-scrubbed ones
    assert set(got) == {d for d, _ in CORPUS}
    # the corpus-first copy of the shared block survives in doc 0 ...
    assert "alpha beta gamma delta epsilon zeta" in got[0][2]
    # ... and is gone from the later copies
    assert "alpha beta" not in got[2][2]
    assert got[5][2] == ""  # doc 5 was ONLY the duplicated block
    # internal repeat: second copy inside doc 1 scrubbed, first kept
    assert got[1][0] == 13 and got[1][1] > 0


def test_partitioning_invariance(spark, docs):
    one = sorted(
        tuple(r) for r in repeated_substring_spans(docs.coalesce(1), K).collect()
    )
    many = sorted(
        tuple(r)
        for r in repeated_substring_spans(docs.repartition(13), K).collect()
    )
    assert one == many


def test_no_duplicates_means_no_spans_and_identity_scrub(spark):
    d = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "g h i j k l")], "doc_id bigint, text string"
    )
    assert repeated_substring_spans(d, 3).count() == 0
    got = {
        r["doc_id"]: (r["n_scrubbed"], r["text_clean"])
        for r in scrub_repeated_substrings(d, 3).collect()
    }
    assert got == {0: (0, "a b c d e f"), 1: (0, "g h i j k l")}


def ref_index_matches(new_corpus, index_corpus, k):
    """Brute-force twin of substring_index_matches: new-doc windows that
    TEXT-match any index window, coverage islands, per-doc rollup."""
    idx = {w for w, _, _ in ref_windows(index_corpus, k)}
    hitpos: dict[int, list[int]] = {}
    for w, d, p in ref_windows(new_corpus, k):
        if w in idx:
            hitpos.setdefault(d, []).append(p)
    out = {}
    for d, ps in hitpos.items():
        ps.sort()
        spans = []
        a = b = ps[0]
        for p in ps[1:]:
            if p <= b + k:
                b = p
            else:
                spans.append(b + k - a)
                a = b = p
        spans.append(b + k - a)
        out[d] = (len(spans), sum(spans), max(spans))
    return out


def test_index_matches_bruteforce_and_never_new_vs_new(spark):
    """Incremental screening differential: flagged docs/spans equal the
    brute-force text twin, and a repeat CONFINED to the new batch never
    flags (the never-new-vs-new contract — those digests only match
    after they land in the index)."""
    from asterlake.operators.substrings import (
        substring_digest_index,
        substring_index_matches,
    )

    index_corpus = [
        (100, "alpha beta gamma delta epsilon zeta corpus tail"),
        (101, "one two three four five six seven"),
        (102, None),
    ]
    new_corpus = [
        # shares the 6-token boilerplate with index doc 100
        (0, "pre alpha beta gamma delta epsilon zeta post"),
        # shares a 4-token run with index doc 101, shifted
        (1, "zzz one two three four yyy"),
        # repeats WITHIN the new batch only: must NOT flag
        (2, "new batch only block new batch only block"),
        (3, "new batch only block here too"),
        (4, "nothing shared at all in this one"),
        (5, ""),
    ]
    idx_df = spark.createDataFrame(index_corpus, "doc_id long, text string")
    new_df = spark.createDataFrame(new_corpus, "doc_id long, text string")
    index = substring_digest_index(idx_df, K)
    got = {
        r.doc_id: (r.n_spans, r.dup_tokens, r.max_span_tokens)
        for r in substring_index_matches(new_df, index, K).collect()
    }
    want = ref_index_matches(new_corpus, index_corpus, K)
    assert got == want
    assert 0 in got and 1 in got          # real cross-corpus hits flag
    assert 2 not in got and 3 not in got  # new-vs-new never flags
    assert 4 not in got and 5 not in got


def test_index_matches_partitioning_invariant_and_appendable(spark):
    """Same result when the index is round-tripped through parquet and
    the batch is repartitioned — the persistable-index contract; and
    appending the flagged batch's digests makes the batch's own repeats
    visible to the NEXT batch (the ingest loop)."""
    from asterlake.operators.substrings import (
        substring_digest_index,
        substring_index_matches,
    )

    idx_docs = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta corpus tail")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(0, "pre alpha beta gamma delta epsilon zeta post"),
         (1, "repeat me now repeat me now")],
        "doc_id long, text string",
    )
    import tempfile

    d = tempfile.mkdtemp()
    substring_digest_index(idx_docs, K).write.mode("overwrite").parquet(d)
    persisted = spark.read.parquet(d)
    a = {tuple(r) for r in substring_index_matches(batch, persisted, K).collect()}
    b = {
        tuple(r)
        for r in substring_index_matches(
            batch.repartition(5, "doc_id"), persisted, K
        ).collect()
    }
    assert a == b and len(a) == 1  # only doc 0; doc 1's repeat is internal
    # append the batch digests; the NEXT batch sharing doc 1's phrase hits
    from asterlake.operators.substrings import substring_windows  # noqa: F401

    substring_digest_index(batch, K).write.mode("append").parquet(d)
    nxt = spark.createDataFrame(
        # contains the 4-token window "repeat me now repeat" of batch doc 1
        [(10, "zz repeat me now repeat qq")], "doc_id long, text string"
    )
    got = substring_index_matches(
        nxt, spark.read.parquet(d), K
    ).collect()
    assert [(r.doc_id, r.n_spans) for r in got] == [(10, 1)]
