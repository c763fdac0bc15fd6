"""Aho-Corasick scanning (operators/matcher.py): exact-count
differential against a naive position scan, the classic overlap/
suffix-pattern traps, automaton hygiene, and the Spark surface."""

from __future__ import annotations

import pytest

from asterlake.operators.matcher import ac_build, ac_match_counts, ac_scan_text


def naive_counts(patterns: list[str], text: str) -> list[int]:
    return [
        sum(
            1
            for i in range(len(text) - len(p) + 1)
            if text[i : i + len(p)] == p
        )
        for p in patterns
    ]


CASES = [
    # the canonical AC example: overlapping + suffix-of-each-other
    (["he", "she", "his", "hers"], "ushers"),
    (["aa"], "aaaa"),                     # overlapping same-pattern runs
    (["a", "ab", "abc", "bc"], "abcabc"),
    (["abcd"], "abc"),                    # near-miss
    (["xyz"], ""),                        # empty text
    (["b", "ba", "ab"], "ababab"),
]


@pytest.mark.parametrize("patterns,text", CASES)
def test_counts_match_naive_position_scan(patterns, text):
    auto = ac_build(patterns)
    assert ac_scan_text(auto, text) == naive_counts(patterns, text)


def test_failure_links_fire_mid_pattern():
    # after matching "ushe" the automaton must fail from 'ushe(r)' into
    # the "he"->"her"->"hers" chain — the case a trie-only matcher loses
    auto = ac_build(["she", "hers"])
    assert ac_scan_text(auto, "ushers") == [1, 1]


def test_random_fuzz_against_naive():
    # deterministic pseudo-random corpus over a tiny alphabet maximizes
    # overlap pressure
    patterns = ["ab", "ba", "aab", "bba", "abab", "a", "aaab"]
    auto = ac_build(patterns)
    state = 12345
    for _ in range(50):
        chars = []
        for _ in range(60):
            state = (state * 1103515245 + 12345) % (1 << 31)
            chars.append("ab"[state % 2])
        text = "".join(chars)
        assert ac_scan_text(auto, text) == naive_counts(patterns, text), text


def test_build_rejects_duplicates_and_empties():
    with pytest.raises(ValueError, match="duplicate"):
        ac_build(["x", "x"])
    with pytest.raises(ValueError, match="empty"):
        ac_build(["x", ""])


def test_spark_surface_matches_reference(spark):
    rows = [
        (0, "she sells seashells; ushers rush here"),
        (1, "no hits at all"),
        (2, None),
        (3, "hehehe"),
    ]
    patterns = ["he", "she", "hers", "sea", "us"]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["pattern"]): r["n_matches"]
        for r in ac_match_counts(df, patterns).collect()
    }
    for doc_id, text in rows:
        counts = naive_counts(patterns, text or "")
        for pid, n in enumerate(counts):
            assert got.get((doc_id, patterns[pid]), 0) == n, (doc_id, pid)
    # only matched patterns emit rows
    assert all(n > 0 for n in got.values())


def test_partitioning_invariance(spark):
    rows = [(i, "ab" * (i % 7) + "ba" * (i % 5)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pats = ["ab", "ba", "abba"]
    one = sorted(tuple(r) for r in ac_match_counts(df.coalesce(1), pats).collect())
    many = sorted(tuple(r) for r in ac_match_counts(df.repartition(9), pats).collect())
    assert one == many
