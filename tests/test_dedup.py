"""Semantic tests for the dedup operator family: the oracle-parity test
proves Spark==DuckDB; these prove the operators find what they should."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asterlake.operators.dedup import (
    exact_duplicate_groups,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprint,
    word_shingles,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    yield df
    df.unpersist()  # a lingering cache rewrites later tests' plans


def test_shingles_basic(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], ["text"])
    rows = df.select(word_shingles("text", 3).alias("sh")).collect()
    assert rows[0].sh == ["a b c", "b c d"]
    assert rows[1].sh == []  # shorter than n -> empty, not a crash


def test_exact_dedup_finds_planted_copies(spark, docs):
    doubled = docs.select("doc_id", "text").unionByName(
        docs.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    )
    groups = exact_duplicate_groups(doubled)
    assert groups.count() == docs.count()  # one group per distinct text
    assert groups.filter("n_copies != 2").count() == 0
    # survivor is deterministic: always the ORIGINAL id, never the clone
    assert groups.filter("canonical_doc_id >= 10000").count() == 0


def test_lsh_candidates_contain_true_near_dups(docs):
    truth = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert truth, "testdata should contain planted near-duplicates"
    candidates = {
        (r.doc_a, r.doc_b) for r in minhash_candidate_pairs(docs).collect()
    }
    # LSH at k=12/b=4 catches jaccard>=0.8 pairs with prob ~1-(1-0.512)^4=0.94^;
    # on the planted ~0.99 pairs recall should be total
    assert truth <= candidates
    # and it must not devolve into the cross join
    n = docs.count()
    assert len(candidates) < n * (n - 1) / 20


def test_simhash_near_dups_have_small_hamming_distance(docs):
    fp = docs.select("doc_id", simhash_fingerprint("text").alias("h"))
    pairs = ngram_jaccard_pairs(docs, threshold=0.8)
    joined = (
        pairs.join(fp.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("h", "ha"), "doc_a")
        .join(fp.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("h", "hb"), "doc_b")
    )
    # hamming distance via char-wise compare of the bit strings
    ham = joined.select(
        F.expr(
            "size(filter(zip_with(split(ha, ''), split(hb, ''), (x, y) -> x != y), v -> v))"
        ).alias("d")
    )
    assert ham.count() > 0
    assert ham.agg(F.max("d")).collect()[0][0] <= 8  # 32-bit fingerprints


def test_ngram_jaccard_is_symmetric_bounded(docs):
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    for r in pairs:
        assert r.doc_a < r.doc_b
        assert 0.5 <= r.jaccard <= 1.0


def test_simhash_pairs_subset_of_bruteforce(spark, docs):
    """Banded candidate pairs == the brute-force hamming<=8 pairs that
    share at least one clean band; with max_hamming < bands the banding
    is LOSSLESS (pigeonhole), so compare against full brute force."""
    from asterlake.operators.dedup import simhash_candidate_pairs, simhash_table

    small = docs.select("doc_id", "text").limit(200).cache()
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_candidate_pairs(small, bands=4, max_hamming=3).collect()
    }
    # brute force over fingerprints
    fp = {r.doc_id: r.simhash for r in simhash_table(small).collect()}
    ids = sorted(fp)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = sum(x != y for x, y in zip(fp[a], fp[b]))
            if h <= 3:  # hamming<=3 < 4 bands => some band must match
                want.add((a, b, h))
    assert got == want


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc fully contained in a long one: containment 1.0, Jaccard
    far below any dedup threshold — the case the asymmetric measure exists
    for."""
    from asterlake.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long_ = short + " " + " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short), (2, long_), (3, "zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in ngram_containment_pairs(docs, threshold=0.9).collect()
    }
    assert cont == {(1, 2): 1.0}
    jac = ngram_jaccard_pairs(docs, threshold=0.3).collect()
    assert jac == []  # Jaccard ~ 3/43 — blind to the subset pair


def test_minhash_index_matches_never_pairs_new_with_new(spark):
    from pyspark.sql import functions as F

    from asterlake.operators.dedup import minhash_index_matches

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # dup of 1
            (10, "the quick brown fox jumps over the lazy dog"),  # new, dup
            (20, "completely different text with no overlap here at all"),
            (30, "completely different text with no overlap here at all"),
        ],
        "doc_id long, text string",
    )
    new = docs.filter(F.col("doc_id") >= 10)
    idx = docs.filter(F.col("doc_id") < 10)
    got = {
        r.doc_id: (r.n_candidates, r.first_match)
        for r in minhash_index_matches(new, idx).collect()
    }
    # doc 10 collides with BOTH index copies; docs 20/30 are identical to
    # each other (new-vs-new) but match nothing in the index -> absent
    assert got == {10: (2, 1)}


def test_span_dedup_first_occurrence_survives(spark):
    from asterlake.operators.dedup import span_dedup

    boiler = "w1 w2 w3 w4"  # 4-token span unit for the test
    docs = spark.createDataFrame(
        [
            (1, boiler + " unique one two three"),
            (2, boiler + " other words here now"),  # repeated boilerplate
            (3, "all fresh tokens in this doc here yes"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_segments, r.n_kept, r.text_clean)
        for r in span_dedup(docs, span_tokens=4).collect()
    }
    # doc 1 keeps everything (it owns the first occurrence)
    assert got[1] == (2, 2, boiler + " unique one two three")
    # doc 2 loses the boilerplate span, keeps its tail
    assert got[2] == (2, 1, "other words here now")
    # doc 3 untouched
    assert got[3][1] == got[3][0]


def test_ngram_jaccard_prefix_method_matches_count_method(spark):
    """The prefix-filtered (All-Pairs) path must return the identical
    pair set and jaccard doubles as the inverted-count path — prefix
    filtering is a lossless candidate-pruning, not an approximation."""
    from asterlake.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    count_form = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, method="count").collect()
    }
    prefix_form = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, method="prefix").collect()
    }
    assert count_form == prefix_form
    assert len(count_form) > 0


def test_ngram_prefix_size_filter_keeps_boundary_pair(spark):
    """The All-Pairs size filter prunes on t*|A| <= |B| <= |A|/t — both
    INCLUSIVE: a pair sitting exactly on the bound (|B| = t*|A| with
    jaccard exactly t) must survive. Doc a: 6 distinct words -> 4
    shingles; doc b: its first 4 words -> 2 shingles, both shared, so
    jaccard = 2/(4+2-2) = 0.5 = t and the filter's b-side test is the
    equality 2 >= 4*0.5. A strict '>' in either place silently drops
    exactly-threshold pairs — the off-by-one this pins."""
    from asterlake.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5 w6"), (2, "w1 w2 w3 w4")],
        "doc_id int, text string",
    )
    got = ngram_jaccard_pairs(
        docs, n=3, threshold=0.5, method="prefix"
    ).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in got] == [(1, 2, 0.5)]
