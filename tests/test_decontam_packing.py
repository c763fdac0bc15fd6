"""Unit + plan tests for benchmark decontamination (operators/decontam.py)
and sequence packing (operators/packing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asterlake.operators.decontam import (
    benchmark_ngrams,
    contamination_report,
    decontaminate,
)
from asterlake.operators.packing import pack_sequences
from asterlake.plans.inspect import has_node, plan_string


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "the quick brown fox naps all day long"),  # shares 3-gram w/ 1
        (4, "completely unrelated words appear here today"),
        (5, "one two"),  # too short for a 3-gram
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_by_shared_trigram(spark, docs):
    bench = docs.filter(F.col("doc_id") == 1)
    corpus = docs.filter(F.col("doc_id") != 1)
    report = {
        r.doc_id: r.n_hit_ngrams
        for r in contamination_report(corpus, bench).collect()
    }
    # doc 3 shares exactly "the quick brown" and "quick brown fox"
    assert report == {3: 2}
    clean = sorted(r.doc_id for r in decontaminate(corpus, bench).collect())
    assert clean == [2, 4, 5]


def test_self_decontamination_drops_everything_shinglable(spark, docs):
    # every doc with >= 3 tokens overlaps itself; the 2-token doc survives
    clean = decontaminate(docs, docs)
    assert [r.doc_id for r in clean.collect()] == [5]


def test_benchmark_ngrams_distinct(spark, docs):
    sh = benchmark_ngrams(docs.filter(F.col("doc_id") == 1))
    got = [r.shingle for r in sh.collect()]
    assert len(got) == len(set(got)) == 7  # 9 tokens -> 7 trigrams, all unique


def test_decontam_probe_is_broadcast_semi_join(spark, docs):
    plan = plan_string(contamination_report(docs, docs.limit(2)))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_packing_offsets_are_a_permutation_of_the_stream(spark, docs):
    packed = pack_sequences(
        docs, F.size(F.split(F.col("text"), " ")), budget=10, n_buckets=4
    ).collect()
    # offsets sorted = exclusive prefix sums of n_tokens in (bucket, id)
    # order: contiguous, non-overlapping, total == corpus token count
    rows = sorted(packed, key=lambda r: r.offset)
    expect = 0
    for r in rows:
        assert r.offset == expect
        assert r.pack_id == r.offset // 10
        assert r.pack_offset == r.offset % 10
        assert r.end_pack_id == (r.offset + max(r.n_tokens - 1, 0)) // 10
        expect += r.n_tokens
    assert expect == sum(r.n_tokens for r in packed)


def test_packing_is_partitioning_invariant(spark, docs):
    n_tok = F.size(F.split(F.col("text"), " "))
    a = {r.doc_id: r.offset for r in pack_sequences(docs, n_tok).collect()}
    b = {
        r.doc_id: r.offset
        for r in pack_sequences(docs.repartition(7), n_tok).collect()
    }
    assert a == b


def test_packing_has_no_global_single_partition_window(spark, docs):
    plan = plan_string(
        pack_sequences(docs, F.size(F.split(F.col("text"), " ")), n_buckets=4)
    )
    # corpus-side window is hash-partitioned by bucket; the only
    # SinglePartition exchange feeds the n_buckets-row totals table
    tree = plan.split("\n\n", 1)[0]
    assert "Window" in tree
    detail = plan
    assert detail.count("SinglePartition") <= 1
    assert has_node(plan, "BroadcastExchange")  # bucket-prefix join side


def test_pack_manifest_partitions_every_document_and_pack(spark):
    """q_pack_manifest invariants: per-document in-pack counts sum to
    the document's token count (nothing lost at straddles), every pack
    except the last is exactly full, and in-pack ranges tile each pack
    without overlap."""
    from asterlake.queries import QUERIES

    SF = "/root/testdata/sf0.001"
    rows = QUERIES["q_pack_manifest"].spark(spark, SF).collect()
    docs = {
        r["doc_id"]: len(r["text"].split(" "))
        for r in spark.read.parquet(SF + "/documents.parquet").collect()
    }
    by_doc: dict[int, int] = {}
    by_pack: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + r["n_tokens_in_pack"]
        by_pack.setdefault(r["pack_id"], []).append(
            (r["start_in_pack"], r["n_tokens_in_pack"])
        )
    assert by_doc == {d: n for d, n in docs.items() if n > 0}
    last = max(by_pack)
    for p, spans in by_pack.items():
        spans.sort()
        assert spans[0][0] == 0
        for (s1, n1), (s2, _) in zip(spans, spans[1:]):
            assert s2 == s1 + n1, (p, spans)
        total = sum(n for _, n in spans)
        assert total == 512 or (p == last and 0 < total <= 512), (p, total)
