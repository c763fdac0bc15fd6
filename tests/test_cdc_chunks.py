"""Content-defined chunking (operators/chunking.py cdc_chunks): DuckDB
fold differential, boundary-shift resistance (the property fixed
windows lack), coverage/density invariants, and partitioning
invariance."""

from __future__ import annotations

import duckdb
import pytest

from asterlake.operators.chunking import cdc_chunks, cdc_oracle_sql

A_TEXT = (
    "the cat sat on the mat and the dog ran over the log while a bird "
    "flew past the barn then the farmer walked along the road counting "
    "sheep and goats before the rain started falling on the quiet field"
)
ROWS = [
    (0, A_TEXT),
    # B = junk prefix + A's exact tail: CDC boundaries resynchronize a
    # window-width past the splice, so most of A's chunks reappear
    (1, "zz qq ww ee rr tt yy uu " + A_TEXT),
    (2, ""),
    (3, "one"),
    (4, "a b c d e f g h"),
]


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def _duck_rows():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in ROWS)
        + ") t(doc_id, text)"
    )
    return con.execute(f"""
      SELECT doc_id, CAST(u.i - 1 AS INT) AS chunk_idx,
             u.c.h AS chunk_hash, u.c.n AS n_tokens
      FROM (SELECT doc_id,
              unnest(list_transform(chunks, (c, i) -> {{'i': i, 'c': c}})) AS u
            FROM (SELECT doc_id, {cdc_oracle_sql()} AS chunks FROM docs))
    """).fetchall()


def test_matches_duckdb_fold_bit_for_bit(spark):
    got = sorted(tuple(r) for r in cdc_chunks(_docs(spark)).collect())
    assert got == sorted(_duck_rows())


def test_chunks_cover_every_token_exactly_once(spark):
    by_doc: dict[int, list] = {}
    for r in cdc_chunks(_docs(spark)).collect():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_tokens"])
        )
    for doc_id, text in ROWS:
        chunks = sorted(by_doc[doc_id])
        # dense 0..k-1 indices, token counts sum to the doc's count
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        assert sum(c[1] for c in chunks) == len(text.split(" "))
        assert all(c[1] > 0 for c in chunks)


def test_boundaries_shift_resistant_under_prefix_insertion(spark):
    """The CDC property: prepending 8 junk tokens to A leaves most of
    A's chunk fingerprints intact (boundaries resync once the rolling
    window clears the splice) — a fixed-window chunker would shift
    every chunk and share none."""
    hashes: dict[int, set] = {0: set(), 1: set()}
    for r in cdc_chunks(_docs(spark)).collect():
        if r["doc_id"] in hashes:
            hashes[r["doc_id"]].add(r["chunk_hash"])
    shared = hashes[0] & hashes[1]
    assert len(shared) >= max(1, len(hashes[0]) // 2), (
        hashes[0], hashes[1]
    )


def test_partitioning_invariance(spark):
    one = sorted(tuple(r) for r in cdc_chunks(_docs(spark).coalesce(1)).collect())
    many = sorted(tuple(r) for r in cdc_chunks(_docs(spark).repartition(5)).collect())
    assert one == many


@pytest.mark.parametrize("divisor,window", [(4, 2), (8, 4), (16, 4)])
def test_average_chunk_size_tracks_divisor(spark, divisor, window):
    """Boundary probability is 1/divisor per eligible position, so the
    mean chunk length lands near `divisor` (loose band — the fixture is
    small)."""
    out = cdc_chunks(
        _docs(spark).where("doc_id = 0"), window=window, divisor=divisor
    ).collect()
    n_tokens = sum(r["n_tokens"] for r in out)
    mean = n_tokens / len(out)
    assert divisor / 3 <= mean <= divisor * 4, (divisor, mean, len(out))
