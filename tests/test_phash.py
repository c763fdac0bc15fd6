"""Perceptual-hash image near-dup (operators/phash.py)."""

import pytest

from asterlake.operators.phash import (
    _bmp_encode,
    bmp_pair_table,
    dhash64,
    dhash_candidate_pairs,
    dhash_media,
)


def _bmp_from_gray(vals, width, height):
    """24-bit BMP whose BGR channels all equal the given top-down
    grayscale grid (luma == 1000 * v exactly)."""
    px = bytearray()
    for row in vals:
        for v in row:
            px += bytes([v, v, v])
    return _bmp_encode(bytes(px), width, height)


def test_dhash_bits_on_exact_grid():
    """A 9x8 image (one pixel per dHash cell): bit (r, c) must be the
    sign of the horizontal neighbor difference, in row-major bit
    order."""
    vals = [
        [(r * 9 + c) % 7 for c in range(9)] for r in range(8)
    ]
    fp = dhash64(_bmp_from_gray(vals, 9, 8))
    want = 0
    for r in range(8):
        for c in range(8):
            if vals[r][c] > vals[r][c + 1]:
                want |= 1 << (r * 8 + c)
    assert fp == want


def test_dhash_brightness_shift_invariant():
    """A clamp-free uniform lift preserves every gradient sign — the
    exact-identity claim the pair-table generator relies on."""
    import hashlib

    base = hashlib.sha256(b"phash-test").digest() * 48  # 1536 bytes
    px = bytes(b % 248 for b in base[: 16 * 16 * 3])
    lifted = bytes(b + 4 for b in px)
    assert dhash64(_bmp_encode(px, 16, 16)) == dhash64(
        _bmp_encode(lifted, 16, 16)
    )


def test_dhash_fail_loud():
    with pytest.raises(ValueError, match="not a BMP"):
        dhash64(b"PNG garbage that is long enough to unpack headers")
    # a real BMP smaller than the 9x8 grid must refuse, not hash junk
    tiny = _bmp_from_gray([[1, 2, 3]] * 2, 3, 2)
    with pytest.raises(ValueError, match="smaller than"):
        dhash64(tiny)


def test_pair_table_twins_hash_identically(spark):
    """Every (2k, 2k+1) pair: different payload bytes, identical
    64-bit fingerprint."""
    media = bmp_pair_table(spark, n_pairs=6)
    rows = {r.media_id: r for r in media.collect()}
    fps = {
        r.media_id: r.dhash for r in dhash_media(media).collect()
    }
    for k in range(6):
        assert bytes(rows[2 * k].payload) != bytes(
            rows[2 * k + 1].payload
        )
        assert fps[2 * k] == fps[2 * k + 1]


def test_candidate_pairs_match_brute_force(spark):
    """The banded join returns EXACTLY the brute-force
    hamming <= max_hamming pairs (lossless banding, pigeonhole) —
    twins at hamming 0 found, independent images absent."""
    media = bmp_pair_table(spark, n_pairs=8)
    fps = {
        r.media_id: r.dhash & ((1 << 64) - 1)
        for r in dhash_media(media).collect()
    }
    want = {
        (a, b)
        for a in fps
        for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {
        (r.media_id_a, r.media_id_b)
        for r in dhash_candidate_pairs(dhash_media(media)).collect()
    }
    assert got == want
    assert {(2 * k, 2 * k + 1) for k in range(8)} <= got


def test_candidate_pairs_rejects_bad_bands(spark):
    media = bmp_pair_table(spark, n_pairs=1)
    with pytest.raises(ValueError, match="divide 64"):
        dhash_candidate_pairs(dhash_media(media), bands=5)
