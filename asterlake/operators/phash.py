"""Perceptual-hash image near-duplicate detection (r13 verdict ask #4b).

Extends the dedup family to the IMAGE modality with the machinery the
repo already owns: a 64-bit difference hash (dHash — Krawetz's public
HackerFactor construction: downscale to a (gw+1) x gh grayscale grid,
emit the sign of each horizontal neighbor difference) computed from
REAL decoded pixels, then the exact simhash banding shape
(`dedup.simhash_candidate_pairs`) over the fingerprints: band equi-join
-> ``bit_count(xor)`` Hamming filter -> pair dedup. Two images that are
re-encodings, brightness shifts, or mild requantizations of the same
picture land on (near-)identical fingerprints; the banded join finds
them without the O(n^2) cross join.

EXACT-INTEGER contract (the engine-wide hash-gate discipline):
grayscale is the integer ITU-R 601 luma ``(299 R + 587 G + 114 B)``
kept UNnormalized, box-pool cells carry exact (sum, count) pairs, and
the neighbor comparison cross-multiplies ``sum_a * n_b > sum_b * n_a``
— no float enters the fingerprint, so it is bit-deterministic across
platforms and replayable by any oracle that can do integer arithmetic.
A uniform brightness lift that clamps nowhere shifts every cell mean by
the same amount and therefore preserves EVERY difference sign: the twin
hashes are identical by construction, not approximately.

Decode is Arrow-batched ``mapInPandas`` over the payload column (the
multimodal.py sanctioned-Python surface); the pixel reader mirrors
``multimodal._decode_bmp``'s fail-loud checks (BITMAPINFOHEADER,
BI_RGB, 24-bit — anything else raises rather than hashing garbage).

Scale shape: hashing is row-local over payload bytes (embarrassingly
parallel); downstream only the 8-byte fingerprint travels — the banded
self-join shuffles (long, long, int) rows, never pixels, and with
``max_hamming <= bands - 1`` the banding is LOSSLESS (pigeonhole), so
the result equals brute force without the quadratic pair space.

Reference scope: the reference lakehouse has no media handling at all;
this is the beyond-parity multimodal dedup tier.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "bmp_pair_table",
    "dhash64",
    "dhash_media",
    "dhash_candidate_pairs",
]


def _bmp_gray_rows(payload: bytes) -> "tuple[int, int, list[list[int]]]":
    """(width, height, top-down rows of integer luma*1000 values) from
    an uncompressed 24-bit BITMAPINFOHEADER BMP — the same layout (and
    the same fail-loud gates) as ``multimodal._decode_bmp``, but
    returning pixels instead of a mean. Luma is the integer ITU-R 601
    weighting ``299 R + 587 G + 114 B`` (sums to 1000), kept
    unnormalized so every downstream comparison stays exact."""
    magic, _, _, _, data_off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size, width, height, _, bpp = struct.unpack_from(
        "<IiiHH", payload, 14
    )
    if hdr_size != 40:
        raise ValueError(
            f"only BITMAPINFOHEADER (40-byte) BMP supported, got "
            f"hdr_size={hdr_size}"
        )
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0:
        raise ValueError(
            f"only uncompressed BI_RGB BMP supported, got "
            f"compression={compression}"
        )
    if bpp != 24:
        raise ValueError(f"only 24-bit BMP supported, got bpp={bpp}")
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    h = abs(height)
    rows: "list[list[int]]" = []
    for r in range(h):
        # positive height = bottom-up storage; normalize to top-down
        stored = h - 1 - r if height > 0 else r
        start = data_off + stored * stride
        px = payload[start : start + row_bytes]
        rows.append(
            [
                # BMP stores BGR
                114 * px[i] + 587 * px[i + 1] + 299 * px[i + 2]
                for i in range(0, row_bytes, 3)
            ]
        )
    return width, h, rows


def dhash64(payload: bytes, grid_w: int = 8, grid_h: int = 8) -> int:
    """The 64-bit dHash of a BMP payload (pure function — the unit the
    differential tests pin). The image is box-pooled to a
    ``(grid_w + 1) x grid_h`` grid of exact (luma-sum, pixel-count)
    cells with floor boundaries ``x_c = floor(c * w / (grid_w + 1))``;
    bit ``r * grid_w + c`` is set iff cell (r, c)'s mean exceeds cell
    (r, c+1)'s, judged by integer cross-multiplication. Images smaller
    than the grid would yield empty cells (an undefined comparison) —
    they raise; perceptual hashing of sub-icon images is not a
    meaningful operation."""
    gw1 = grid_w + 1
    w, h, rows = _bmp_gray_rows(payload)
    if w < gw1 or h < grid_h:
        raise ValueError(
            f"image {w}x{h} smaller than the {gw1}x{grid_h} dHash grid"
        )
    xb = [(c * w) // gw1 for c in range(gw1 + 1)]
    yb = [(r * h) // grid_h for r in range(grid_h + 1)]
    fp = 0
    for r in range(grid_h):
        sums = []
        for c in range(gw1):
            s = 0
            n = 0
            for y in range(yb[r], yb[r + 1]):
                row = rows[y]
                for x in range(xb[c], xb[c + 1]):
                    s += row[x]
                    n += 1
            sums.append((s, n))
        for c in range(grid_w):
            (sa, na), (sb, nb) = sums[c], sums[c + 1]
            if sa * nb > sb * na:
                fp |= 1 << (r * grid_w + c)
    return fp


_DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dhash", LongType()),
    ]
)


def dhash_media(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, dhash) fingerprints for a media table — Arrow-batched
    ``mapInPandas`` over the payload bytes; only the 8-byte fingerprint
    leaves the task. The 64-bit hash is stored in a signed BIGINT (bit
    63 may set the sign — xor/bit_count/band extraction are
    sign-agnostic, the simhash storage convention extended to the full
    64 bits)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fps = [
                dhash64(bytes(p)) for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    # wrap to signed 64-bit
                    "dhash": pd.Series(
                        [f - (1 << 64) if f >= (1 << 63) else f for f in fps],
                        dtype="int64",
                    ),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        batches, _DHASH_SCHEMA
    )


def dhash_candidate_pairs(
    fps: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup image pairs by banded dHash — the exact
    ``simhash_candidate_pairs`` shape over 64-bit fingerprints: split
    the hash into ``bands`` equal chunks (``shiftrightunsigned`` — bit
    63 carries no sign here), equi-join on the integer (band, chunk)
    key, Hamming-filter with ``bit_count(xor)``, dedup pairs that
    collide in several bands. With ``max_hamming <= bands - 1`` the
    banding is LOSSLESS (pigeonhole: fewer flips than bands cannot
    dirty every band), so the result equals brute force. Returns
    ``({id}_a, {id}_b, hamming)`` with ``a < b``.

    The fingerprint relation is ``localCheckpoint``-materialized before
    the self-join: unlike the simhash table (whose identical exchanges
    ReuseExchange collapses), a ``mapInPandas`` subtree does NOT
    canonicalize across the two join sides — without the landing every
    image is generated/decoded TWICE (measured 4 MapInPandas nodes,
    zero reuse). At scale this is the only sane shape anyway: the
    fingerprint index (16 bytes/image) is computed once off the media
    scan and pixels never travel or repeat."""
    if 64 % bands:
        raise ValueError(f"bands must divide 64, got {bands}")
    blen = 64 // bands
    fps = fps.select(id_col, hash_col).localCheckpoint()
    banded = fps.select(
        F.col(id_col),
        F.col(hash_col).alias("_fp"),
        F.explode(
            F.array(
                *[
                    (
                        F.shiftrightunsigned(F.col(hash_col), b * blen)
                        .bitwiseAND(F.lit((1 << blen) - 1) if blen < 64 else F.lit(-1))
                        + F.lit(b << min(blen, 62))
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band_key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(
        F.col("a._fp").bitwiseXOR(F.col("b._fp"))
    ).cast("int")
    return (
        a.join(
            b,
            (F.col("a._band_key") == F.col("b._band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias(f"{id_col}_a"),
            F.col(f"b.{id_col}").alias(f"{id_col}_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates([f"{id_col}_a", f"{id_col}_b"])
    )


def bmp_pair_table(
    spark: SparkSession,
    n_pairs: int = 32,
    width: int = 32,
    height: int = 32,
    shift: int = 4,
) -> DataFrame:
    """``2 * n_pairs`` real BMP images where (2k, 2k+1) are perceptual
    twins with different bytes: even ids carry md5-derived pixels with
    every channel in [0, 255 - shift], odd ids the SAME pixels lifted
    by ``shift`` per channel — clamp-free, so every dHash gradient sign
    (and hence the full 64-bit fingerprint) is preserved exactly while
    no payload byte survives; cross-pair images are independent md5
    streams. Generated executor-side in the Arrow batch loop off
    ``spark.range`` (the ``real_media_table`` shape)."""
    cap = 256 - shift

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for mid in pdf["id"]:
                mid = int(mid)
                seed, lift = mid // 2, shift * (mid % 2)
                raw = _det_stream(f"phash:{seed}", width * height * 3)
                px = bytes(b % cap + lift for b in raw)
                payloads.append(_bmp_encode(px, width, height))
                ids.append(mid)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "payload": payloads,
                }
            )

    schema = "media_id long, payload binary"
    # bounded partition count: the default local[32] split puts 2-3
    # images per Python worker — fork overhead, not parallelism
    parts = max(2, min(8, n_pairs // 4))
    return spark.range(0, 2 * n_pairs, 1, parts).mapInPandas(
        batches, schema
    )


def _det_stream(seed: str, n: int) -> bytes:
    """Chained-md5 deterministic bytes (the multimodal._det_bytes
    construction, local so the generator column stays self-contained)."""
    out = bytearray()
    h = hashlib.md5(seed.encode()).digest()
    while len(out) < n:
        out.extend(h)
        h = hashlib.md5(h).digest()
    return bytes(out[:n])


def _bmp_encode(pixels_bgr: bytes, width: int, height: int) -> bytes:
    """Uncompressed 24-bit BITMAPINFOHEADER BMP from packed BGR rows
    (top-down input, stored bottom-up per the format)."""
    row = width * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    for r in range(height - 1, -1, -1):
        body += pixels_bgr[r * row : (r + 1) * row]
        body += b"\x00" * pad
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54
    )
    dib = struct.pack(
        "<IiiHHIIiiII",
        40,
        width,
        height,
        1,
        24,
        0,
        len(body),
        2835,
        2835,
        0,
        0,
    )
    return header + dib + bytes(body)
