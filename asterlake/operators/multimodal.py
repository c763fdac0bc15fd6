"""Multimodal columns (beyond-parity: image/audio/video in the lakehouse).

Media are **opaque ``binary`` payload columns with a typed metadata struct**
— the lakehouse never interprets pixels/samples on the JVM side; any
decode/transform runs in Arrow-batched Python (``mapInPandas``) where the
codec libraries live. All the Spark-side plumbing is real — schemas, batch
iteration, partitioning, UDF signatures — and since r6 so is the decode
for the two formats the standard library can parse: ``decode_media_real``
reads actual RIFF/WAVE PCM (``wave``) and uncompressed 24-bit BMP
(``struct``) containers. The remaining formats (png/jpeg/mp4) still need
PIL/pyav — absent from this container — so the fake-kernel operators
below keep exercising that plumbing with deterministic payloads, and the
real path raises ValueError at the clearly-marked format branch where
those libraries slot in.

Schema:

    media(media_id long, kind string, payload binary,
          meta struct<width int, height int, sample_rate int,
                      n_frames int, format string>)

Scale design (100 TB of media):
- Payloads never shuffle: every operator here is a map-side
  ``mapInPandas`` (no keys, no exchange); downstream joins should join on
  ``media_id`` against *derived* (small) feature tables, not the payloads.
- Arrow moves payload bytes Python-side zero-copy per batch;
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory —
  size it so batch_rows x max_payload fits the executor (e.g. 64 rows of
  16 MB frames, not the 10k default).
- Frame sampling EXPLODES rows (one per sampled frame) inside the batch —
  output partition count follows input; repartition after sampling if the
  fan-out is large.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("format", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", FloatType()),
        StructField("payload_digest", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)

FEATURE_DIM = 16
FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def synthetic_media(
    spark: SparkSession, n: int = 64, payload_repeats: int = 4
) -> DataFrame:
    """Deterministic fake media table, generated JVM-side from ``range``.

    Payload = unhex of a chained-md5 string keyed on media_id — stable
    across runs/engines, arbitrary-looking bytes, zero Python in the loop.
    Kinds cycle image/audio/video; meta fields are kind-appropriate.
    """
    md5_chain = "md5(cast(id as string))"
    for _ in range(payload_repeats - 1):
        md5_chain = f"concat({md5_chain}, md5(concat(cast(id as string), {md5_chain})))"
    return spark.range(n).selectExpr(
        "id AS media_id",
        "element_at(array('image','audio','video'), cast(id % 3 AS int) + 1) AS kind",
        f"unhex({md5_chain}) AS payload",
        """named_struct(
             'width',       CASE WHEN id % 3 = 0 THEN 8 + cast(id % 32 AS int) END,
             'height',      CASE WHEN id % 3 = 0 THEN 8 + cast(id % 16 AS int) END,
             'sample_rate', CASE WHEN id % 3 = 1 THEN 16000 END,
             'n_frames',    CASE WHEN id % 3 = 2 THEN 4 + cast(id % 8 AS int) END,
             'format',      element_at(array('png','wav','mp4'), cast(id % 3 AS int) + 1)
           ) AS meta""",
    )


def _fake_decode_stats(payload: bytes) -> tuple[int, float, str]:
    """Deterministic stand-in for a real decode: byte stats + digest.

    The digest hashes the *hex representation* of the payload, not the raw
    bytes — engine-portable (DuckDB's md5 is VARCHAR-only), so the whole
    binary round-trip (JVM unhex -> Arrow -> Python bytes) is
    oracle-checkable bit-for-bit."""
    n = len(payload)
    mean = float(sum(payload) / n) if n else 0.0
    return n, mean, hashlib.md5(payload.hex().encode()).hexdigest()


def decode_media(media: DataFrame, real: bool = False) -> DataFrame:
    """Decode payloads to per-item stats via Arrow-batched ``mapInPandas``.

    ``real=True`` dispatches to :func:`decode_media_real` — an actual
    stdlib-only codec path (WAV PCM via ``wave``, 24-bit BMP via
    ``struct``; see REAL_DECODED_SCHEMA). Formats those two can't parse
    (png/jpeg/mp4) still need PIL/pyav and raise there — that is the
    remaining swap point.
    """
    if real:
        return decode_media_real(media)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = [_fake_decode_stats(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [s[0] for s in stats],
                    "mean_byte": [s[1] for s in stats],
                    "payload_digest": [s[2] for s in stats],
                }
            )

    return media.mapInPandas(batches, DECODED_SCHEMA)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """'Resize' images to width x height: payload re-derived
    deterministically (md5 of original sized to w*h bytes), meta updated —
    the exact shape of a real thumbnailing pass. Non-images pass through
    untouched, same schema (MEDIA_SCHEMA)."""

    target_hex = 2 * width * height

    def _resized(payload) -> bytes:
        # hex-space md5 chain (engine-portable, see _fake_decode_stats)
        seed = bytes(payload).hex()
        chunks: list[str] = []
        total = 0
        while total < target_hex:
            seed = hashlib.md5(seed.encode()).hexdigest()
            chunks.append(seed)
            total += len(seed)
        return bytes.fromhex("".join(chunks)[:target_hex])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # column-list construction: one pass over zipped columns, fresh
        # frame per batch — no iterrows()/at[] cell mutation (the slowest
        # pandas idiom; VERDICT r1 #3)
        for pdf in it:
            kinds = pdf["kind"].tolist()
            payloads = [
                _resized(p) if k == "image" else p
                for k, p in zip(kinds, pdf["payload"])
            ]
            metas = [
                {
                    **(dict(m) if m is not None else {}),
                    "width": width,
                    "height": height,
                }
                if k == "image"
                else m
                for k, m in zip(kinds, pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].tolist(),
                    "kind": kinds,
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(batches, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every: int = 2, frame_bytes: int = 16) -> DataFrame:
    """Sample every ``every``-th frame of each video: one output row per
    sampled frame, frame i = payload[i*frame_bytes : (i+1)*frame_bytes]
    (cycled when payloads are short). The in-batch explode means output
    row count = sum over videos of ceil(n_frames / every)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, blobs = [], [], []
            for mid, kind, meta, pl in zip(
                pdf["media_id"], pdf["kind"], pdf["meta"], pdf["payload"]
            ):
                if kind != "video" or meta is None:
                    continue
                # nullable int struct fields surface as float64 in pandas
                raw = meta["n_frames"]
                n_frames = 0 if raw is None or pd.isna(raw) else int(raw)
                payload = bytes(pl)
                for fi in range(0, n_frames, every):
                    start = (fi * frame_bytes) % max(len(payload), 1)
                    chunk = payload[start : start + frame_bytes]
                    ids.append(mid)
                    idxs.append(fi)
                    blobs.append(chunk)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": blobs}
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)


def extract_features(
    media: DataFrame, dim: int = FEATURE_DIM, kernel: Callable | None = None
) -> DataFrame:
    """Payload -> dim-float feature vector (the fake of an embedding model).

    Fake kernel: byte-histogram over ``dim`` equal-width buckets, L1-
    normalized — deterministic, content-sensitive, unit-testable. A real
    model slots in as ``kernel(payload) -> list[float]`` and runs inside
    the same Arrow batch loop (this is where a GPU inference call goes)."""

    def default_kernel(payload: bytes) -> list[float]:
        hist = [0] * dim
        for b in payload:
            hist[b * dim // 256] += 1
        total = sum(hist) or 1
        return [float(h) / total for h in hist]

    fn = kernel or default_kernel

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [fn(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL codecs (stdlib-only): WAV PCM and 24-bit BMP
# ---------------------------------------------------------------------------
# The container ships no PIL/soundfile/pyav, but two production formats
# need nothing beyond the standard library: RIFF/WAVE PCM (the `wave`
# module) and uncompressed 24-bit BMP (fixed `struct` headers). This path
# exercises the EXACT pipeline a full codec deployment runs — real byte
# parsing of real container formats inside the Arrow batch loop — so
# swapping in PIL/pyav for png/mp4 is adding `elif` branches, not
# plumbing. Generation is deterministic (hash-chained samples/pixels), so
# decode round-trips are exact-value testable.

REAL_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("mean_level", FloatType()),
    ]
)


def _det_bytes(seed: str, n: int) -> bytes:
    """n deterministic bytes from a chained md5 stream keyed on seed."""
    out = bytearray()
    h = hashlib.md5(seed.encode()).digest()
    while len(out) < n:
        out.extend(h)
        h = hashlib.md5(h).digest()
    return bytes(out[:n])


def _wav_bytes(seed: int, n_samples: int, rate: int) -> bytes:
    """A real RIFF/WAVE file: mono PCM16, deterministic samples."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(_det_bytes(f"wav:{seed}", 2 * n_samples))
    return buf.getvalue()


def _bmp_bytes(seed: int, width: int, height: int) -> bytes:
    """A real uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB,
    4-byte-aligned rows), deterministic pixels."""
    import struct

    row = width * 3
    stride = row + (4 - row % 4) % 4
    img = _det_bytes(f"bmp:{seed}", stride * height)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(img), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(img), 2835, 2835, 0, 0
    )
    return header + dib + img


def _png_filter_row(
    ft: int, cur: bytes, prev: bytes, bpp: int = 3
) -> bytes:
    """Apply PNG scanline filter ``ft`` (encode direction) to raw pixel
    bytes ``cur`` given the prior reconstructed row ``prev`` (``bpp``
    bytes per pixel: 3 for RGB, 1 for grayscale)."""
    n = len(cur)
    if ft == 0:  # None
        return cur
    out = bytearray(n)
    for i in range(n):
        a = cur[i - bpp] if i >= bpp else 0  # left
        b = prev[i]  # up
        c = prev[i - bpp] if i >= bpp else 0  # up-left
        if ft == 1:  # Sub
            pred = a
        elif ft == 2:  # Up
            pred = b
        elif ft == 3:  # Average
            pred = (a + b) // 2
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out[i] = (cur[i] - pred) & 0xFF
    return bytes(out)


def _png_bytes(
    seed: int, width: int, height: int, grayscale: bool = False
) -> bytes:
    """A real non-interlaced 8-bit PNG (color type 2 RGB, or color type
    0 grayscale): zlib-deflated IDAT, CRC-correct chunks, and — so the
    decoder's filter reconstruction is actually exercised — each
    scanline encoded with filter ``row % 5`` (None/Sub/Up/Average/Paeth
    in rotation), deterministic pixels."""
    import struct
    import zlib

    bpp = 1 if grayscale else 3
    color_type = 0 if grayscale else 2
    stride = width * bpp
    raw = _det_bytes(f"png:{seed}", stride * height)
    scanlines = bytearray()
    prev = bytes(stride)
    for r in range(height):
        cur = raw[r * stride : (r + 1) * stride]
        ft = r % 5
        scanlines.append(ft)
        scanlines.extend(_png_filter_row(ft, cur, prev, bpp))
        prev = cur

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scanlines)))
        + chunk(b"IEND", b"")
    )


def real_media_table(
    spark: SparkSession,
    n: int = 64,
    formats: tuple[str, ...] = ("bmp", "wav"),
) -> DataFrame:
    """Deterministic table of REAL media files (format cycles with
    ``media_id % len(formats)``; the default keeps the original
    bmp-on-even / wav-on-odd layout), generated inside the Arrow batch
    loop off ``spark.range`` — the same executor-side generation shape a
    backfill of encoded media uses. Each item's dimensions/rate are
    arithmetic in media_id (bmp: 4+id%13 x 3+id%7; wav: 50+id%101
    samples @ 8000+100*(id%5) Hz; png: 3+id%9 x 2+id%6) so an external
    oracle can restate them without parsing the containers."""

    fmts = tuple(formats)
    unknown = set(fmts) - {"bmp", "wav", "png"}
    if unknown:
        raise ValueError(f"no real encoder for formats {sorted(unknown)}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                "media_id": [],
                "kind": [],
                "payload": [],
                "meta": [],
            }
            for mid in pdf["id"]:
                mid = int(mid)
                fmt = fmts[mid % len(fmts)]
                if fmt == "bmp":
                    w, h = 4 + mid % 13, 3 + mid % 7
                    payload = _bmp_bytes(mid, w, h)
                    kind, meta = "image", {
                        "width": w,
                        "height": h,
                        "sample_rate": None,
                        "n_frames": None,
                        "format": "bmp",
                    }
                elif fmt == "wav":
                    ns, rate = 50 + mid % 101, 8000 + 100 * (mid % 5)
                    payload = _wav_bytes(mid, ns, rate)
                    kind, meta = "audio", {
                        "width": None,
                        "height": None,
                        "sample_rate": rate,
                        "n_frames": ns,
                        "format": "wav",
                    }
                else:
                    w, h = 3 + mid % 9, 2 + mid % 6
                    payload = _png_bytes(mid, w, h)
                    kind, meta = "image", {
                        "width": w,
                        "height": h,
                        "sample_rate": None,
                        "n_frames": None,
                        "format": "png",
                    }
                rows["media_id"].append(mid)
                rows["kind"].append(kind)
                rows["payload"].append(payload)
                rows["meta"].append(meta)
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(batches, MEDIA_SCHEMA)


def _decode_wav(payload: bytes) -> tuple[int, int, int, int, float]:
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, nch, sw = w.getframerate(), w.getnchannels(), w.getsampwidth()
        n = w.getnframes()
        raw = w.readframes(n)
    if sw != 2:
        raise ValueError(f"only PCM16 wav supported, got sampwidth={sw}")
    samples = struct.unpack(f"<{n * nch}h", raw)
    mean = (
        float(sum(abs(s) for s in samples)) / (len(samples) * 32768.0)
        if samples
        else 0.0
    )
    return None, None, rate, n, mean  # type: ignore[return-value]


def _decode_bmp(payload: bytes) -> tuple[int, int, int, int, float]:
    import struct

    magic, _, _, _, data_off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size, width, height, _, bpp = struct.unpack_from(
        "<IiiHH", payload, 14
    )
    # fail-loud contract: a BITMAPCOREHEADER (hdr_size=12, 16-bit dims at
    # other offsets) or an RLE-compressed stream would pass the magic
    # check and silently decode garbage — require the BITMAPINFOHEADER
    # layout this unpack assumed and uncompressed BI_RGB pixel data
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
    row = width * 3
    stride = row + (4 - row % 4) % 4
    levels = []
    for r in range(abs(height)):
        start = data_off + r * stride
        levels.extend(payload[start : start + row])
    mean = float(sum(levels)) / (len(levels) * 255.0) if levels else 0.0
    return width, abs(height), None, None, mean  # type: ignore[return-value]


def _decode_png(payload: bytes) -> tuple[int, int, int, int, float]:
    """Pure-stdlib PNG decode (zlib + chunk walk) for non-interlaced
    8-bit RGB (color type 2) and grayscale (color type 0): walks the
    chunk stream CRC-checked, inflates the concatenated IDATs,
    reconstructs all five scanline filters at the format's
    bytes-per-pixel, and returns dimensions + mean channel level.
    Anything outside those shapes (palette, alpha, 16-bit, interlaced)
    fails loudly — those branches need PIL."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, width, height, bpp = 8, None, None, 3
    idat = bytearray()
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8 or color not in (0, 2):
                raise ValueError(
                    f"only 8-bit RGB (color type 2) or grayscale (color "
                    f"type 0) PNG supported, got depth={depth} "
                    f"color_type={color}"
                )
            bpp = 1 if color == 0 else 3
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            if comp != 0 or filt != 0:
                raise ValueError("non-standard PNG compression/filter method")
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline stream length mismatch")
    total = 0
    prev = bytes(stride)
    for r in range(height):
        ft = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ft > 4:
            raise ValueError(f"unknown PNG filter type {ft}")
        if ft:  # reconstruct: add the predictor back (inverse of encode)
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a
                        if pa <= pb and pa <= pc
                        else (b if pb <= pc else c)
                    )
                line[i] = (line[i] + pred) & 0xFF
        total += sum(line)
        prev = bytes(line)
    n_bytes = stride * height
    mean = float(total) / (n_bytes * 255.0) if n_bytes else 0.0
    return width, height, None, None, mean  # type: ignore[return-value]


def decode_media_real(media: DataFrame) -> DataFrame:
    """REAL decode of wav/bmp/png payloads (stdlib codecs, Arrow-batched).

    Output: one row per media item with the container-parsed dimensions
    (width/height for images, sample_rate/n_samples for audio) and
    ``mean_level`` in [0, 1] (mean |PCM16 amplitude| / 32768 for audio,
    mean channel byte / 255 for images). Unsupported formats raise
    ValueError — jpeg/mp4 need PIL/pyav, which slot in here as
    additional format branches."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k.name: [] for k in REAL_DECODED_SCHEMA.fields}
            for mid, kind, meta, pl in zip(
                pdf["media_id"], pdf["kind"], pdf["meta"], pdf["payload"]
            ):
                fmt = None if meta is None else meta["format"]
                payload = bytes(pl)
                if fmt == "wav":
                    w, h, rate, ns, mean = _decode_wav(payload)
                elif fmt == "bmp":
                    w, h, rate, ns, mean = _decode_bmp(payload)
                elif fmt == "png":
                    w, h, rate, ns, mean = _decode_png(payload)
                else:
                    raise ValueError(
                        f"unsupported format {fmt!r}: real decode handles "
                        "wav/bmp/png (stdlib); jpeg/mp4 need PIL/pyav"
                    )
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["sample_rate"].append(rate)
                out["n_samples"].append(ns)
                out["mean_level"].append(mean)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, REAL_DECODED_SCHEMA)
