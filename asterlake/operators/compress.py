"""Compression-ratio quality signal (beyond-parity: the zlib/zstd
compressibility heuristic web-scale corpus filters run — CCNet and
RefinedWeb drop documents whose bytes compress too well, because
near-constant/boilerplate/spam text has pathologically low entropy).

The only Python in the hot path is Arrow-batched ``mapInPandas`` over
the stdlib ``zlib`` (deflate level pinned — the ratio is a model input,
so the compressor version is part of the recipe the way a tokenizer
is). Row-local: no shuffle, no driver involvement, linear in executors
— at 100 TB this is one map-only pass whose cost is the deflate itself.

Determinism contract: ``zlib.compress(data, level)`` is a pure function
of (bytes, level) for a given zlib build, so per-doc outputs are
partitioning-independent (pinned in tests/test_compress.py against
direct Python zlib, the SAME library the executors load). Cross-engine,
DuckDB has no deflate — so the DRIVER-gateable surface is the
in-plan-bound shape (the q_sketch_distinct pattern): the query emits
the exact byte length (oracle: octet_length) plus a boolean the oracle
asserts TRUE — ``comp_len`` within deflate's hard bounds
(0 < comp_len <= raw_len + 5 * ceil(raw_len / 16383) + 6, the stored-
block worst case) — while the raw ratio stays a local-differential
concern."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["compression_signal", "deflate_bound"]

MILLI = 1000


def deflate_bound(raw_len_col) -> F.Column:
    """zlib's worst-case output for ``raw_len`` input bytes: stored
    (uncompressed) blocks add 5 bytes per 16383-byte block plus the
    2-byte header and 4-byte checksum — an exact integer bound any
    engine can restate."""
    n = F.col(raw_len_col) if isinstance(raw_len_col, str) else raw_len_col
    blocks = F.floor((n + F.lit(16382)) / F.lit(16383)).cast("bigint")
    return (n + F.lit(5).cast("bigint") * blocks + F.lit(6)).cast("bigint")


def compression_signal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document deflate statistics:
    ``(id_col, raw_len bigint, comp_len bigint, ratio_milli bigint)``
    with ``ratio_milli = floor(1000 * comp_len / raw_len)`` (0 for
    empty text — nothing to judge). Arrow-batched, row-local."""
    import zlib

    out_schema = (
        f"{id_col} long, raw_len long, comp_len long, ratio_milli long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raws: list[int] = []
            comps: list[int] = []
            ratios: list[int] = []
            for t in pdf[text_col]:
                data = ("" if t is None else t).encode("utf-8")
                raw = len(data)
                comp = len(zlib.compress(data, level)) if raw else 0
                raws.append(raw)
                comps.append(comp)
                ratios.append(MILLI * comp // raw if raw else 0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "raw_len": raws,
                    "comp_len": comps,
                    "ratio_milli": ratios,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, out_schema)
