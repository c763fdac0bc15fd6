"""Differential-testing utilities mirroring the driver's correctness gate:
run the Spark query and the DuckDB oracle on the same parquet, canonicalize
(sort columns by name, then rows), compare values exactly."""

from __future__ import annotations

import duckdb
import pandas as pd

from asterlake.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canonical(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    out = pdf[cols].copy()
    # normalize timestamp resolutions (spark: us, duckdb: us/ns) before compare
    for c in cols:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
        elif out[c].dtype == object and out[c].map(
            lambda v: v is None or hasattr(v, "toordinal"), na_action="ignore"
        ).all():
            # Spark DATE -> python datetime.date objects; align with duckdb
            converted = pd.to_datetime(out[c], errors="coerce")
            if converted.notna().sum() == out[c].notna().sum():
                out[c] = converted.astype("datetime64[us]")
    if len(out):
        out = out.sort_values(by=cols, kind="mergesort", na_position="last")
    return out.reset_index(drop=True)


def _kind(series: pd.Series) -> str:
    """Coarse dtype family used to reproduce the driver's formatted-value
    hash semantics: the driver stringifies values after sorting, so int64
    ``1234`` vs float64 ``1234.0`` hash DIFFERENTLY even when every value
    is equal (round-3 verdict: DuckDB ``SUM(BIGINT) OVER`` returns HUGEINT
    -> pandas float64 -> red ``hash_match`` with zero value diffs). Width
    within a family (int32 vs int64) formats identically and is fine."""
    k = series.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    if k == "O":
        sample = next((v for v in series if v is not None), None)
        if sample is None:
            return "null"
        if isinstance(sample, bool):
            return "bool"
        if isinstance(sample, int):
            return "int"
        if isinstance(sample, float):
            return "float"
        if isinstance(sample, str):
            return "str"
        if hasattr(sample, "as_integer_ratio") or type(sample).__name__ == "Decimal":
            return "decimal"
        if hasattr(sample, "toordinal"):
            return "date"
        if isinstance(sample, (list, tuple)) or hasattr(sample, "__len__"):
            return "array"
        return type(sample).__name__
    return k


def assert_matches_oracle(spark_df, con, oracle_sql: str, name: str = "") -> None:
    got = canonical(spark_df.toPandas())
    want = canonical(con.execute(oracle_sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    # Driver-hash parity: a dtype-family skew (int vs float) changes the
    # driver's formatted values even when compare-by-value passes below.
    skew = {
        c: (gk, wk)
        for c in got.columns
        if (gk := _kind(got[c])) != (wk := _kind(want[c]))
        and "null" not in (gk, wk)
    }
    assert not skew, (
        f"{name}: dtype-family skew (spark, oracle) {skew} — the driver's "
        "formatted-value hash would mismatch; cast the oracle (or query) "
        "so both sides agree"
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
