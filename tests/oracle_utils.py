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


def assert_matches_oracle(spark_df, con, oracle_sql: str, name: str = "") -> None:
    got = canonical(spark_df.toPandas())
    want = canonical(con.execute(oracle_sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
