"""Pins the dtype-strictness of the local parity harness.

Round-3 driver red row: ``q_pack_sequences`` had ``hash_match: false`` with
zero value differences because DuckDB's ``SUM(BIGINT) OVER`` returns HUGEINT,
which lands in pandas as float64 (``1234.0``) while Spark returns int64
(``1234``) — the driver hashes formatted values, so the row went red while the
old ``check_dtype=False`` local compare stayed green. These tests prove the
harness now fails FIRST, locally, on that exact class.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_utils import _kind, assert_matches_oracle


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW t AS SELECT * FROM (VALUES (1, 10), (2, 20)) v(k, n)"
    )
    yield c
    c.close()


def test_hugeint_window_sum_skew_is_caught(spark, con):
    """DuckDB HUGEINT -> float64 vs Spark int64: equal values, red driver
    hash — must now raise locally."""
    sdf = spark.createDataFrame([(1, 10), (2, 30)], "k int, running long")
    # SUM(BIGINT) OVER (...) is HUGEINT in DuckDB -> pandas float64
    hugeint_sql = (
        "SELECT k, SUM(CAST(n AS BIGINT)) OVER (ORDER BY k) AS running FROM t"
    )
    with pytest.raises(AssertionError, match="dtype-family skew"):
        assert_matches_oracle(sdf, con, hugeint_sql, "hugeint_regression")
    # and the one-line CAST fix makes the same comparison green
    assert_matches_oracle(
        sdf,
        con,
        "SELECT k, CAST(SUM(CAST(n AS BIGINT)) OVER (ORDER BY k) AS BIGINT)"
        " AS running FROM t",
        "hugeint_fixed",
    )


def test_kind_families():
    import datetime
    from decimal import Decimal

    import pandas as pd

    assert _kind(pd.Series([1, 2], dtype="int32")) == "int"
    assert _kind(pd.Series([1, 2], dtype="int64")) == "int"
    assert _kind(pd.Series([1.0, 2.0])) == "float"
    assert _kind(pd.Series([True, False])) == "bool"
    assert _kind(pd.Series(["a", None], dtype=object)) == "str"
    assert _kind(pd.Series([Decimal("1.5")], dtype=object)) == "decimal"
    assert _kind(pd.Series([datetime.date(2020, 1, 1)], dtype=object)) == "date"
    assert _kind(pd.Series([[1, 2]], dtype=object)) == "array"
    assert _kind(pd.Series([None, None], dtype=object)) == "null"
