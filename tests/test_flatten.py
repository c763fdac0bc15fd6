"""Golden tests for bronze -> silver flatten (reference parity:
src/etl/bronze_to_silver.py:38-90; FIXTURES.md A2 schema)."""

from __future__ import annotations

import datetime as dt

import pytest

from asterlake.operators.flatten import flatten_feed
from asterlake.schemas import SILVER_SCHEMA
from asterlake.sources.bronze import read_bronze, write_bronze_document
from tests.fixtures_neows import (
    N_ALL_APPROACH_ROWS,
    N_ASTEROID_ROWS,
    feed_document,
)

BATCH_ID = 1760000000
PROC_TIME = dt.datetime(2025, 10, 10, 1, 30, 0)


@pytest.fixture(scope="module")
def bronze(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bronze")
    write_bronze_document(str(root), "2025-10-10", feed_document())
    return read_bronze(spark, str(root))


@pytest.fixture(scope="module")
def silver(bronze):
    return flatten_feed(bronze, batch_id=BATCH_ID, processing_time=PROC_TIME).cache()


def test_schema_matches_fixture_contract(silver):
    # names + types must match FIXTURES.md A2; nullability is metadata
    # (literal audit columns come out non-nullable, which is fine)
    got = [(f.name, f.dataType) for f in silver.schema.fields]
    want = [(f.name, f.dataType) for f in SILVER_SCHEMA.fields]
    assert got == want


def test_row_count_is_one_per_asteroid_per_feed_date(silver):
    assert silver.count() == N_ASTEROID_ROWS


def test_all_approaches_grain(bronze):
    df = flatten_feed(bronze, all_approaches=True, batch_id=BATCH_ID, processing_time=PROC_TIME)
    assert df.count() == N_ALL_APPROACH_ROWS


def test_values_for_simple_asteroid(silver):
    row = silver.filter("asteroid_id = '2153306'").collect()[0]
    assert row.asteroid_name == "153306 (2001 JL1)"
    assert row.magnitude == 17.6
    assert row.is_hazardous is False
    assert row.diameter_min_km == 0.1
    assert row.approach_date == dt.date(2025, 10, 10)
    assert row.approach_datetime == dt.datetime(2025, 10, 10, 18, 30)
    assert row.approaching_body == "Earth"
    assert row.velocity_km_s == 13.5
    assert row.miss_distance_km == 7480000.5
    assert row._source_system == "NeoWs API"
    assert row._etl_batch_id == BATCH_ID
    assert row._processing_date == dt.date(2025, 10, 10)


def test_empty_close_approach_yields_nulls(silver):
    row = silver.filter("asteroid_id = '2465633'").collect()[0]
    assert row.approach_date is None
    assert row.approach_datetime is None
    assert row.approaching_body is None
    assert row.velocity_km_s is None


def test_non_numeric_velocity_coerces_to_null(silver):
    # pandas-twin semantics: to_numeric(errors="coerce")
    row = silver.filter("asteroid_id = '3426410'").collect()[0]
    assert row.velocity_km_s is None
    assert row.velocity_km_h == 48600.0  # sibling field still parses
    assert row.approach_date is None     # null close_approach_date
    assert row.approach_datetime == dt.datetime(2025, 10, 10, 4, 12)


def test_timestamp_format_yyyy_mmm_dd(silver):
    # 'yyyy-MMM-dd HH:mm' month-abbreviation parsing (reference :66)
    row = silver.filter("asteroid_id = '54016476'").collect()[0]
    assert row.approach_datetime == dt.datetime(2025, 10, 11, 2, 0)


def test_multiple_feed_dates_both_exploded(silver):
    # the reference can only read one hardcoded date per run; the map
    # explode covers the whole document
    names = {r.asteroid_id for r in silver.select("asteroid_id").collect()}
    assert "54016476" in names and "3726710" in names
