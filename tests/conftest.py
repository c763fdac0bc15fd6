"""Shared test fixtures: one SparkSession per test session, NeoWs fixtures.

The session is the same build used in production (asterlake.session) so the
tests exercise the real configs (UTC timezone, AQE, Arrow).
"""

from __future__ import annotations

import pytest

from asterlake.session import build_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="asterlake-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
