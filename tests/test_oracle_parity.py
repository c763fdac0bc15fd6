"""Differential test vs the DuckDB oracle for every declared query — the
local twin of the driver's CORRECTNESS gate (sf0.01, hash-equivalent exact
value comparison)."""

from __future__ import annotations

import os

import pytest

from asterlake.queries import QUERIES
from tests.oracle_utils import assert_matches_oracle, duck_connection

# the all-declared-queries DuckDB parity sweep — excluded from the
# -m "not slow" inner loop (r9 verdict ask #3), and since r13 ALSO its
# own `parity` tier (r12 verdict ask #5: the unfiltered run crossed
# 45 min — 831 tests / 45:12 measured — so the end-of-round snapshot
# gate runs as two sessions that together cover everything:
#   python -m pytest tests/ -m "not parity"   (all unit/differential)
#   python -m pytest tests/ -m parity         (the all-queries sweep)
# each stays re-runnable twice per round; the combined result is cited
# in the snapshot commit)
pytestmark = [pytest.mark.slow, pytest.mark.parity]

PARITY_SF_DIR = os.environ.get("ASTERLAKE_PARITY_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def con():
    c = duck_connection(PARITY_SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    qd = QUERIES[name]
    if qd.oracle is None:
        df = qd.spark(spark, PARITY_SF_DIR)
        assert df.count() >= 0  # rows-only smoke, like the driver
        return
    assert_matches_oracle(qd.spark(spark, PARITY_SF_DIR), con, qd.oracle, name)
