"""Boundary robustness: every declared query must execute (returning zero
rows) against EMPTY tables with the production schemas — day-one deploys,
fully-filtered partitions, and fresh tenants all present exactly this
input. The one allowed exception is q_embedding_pca, whose operator
contract explicitly rejects an empty vector set (a covariance of nothing
has no principal axes)."""

from __future__ import annotations

import os

import pytest

from asterlake.queries import QUERIES

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

EXPECTED_TO_RAISE = {"q_embedding_pca"}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        df.limit(0).write.mode("overwrite").parquet(
            str(dst / f"{t}.parquet")
        )
    return str(dst)


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    fails = []
    for name, qd in QUERIES.items():
        try:
            qd.spark(spark, empty_sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as ex:  # noqa: BLE001 - collecting the sweep
            if name not in EXPECTED_TO_RAISE:
                fails.append(f"{name}: {type(ex).__name__}: {ex}")
    assert not fails, "\n".join(fails)


def test_pca_empty_contract(spark, empty_sf_dir):
    with pytest.raises(ValueError, match="at least one vector"):
        QUERIES["q_embedding_pca"].spark(spark, empty_sf_dir)
