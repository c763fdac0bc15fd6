"""Bronze layer I/O: raw NeoWs JSON documents.

Reference behavior: one pretty-printed JSON file per feed day at
``bronze/JSON/nasa-asteroid-data-{YYYY-MM-DD}.json``
(``src/etl/bronze_ingest.py:43-49``), read back with multiline JSON +
schema inference (``src/etl/bronze_to_silver.py:34``).

Here reads take the explicit BRONZE_FEED_SCHEMA (no inference scan, map-typed
``near_earth_objects``) and accept a directory or glob — a whole backfill of
daily documents is one DataFrame, one plan.
"""

from __future__ import annotations

import json
import os
from datetime import date

from pyspark.sql import DataFrame, SparkSession

from asterlake.schemas import BRONZE_FEED_SCHEMA

BRONZE_FILE_PATTERN = "nasa-asteroid-data-{date}.json"


def bronze_path(root: str, feed_date: date | str) -> str:
    d = feed_date.isoformat() if isinstance(feed_date, date) else feed_date
    return os.path.join(root, BRONZE_FILE_PATTERN.format(date=d))


def write_bronze_document(root: str, feed_date: date | str, document: dict) -> str:
    """Persist one verbatim feed document (reference bronze_ingest.py:43-49
    does the same via s3.put_object with indent=4)."""
    os.makedirs(root, exist_ok=True)
    path = bronze_path(root, feed_date)
    with open(path, "w") as f:
        json.dump(document, f, indent=4)
    return path


def read_bronze(spark: SparkSession, path: str) -> DataFrame:
    """Read bronze JSON document(s) with the explicit feed schema.

    `path` may be a single file, a directory, or a glob — every matched
    document becomes one row. multiline=true because each document is one
    pretty-printed JSON object, not JSON-lines (reference bronze_ingest
    writes indent=4).
    """
    return (
        spark.read.schema(BRONZE_FEED_SCHEMA)
        .option("multiline", "true")
        .json(path)
    )
