"""Silver -> gold star schema (Kimball: 3 dims + 1 fact).

Re-expresses reference ``src/etl/silver_to_gold.py:35-79`` with the fixes
SURVEY.md §7 calls for, preserving the shapes in FIXTURES.md A3:

- **dim_asteroid** — 11 descriptive columns, one row per ``asteroid_id``.
  Reference dedups with ``dropDuplicates(["asteroid_id"])`` (:148), an
  *arbitrary*-survivor hash aggregate; we pick the survivor deterministically
  (max over the full ordering) so results are stable run-to-run — same
  contract (one arbitrary-but-valid row per key), reproducible outcome.
- **dim_date** — smart key ``date_id = int(yyyyMMdd)`` (:151) + calendar
  parts (:154-157). Deduping on date_id is inherently deterministic (all
  survivors identical).
- **dim_celestial_body** — reference assigns ``monotonically_increasing_id``
  *before* deduping (:159-162), keeping an arbitrary id per body; we use
  ``xxhash64(approaching_body)`` — deterministic, no window, no shuffle.
- **fact_asteroid_approach** — left joins to dim_date/dim_celestial_body
  (:164-166; nulls preserved for unknown dates/bodies), surrogate
  ``approach_event_id`` as a hash of the event's natural identity instead of
  ``monotonically_increasing_id`` (:168).

Scale: dims are tiny relative to the fact (O(bodies)=10s, O(dates)=1000s,
O(asteroids)«O(approaches)), so both fact joins are **broadcast** —
explicitly hinted, no shuffle of the fact side at any scale. The dim
aggregations shuffle only the dim projections (partial aggregation map-side
first). Callers building all four tables should ``.persist()`` the silver
DataFrame before the fan-out (see pipeline.py) — the reference recomputes
the silver scan and joins four times, once per write (SURVEY §3.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from asterlake.functions.keys import surrogate_key

_DIM_ASTEROID_COLS = [
    "asteroid_id",
    "neo_id",
    "asteroid_name",
    "magnitude",
    "is_hazardous",
    "is_sentry",
    "diameter_min_km",
    "diameter_max_km",
    "diameter_min_m",
    "diameter_max_m",
    "jpl_url",
]


def build_dim_asteroid(silver: DataFrame) -> DataFrame:
    """One row per asteroid_id (reference src/etl/silver_to_gold.py:35-47).

    Deterministic survivor: max_by over the remaining columns packed as a
    struct — a single hash aggregate (same physical shape as dropDuplicates'
    first-per-key), no window, no sort.
    """
    rest = [c for c in _DIM_ASTEROID_COLS if c != "asteroid_id"]
    packed = F.struct(*[F.col(c) for c in rest])
    agg = silver.groupBy("asteroid_id").agg(F.max(packed).alias("_row"))
    return agg.select("asteroid_id", *[F.col(f"_row.{c}").alias(c) for c in rest])


def build_dim_date(silver: DataFrame) -> DataFrame:
    """date_id smart key + calendar parts (reference :150-157).

    The reference keeps the null-date row (date_id null) produced by silver
    rows whose close_approach_date failed to parse; we preserve that.
    """
    return (
        silver.select(
            F.date_format("approach_date", "yyyyMMdd").cast("int").alias("date_id"),
            "approach_date",
        )
        .dropDuplicates(["date_id"])
        .withColumn("year", F.year("approach_date"))
        .withColumn("month", F.month("approach_date"))
        .withColumn("day", F.dayofmonth("approach_date"))
        .withColumn("weekday", F.date_format("approach_date", "E"))
    )


def build_dim_celestial_body(silver: DataFrame) -> DataFrame:
    """One row per approaching_body with a deterministic hash id
    (reference :159-162 uses monotonically_increasing_id pre-dedup)."""
    return silver.select("approaching_body").distinct().select(
        surrogate_key("approaching_body").alias("celestial_body_id"),
        "approaching_body",
    )


def build_fact(
    silver: DataFrame,
    dim_date: DataFrame,
    dim_celestial_body: DataFrame,
) -> DataFrame:
    """Fact at (asteroid, approach-event) grain (reference :164-180).

    Left joins keep every silver row (unknown date/body -> null FK). Both
    dims are broadcast — the fact side never shuffles, which is the plan
    you want when the fact is 100 TB and the dims are kilobytes.
    """
    dd = F.broadcast(dim_date.select("date_id", "approach_date"))
    db = F.broadcast(dim_celestial_body)
    return (
        silver.join(dd, on="approach_date", how="left")
        .join(db, on="approaching_body", how="left")
        .select(
            # full natural identity of the event: byte-identical duplicate
            # reports hash to the same id (idempotent), distinct events never
            # collide in practice (64-bit space)
            surrogate_key(
                "asteroid_id",
                "approach_datetime",
                "approaching_body",
                "velocity_km_s",
                "miss_distance_km",
                "_etl_batch_id",
            ).alias("approach_event_id"),
            "asteroid_id",
            "date_id",
            "celestial_body_id",
            "approach_datetime",
            "velocity_km_s",
            "velocity_km_h",
            "miss_distance_km",
            "miss_distance_au",
            "miss_distance_lunar",
            "_etl_batch_id",
            "_processing_timestamp",
        )
    )


def build_star(silver: DataFrame) -> dict[str, DataFrame]:
    """All four gold tables from one silver DataFrame.

    Caller owns persisting `silver` across the four downstream actions
    (pipeline.py does); building the plans is lazy and free.
    """
    dim_asteroid = build_dim_asteroid(silver)
    dim_date = build_dim_date(silver)
    dim_celestial_body = build_dim_celestial_body(silver)
    fact = build_fact(silver, dim_date, dim_celestial_body)
    return {
        "dim_asteroid": dim_asteroid,
        "dim_date": dim_date,
        "dim_celestial_body": dim_celestial_body,
        "fact_asteroid_approach": fact,
    }
