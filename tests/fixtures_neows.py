"""Deterministic NeoWs feed fixture (FIXTURES.md A1) with every edge case:

- asteroid with EMPTY close_approach_data  -> [0] access yields nulls
- non-numeric velocity string              -> try_cast -> null
- null close_approach_date                 -> null approach_date, null date_id FK
- two asteroids sharing an id              -> dedup survivor in dim_asteroid
- a non-Earth orbiting body                -> second dim_celestial_body row
- multiple dates in near_earth_objects     -> map-explode generality
"""

from __future__ import annotations


def _approach(
    date="2025-10-10",
    full="2025-Oct-10 18:30",
    body="Earth",
    v_kms="13.5", v_kmh="48600.0",
    d_km="7480000.5", d_au="0.05", d_lunar="19.45",
):
    return {
        "close_approach_date": date,
        "close_approach_date_full": full,
        "epoch_date_close_approach": 1760121000000,
        "orbiting_body": body,
        "relative_velocity": {
            "kilometers_per_second": v_kms,
            "kilometers_per_hour": v_kmh,
            "miles_per_hour": "30200.1",
        },
        "miss_distance": {
            "astronomical": d_au,
            "lunar": d_lunar,
            "kilometers": d_km,
            "miles": "4648739.1",
        },
    }


def _asteroid(aid, name, magnitude=22.1, hazardous=False, approaches=None):
    return {
        "id": aid,
        "neo_reference_id": aid,
        "name": name,
        "nasa_jpl_url": f"http://ssd.jpl.nasa.gov/sbdb.cgi?sstr={aid}",
        "absolute_magnitude_h": magnitude,
        "estimated_diameter": {
            "kilometers": {
                "estimated_diameter_min": 0.1,
                "estimated_diameter_max": 0.3,
            },
            "meters": {
                "estimated_diameter_min": 100.0,
                "estimated_diameter_max": 300.0,
            },
            "miles": {
                "estimated_diameter_min": 0.06,
                "estimated_diameter_max": 0.18,
            },
            "feet": {
                "estimated_diameter_min": 328.0,
                "estimated_diameter_max": 984.0,
            },
        },
        "is_potentially_hazardous_asteroid": hazardous,
        "is_sentry_object": False,
        "close_approach_data": approaches if approaches is not None else [_approach()],
    }


def feed_document() -> dict:
    """Two feed dates, six asteroids, all edge cases above."""
    day1 = "2025-10-10"
    day2 = "2025-10-11"
    asteroids_day1 = [
        _asteroid("3726710", "(2015 RC)", magnitude=24.3, hazardous=True),
        # empty close_approach_data -> [0] is null
        _asteroid("2465633", "465633 (2009 JR5)", approaches=[]),
        # non-numeric velocity + null approach date
        _asteroid(
            "3426410",
            "(2008 QV11)",
            approaches=[
                _approach(date=None, full="2025-Oct-10 04:12", v_kms="not-a-number")
            ],
        ),
        # duplicate id (same asteroid reported twice), non-Earth body
        _asteroid(
            "3726710",
            "(2015 RC)",
            magnitude=24.3,
            hazardous=True,
            approaches=[_approach(body="Merc", v_kms="21.0")],
        ),
    ]
    asteroids_day2 = [
        _asteroid(
            "54016476",
            "(2020 HO3)",
            magnitude=19.9,
            approaches=[
                _approach(date=day2, full="2025-Oct-11 02:00", v_kms="8.25"),
                _approach(date="2025-12-01", full="2025-Dec-01 10:00", v_kms="9.5"),
            ],
        ),
        _asteroid("2153306", "153306 (2001 JL1)", magnitude=17.6),
    ]
    return {
        "element_count": len(asteroids_day1) + len(asteroids_day2),
        "links": {
            "next": "http://api.nasa.gov/neo/rest/v1/feed?start_date=2025-10-12",
            "prev": "http://api.nasa.gov/neo/rest/v1/feed?start_date=2025-10-08",
            "self": "http://api.nasa.gov/neo/rest/v1/feed?start_date=2025-10-10",
        },
        "near_earth_objects": {day1: asteroids_day1, day2: asteroids_day2},
    }


N_ASTEROID_ROWS = 6          # rows after map+array explode (parity grain)
N_DISTINCT_ASTEROIDS = 5     # 3726710 appears twice
N_ALL_APPROACH_ROWS = 7      # day2 first asteroid has 2 approaches; empty list still yields 1 null row
