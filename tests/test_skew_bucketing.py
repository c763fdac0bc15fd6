"""Scale-toolkit tests: salted joins/aggregations are exact, bucketed
tables join and aggregate without exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asterlake.operators.skew import salted_aggregate, salted_join
from asterlake.plans.inspect import node_count, plan_string
from asterlake.sources.writers import write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a tail
    left = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame(
        [(1, "hot"), (1900, "cold"), (1950, "cold2")], "k long, label string"
    )
    return left, right


def test_salted_join_equals_plain_join(spark, skewed):
    left, right = skewed
    got = salted_join(left, right, "k", buckets=4).select("k", "payload", "label")
    want = left.join(right, "k").select("k", "payload", "label")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # left rows with the hot key spread over multiple salt buckets
    l_salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64("payload"), F.lit(4)).cast("int")
    )
    n_buckets_used = (
        l_salted.filter(F.col("k") == 1).select("_salt").distinct().count()
    )
    assert n_buckets_used > 1


def test_salted_join_left_outer(spark, skewed):
    left, right = skewed
    got = salted_join(left, right, "k", buckets=4, how="left")
    assert got.count() == 2000  # every left row survives
    assert got.filter(F.col("label").isNull()).count() == 2000 - 1800 - 2


def test_salted_aggregate_equals_plain(spark, skewed):
    left, _ = skewed
    got = salted_aggregate(
        left,
        ["k"],
        {
            "n": ("payload", "count"),
            "total": ("payload", "sum"),
            "lo": ("payload", "min"),
            "hi": ("payload", "max"),
        },
        buckets=4,
    )
    want = left.groupBy("k").agg(
        F.count("payload").alias("n"),
        F.sum("payload").alias("total"),
        F.min("payload").alias("lo"),
        F.max("payload").alias("hi"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_aggregate_rejects_unknown_fn(spark, skewed):
    left, _ = skewed
    with pytest.raises(ValueError):
        salted_aggregate(left, ["k"], {"bad": ("payload", "avg")})


def test_bucketed_join_has_no_shuffle(spark):
    # a run killed mid-test (e.g. the harness dying between saveAsTable
    # and the finally-drop) leaves the warehouse DIRECTORY behind with no
    # catalog entry; the next overwrite then throws LOCATION_ALREADY_EXISTS.
    # Clear both table and any dangling location up front.
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_li_bucketed", "t_o_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "t_li_bucketed", ["l_orderkey"], 8, ["l_orderkey"])
    write_bucketed(o, "t_o_bucketed", ["o_orderkey"], 8, ["o_orderkey"])
    try:
        a, b = spark.table("t_li_bucketed"), spark.table("t_o_bucketed")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, a.l_orderkey == b.o_orderkey)
            plan = plan_string(joined)
            # co-located: sort-merge join straight off the buckets
            assert node_count(plan, "Exchange") == 0, plan.split("\n\n", 1)[0]
            # and the bucket key aggregation needs no shuffle either
            agg_plan = plan_string(a.groupBy("l_orderkey").count())
            assert node_count(agg_plan, "Exchange") == 0
            # correctness unchanged vs plain parquet join
            assert joined.count() == spark.read.parquet(
                f"{SF}/lineitem.parquet"
            ).join(
                spark.read.parquet(f"{SF}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            ).count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_o_bucketed")


def test_salted_join_rejects_outer_right_variants(spark, skewed):
    left, right = skewed
    import pytest as _pytest

    for how in ("right", "full", "outer", "full_outer", "right_outer"):
        with _pytest.raises(ValueError, match="salted_join is exact only"):
            salted_join(left, right, "k", buckets=4, how=how)
