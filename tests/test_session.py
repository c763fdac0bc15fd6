from pyspark.sql import functions as F


def test_session_smoke(spark):
    assert spark.range(10).agg(F.sum("id").alias("s")).collect()[0]["s"] == 45


def test_session_utc_timezone(spark):
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_reads_testdata(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert df.count() == 6000
    assert "l_orderkey" in df.columns
