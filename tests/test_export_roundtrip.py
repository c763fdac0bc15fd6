"""Export-format fidelity: parquet-resident tables must survive a round
trip through the text formats a lakehouse serves (CSV, JSONL) with zero
value drift — doubles via shortest-round-trip printing, timestamps via an
explicit microsecond format, dates as ISO. The discipline under test is
the OPTION SET (schema-on-read, explicit timestampFormat); default
inference would silently widen or truncate."""

from __future__ import annotations


TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _assert_same(a, b):
    assert a.schema == b.schema, (a.schema, b.schema)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_events_roundtrip_jsonl_and_csv(spark, tmp_path):
    from asterlake.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")

    j = str(tmp_path / "events_jsonl")
    ev.write.option("timestampFormat", TS_FMT).json(j)
    back_j = (
        spark.read.schema(ev.schema)
        .option("timestampFormat", TS_FMT)
        .json(j)
    )
    _assert_same(ev, back_j)

    c = str(tmp_path / "events_csv")
    ev.write.option("header", "true").option("timestampFormat", TS_FMT).csv(c)
    back_c = (
        spark.read.schema(ev.schema)
        .option("header", "true")
        .option("timestampFormat", TS_FMT)
        .csv(c)
    )
    _assert_same(ev, back_c)


def test_lineitem_roundtrip_csv_doubles_and_dates(spark):
    import tempfile

    li = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet"
    ).select("l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate",
             "l_returnflag")
    with tempfile.TemporaryDirectory() as d:
        li.write.option("header", "true").csv(d + "/li")
        back = (
            spark.read.schema(li.schema)
            .option("header", "true")
            .csv(d + "/li")
        )
        _assert_same(li, back)


def test_columnar_formats_roundtrip_orc_and_complex_types(spark, tmp_path):
    """ORC is the second columnar format Spark ships natively (the
    interchange target for Hive-era consumers); binary payloads, arrays,
    and timestamps must survive bit-for-bit — columnar formats carry the
    schema, so the discipline here is simply 'no silent coercion'."""
    from asterlake.tables import load_table

    for table, sort in [("events", "event_id"), ("documents", "doc_id"),
                        ("embeddings", "vec_id")]:
        df = load_table(spark, "/root/testdata/sf0.001", table)
        path = str(tmp_path / f"{table}_orc")
        df.write.orc(path)
        _assert_same(df, spark.read.schema(df.schema).orc(path))
