"""Structured-PII scan + redaction audit (operators/pii.py)."""

from pyspark.sql import functions as F

from asterlake.operators.pii import PII_PATTERNS, luhn_valid, pii_scan


def _scan_one(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    return pii_scan(df, "text", **kw).collect()[0]


def test_counts_every_class(spark):
    r = _scan_one(
        spark,
        "mail a@b.com and c.d+x@e-f.org, call +1-555-123-4567, "
        "host 10.0.255.7 and 192.168.1.1, card 4111111111111111.",
    )
    assert (r.n_email, r.n_phone, r.n_ipv4, r.n_card) == (2, 1, 2, 1)
    assert r.n_card_valid == 1
    assert r.any_pii is True


def test_luhn_separates_card_shaped_from_card_valid(spark):
    # 4111111111111111 and 5500005555555559 pass Luhn; flipping the
    # check digit fails; all three still COUNT as card-shaped
    r = _scan_one(
        spark,
        "4111111111111111 4111111111111112 5500005555555559",
    )
    assert r.n_card == 3
    assert r.n_card_valid == 2


def test_luhn_valid_column_directly(spark):
    rows = (
        spark.createDataFrame(
            [("4111111111111111",), ("4111111111111112",)], "c string"
        )
        .select(luhn_valid(F.col("c")).alias("ok"))
        .collect()
    )
    assert [r.ok for r in rows] == [True, False]


def test_ipv4_octet_range_and_boundaries(spark):
    # 256 and 300 are out of range; an ip embedded in a longer digit
    # run must not donate a substring match
    r = _scan_one(spark, "bad 256.300.1.2 also 1234.5.6.789 ok 0.0.0.0")
    assert r.n_ipv4 == 1
    # a 16-digit run must not leak octet-ish or card-adjacent matches
    r2 = _scan_one(spark, "digits 12345678901234567 overflow")
    assert (r2.n_ipv4, r2.n_card) == (0, 0)


def test_redaction_replaces_every_class_in_order(spark):
    r = _scan_one(
        spark,
        "a@b.com +1-555-123-4567 10.0.0.1 4111111111111111 end",
    )
    assert (
        r.text_redacted == "[EMAIL] [PHONE] [IPV4] [CARD] end"
    )


def test_null_and_clean_text(spark):
    df = spark.createDataFrame(
        [(None,), ("no pii here at all",)], "text string"
    )
    rows = pii_scan(df, "text").collect()
    for r in rows:
        assert (r.n_email, r.n_phone, r.n_ipv4, r.n_card) == (0, 0, 0, 0)
        assert r.n_card_valid == 0
        assert r.any_pii is False
    assert rows[0].text_redacted is None
    assert rows[1].text_redacted == "no pii here at all"


def test_scan_is_one_rowlocal_projection(spark):
    """No shuffle, no Python eval: the whole scan is a project over the
    scan node."""
    df = spark.createDataFrame([("x",)], "text string")
    plan = (
        pii_scan(df, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_patterns_match_identically_in_duckdb(spark):
    """The cross-engine dialect claim, tested directly: every pattern
    yields the same match lists in Spark and DuckDB (RE2) over a
    corpus of tricky probes."""
    import duckdb

    probes = [
        "a@b.com c.d+x%y@e-f.org not-an@email",
        "+1-555-123-4567 +12-999-000-1111 +123-55-1234",
        "0.0.0.0 255.255.255.255 256.1.1.1 1.2.3 12.34.56.789",
        "4111111111111111 123456789012345 12345678901234567",
        "mixed: a@b.io,+1-222-333-4444;9.9.9.9 5500005555555559!",
    ]
    sdf = spark.createDataFrame([(p,) for p in probes], "t string")
    con = duckdb.connect()
    for name, pat in PII_PATTERNS.items():
        got_spark = [
            r.m
            for r in sdf.select(
                F.regexp_extract_all(F.col("t"), F.lit(pat), 0).alias("m")
            ).collect()
        ]
        got_duck = [
            row[0]
            for row in con.execute(
                "SELECT regexp_extract_all(t, ?) FROM (SELECT UNNEST(?) AS t)",
                [pat, probes],
            ).fetchall()
        ]
        assert got_spark == got_duck, (name, got_spark, got_duck)
