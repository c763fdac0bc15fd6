"""k-anonymity audit/release (operators/privacy) unit tests."""

from __future__ import annotations

from asterlake.operators.privacy import (
    k_anonymity_report,
    k_anonymous_release,
)


def _df(spark):
    rows = [
        # class (A, 1): 3 members; class (A, 2): 1; class (B, 1): 2
        (1, "A", 1),
        (2, "A", 1),
        (3, "A", 1),
        (4, "A", 2),
        (5, "B", 1),
        (6, "B", 1),
    ]
    return spark.createDataFrame(rows, "id long, seg string, bucket int")


def test_report_classes_and_violations(spark):
    rep = k_anonymity_report(_df(spark), ["seg", "bucket"], k=3)
    got = {(r.seg, r.bucket): (r.k, r.violates) for r in rep.collect()}
    assert got == {
        ("A", 1): (3, False),
        ("A", 2): (1, True),
        ("B", 1): (2, True),
    }


def test_release_suppresses_small_classes(spark):
    rel = k_anonymous_release(_df(spark), ["seg", "bucket"], k=2)
    kept = sorted(r.id for r in rel.collect())
    assert kept == [1, 2, 3, 5, 6]  # the singleton (A, 2) is suppressed
    strict = k_anonymous_release(_df(spark), ["seg", "bucket"], k=3)
    assert sorted(r.id for r in strict.collect()) == [1, 2, 3]


def test_release_satisfies_its_own_audit(spark):
    """The released table must itself be k-anonymous — the closure
    property that makes the release safe to re-audit."""
    rel = k_anonymous_release(_df(spark), ["seg", "bucket"], k=2)
    rep = k_anonymity_report(rel, ["seg", "bucket"], k=2)
    assert rep.filter("violates").count() == 0


def test_release_null_classes_match_audit(spark):
    """NULL quasi values form a class like any other (groupBy semantics):
    the release must keep a NULL-valued class of size >= k and suppress
    a small one — the same class arithmetic the audit reports (r11
    ADVICE: the null-unsafe semi-join suppressed EVERY NULL-quasi row,
    so audit and release disagreed on NULL classes)."""
    rows = [
        (1, None, 1),
        (2, None, 1),   # class (NULL, 1): 2 members -> kept at k=2
        (3, None, 2),   # class (NULL, 2): singleton -> suppressed
        (4, "A", None),
        (5, "A", None), # class (A, NULL): 2 members -> kept at k=2
        (6, "A", 1),    # class (A, 1): singleton -> suppressed
    ]
    df = spark.createDataFrame(rows, "id long, seg string, bucket int")
    from asterlake.operators.privacy import (
        k_anonymity_report,
        k_anonymous_release,
    )

    rel = k_anonymous_release(df, ["seg", "bucket"], k=2)
    assert sorted(r.id for r in rel.collect()) == [1, 2, 4, 5]
    # closure: the audit over the release sees zero violations, and the
    # release kept exactly the audit's non-violating classes
    rep = k_anonymity_report(rel, ["seg", "bucket"], k=2)
    assert rep.filter("violates").count() == 0
    passing = {
        (r.seg, r.bucket)
        for r in k_anonymity_report(df, ["seg", "bucket"], k=2)
        .filter("NOT violates")
        .collect()
    }
    kept_classes = {(r.seg, r.bucket) for r in rel.collect()}
    assert kept_classes == passing
