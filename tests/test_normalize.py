"""Unicode normalization (operators/normalize): known-form cases,
idempotence, NULL hygiene, partitioning invariance. R13 query
candidate (NFC leg replayable via DuckDB nfc_normalize + regexps)."""

from __future__ import annotations

import unicodedata

from asterlake.operators.normalize import normalize_text


def _run(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r.doc_id: (r.text, r.text_changed)
        for r in normalize_text(df, **kw).collect()
    }


def test_nfc_composes_and_flags(spark):
    decomposed = "café"           # e + combining acute
    composed = "café"
    got = _run(spark, [decomposed, composed, None])
    assert got[0] == (composed, True)
    assert got[1] == (composed, False)
    assert got[2] == (None, None)


def test_nfkc_folds_compatibility_forms(spark):
    got = _run(spark, ["ﬁle Ｄata"], form="NFKC")
    assert got[0] == ("file Data", True)
    # NFC must NOT fold the ligature (canonical vs compatibility)
    got = _run(spark, ["ﬁle"], form="NFC",
               collapse_whitespace=False)
    assert got[0] == ("ﬁle", False)


def test_control_strip_keeps_structure(spark):
    raw = "a\x00b​c\ttab\nline\x0b"
    got = _run(spark, [raw], collapse_whitespace=False)
    assert got[0] == ("abc\ttab\nline", True)


def test_whitespace_canon_matches_python_replay(spark):
    raw = "  a \t b\n\n\n c  \n d\n"
    got = _run(spark, [raw])
    assert got[0][0] == "a b\n\nc\nd"
    # idempotence: normalizing the output changes nothing
    again = _run(spark, [got[0][0]])
    assert again[0] == (got[0][0], False)


def test_normalize_matches_unicodedata_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    # full pipeline replay on the real corpus slice
    got = {
        r.doc_id: r.text
        for r in normalize_text(docs).select("doc_id", "text").collect()
    }
    import re

    ctrl = re.compile(
        "[\\x00-\\x08\\x0b-\\x1f\\x7f-\\x9f\\u200b\\u200c\\u200d\\ufeff]"
    )
    spaces = re.compile(r"[ \t\x0c]+")
    newlines = re.compile(r" ?\n[ \n]*")

    def ref(s):
        if s is None:
            return None
        s = unicodedata.normalize("NFC", s)
        s = ctrl.sub("", s)
        s = spaces.sub(" ", s)
        s = newlines.sub(
            lambda m: "\n\n" if m.group(0).count("\n") > 1 else "\n", s
        )
        return s.strip()

    want = {
        r.doc_id: ref(r.text)
        for r in docs.select("doc_id", "text").collect()
    }
    assert got == want


def test_normalize_partitioning_invariance(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    a = {
        (r.doc_id, r.text)
        for r in normalize_text(docs.coalesce(1)).select(
            "doc_id", "text"
        ).collect()
    }
    b = {
        (r.doc_id, r.text)
        for r in normalize_text(docs.repartition(7)).select(
            "doc_id", "text"
        ).collect()
    }
    assert a == b
