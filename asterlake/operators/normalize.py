"""Unicode text normalization — the canonicalization stage every corpus
pipeline runs BEFORE dedup, tokenization and fingerprinting (composed
vs decomposed accents, ligatures, zero-width characters and stray
controls otherwise defeat exact/near-dup digests and split tokenizer
vocabularies: 'café' in NFC and NFD are different byte strings and
different BPE words).

Steps (each independently toggleable, applied in this order):

1. ``form`` — unicodedata.normalize (NFC by default; NFKC for the
   compatibility fold that rewrites ligatures/fullwidth forms).
2. ``strip_controls`` — drop C0/C1 control characters and the
   zero-width set (ZWSP/ZWNJ/ZWJ/BOM), KEEPING \\n and \\t (document
   structure is content; a PDF-extracted corpus is full of stray
   controls that are not).
3. ``collapse_whitespace`` — runs of spaces/tabs collapse to one
   space, runs of newlines cap at two (paragraph break), leading/
   trailing whitespace trims — the Gopher/CCNet whitespace canon.

Implementation: ONE Arrow-batched pandas UDF (the bpe_segment
discipline — stdlib ``unicodedata`` + compiled regexes per batch,
row-local, no shuffle, no JVM round trips per row). NULL text stays
NULL (normalization is a projection, not an imputation).

Determinism: unicodedata tables are pinned by the Python build — the
same container that runs the oracle side — and every step is a pure
function of the input string, so normalized output is byte-stable
across partitionings and engines sharing the unicode version. A DuckDB
oracle can replay form='NFC' via nfc_normalize plus regexp steps
(r13 declaration note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["normalize_text"]

# C0/C1 controls minus \n (0A) and \t (09), plus the zero-width set
_CONTROL_CLASS = (
    "[\\x00-\\x08\\x0b-\\x1f\\x7f-\\x9f\\u200b\\u200c\\u200d\\ufeff]"
)


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    form: str | None = "NFC",
    strip_controls: bool = True,
    collapse_whitespace: bool = True,
) -> DataFrame:
    """Append ``out_col`` (default: replace ``text_col``) with the
    normalized text, plus ``<out_col>_changed`` (boolean; NULL text ->
    NULL flag). See the module doc for step semantics."""
    if form not in (None, "NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    out = out_col or text_col
    import pandas as pd  # noqa: F401 - annotation side of the UDF

    @F.pandas_udf(T.StringType())
    def _norm(col):
        import re
        import unicodedata

        import pandas as pd

        ctrl = re.compile(_CONTROL_CLASS)
        spaces = re.compile(r"[ \t\x0c]+")
        newlines = re.compile(r" ?\n[ \n]*")

        def one(s):
            if s is None:
                return None
            if form:
                s = unicodedata.normalize(form, s)
            if strip_controls:
                s = ctrl.sub("", s)
            if collapse_whitespace:
                s = spaces.sub(" ", s)
                s = newlines.sub(
                    lambda m: "\n\n" if m.group(0).count("\n") > 1 else "\n",
                    s,
                )
                s = s.strip()
            return s

        return col.map(one)

    # derive the changed flag BEFORE the output column lands: when
    # out == text_col the naive "compare after withColumn" would
    # compare the replaced column to itself (always false)
    with_tmp = docs.withColumn("_normed", _norm(F.col(text_col)))
    changed = F.when(
        F.col(text_col).isNull(), F.lit(None).cast("boolean")
    ).otherwise(F.col("_normed") != F.col(text_col))
    return (
        with_tmp.withColumn(f"{out}_changed", changed)
        .withColumn(out, F.col("_normed"))
        .drop("_normed")
    )
