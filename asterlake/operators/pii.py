"""Structured-PII scan and redaction audit (r13 verdict ask #4a).

The compliance pass the literal-term tiers cannot cover: the denylist /
Aho-Corasick screens (textstats.redact_terms, matcher.py) match KNOWN
strings, but emails, phone numbers, IP addresses and payment-card
numbers are open classes — any value matching the SHAPE is sensitive.
This module scans text for those shapes with JVM-side regular
expressions (``regexp_count`` / ``regexp_extract_all`` /
``regexp_replace`` — no Python in the row path), counts per class,
validates card candidates with the Luhn checksum (ISO/IEC 7812 — the
public check digit every issuer uses, so "16 digits" and "a real card
shape" are separable columns), and emits the redacted text with
class-tagged placeholders.

Pattern dialect: every pattern here restricts itself to the syntax
Java's regex and RE2 (DuckDB) interpret identically — character
classes, bounded repetition, alternation, ``\\b`` word boundaries; no
lookaround, no backreferences — so a DuckDB oracle replays the scan
verbatim (the cross-engine discipline of the normalize/collocation
families).

Scale shape: the whole scan — counts, Luhn folds over the extracted
candidates, and the ordered redaction chain — is ONE row-local
projection: no shuffle, no UDF, embarrassingly parallel over a 100 TB
corpus. The Luhn fold runs over ``regexp_extract_all``'s candidate
list (a handful per row), each candidate a fixed 16-step integer fold.

Reference scope note: the reference lakehouse
(VictorClvtt/nasa_asteroid_data_lakehouse) has no PII machinery at
all; this family exists for the training-data curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "luhn_valid",
    "pii_scan",
]

# Shape patterns, shared Java-regex/RE2 subset (see module docstring).
# ipv4 validates octet ranges in-pattern (0-255); \b keeps a longer
# digit run from donating a suffix/prefix. The card shape is 16
# contiguous digits — separators vary by locale and a separator-
# tolerant pattern would cross-match phone formats; Luhn then separates
# card-SHAPED from card-VALID.
PII_PATTERNS: "dict[str, str]" = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "phone": r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ipv4": (
        r"\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
        r"(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b"
    ),
    "card": r"\b[0-9]{16}\b",
}

# Redaction order: email first (its local part may contain digits a
# later class would mangle), then card before phone before ipv4 —
# longest digit shapes first, so a placeholder landed by one class can
# never split a longer match of another.
_REDACT_ORDER = ("email", "card", "phone", "ipv4")


def luhn_valid(card: F.Column) -> F.Column:
    """Luhn checksum (ISO/IEC 7812) over a 16-digit string column, as
    one JVM-side integer fold: from the RIGHT, double every second
    digit (the check digit itself, rightmost, stays single), subtract 9
    from doubled values above 9, and require the total to divide by 10.
    For left position ``i`` in 1..16 the right position is ``17-i``, so
    doubling hits odd ``i``. Exact integers throughout — the same fold
    an oracle replays with 1-based list lambdas."""
    digit = lambda i: F.ascii(F.substring(card, i, 1)) - F.lit(48)  # noqa: E731
    return (
        F.aggregate(
            F.sequence(F.lit(1), F.lit(16)),
            F.lit(0),
            lambda acc, i: acc
            + F.when(
                i % 2 == 1,
                F.when(digit(i) * 2 > 9, digit(i) * 2 - 9).otherwise(
                    digit(i) * 2
                ),
            ).otherwise(digit(i)),
        )
        % 10
        == 0
    )


def pii_scan(
    df: DataFrame,
    text_col: str = "text",
    redact: bool = True,
) -> DataFrame:
    """Per-row structured-PII audit: appends

    - ``n_<class>`` (INT) — match count per class in
      :data:`PII_PATTERNS` (email, phone, ipv4, card);
    - ``n_card_valid`` (INT) — how many card-shaped candidates pass
      the Luhn checksum (``n_card_valid <= n_card``);
    - ``any_pii`` (BOOLEAN) — any class matched;
    - ``<text_col>_redacted`` (when ``redact``) — the text with every
      match replaced by its class placeholder (``[EMAIL]`` etc.), in
      the fixed :data:`_REDACT_ORDER` so classes cannot split each
      other's matches.

    NULL text yields zero counts, ``any_pii`` false and NULL redacted
    text (nothing to redact is not an empty redaction). One projection,
    row-local; see the module docstring for the scale/dialect story."""
    text = F.col(text_col)
    out = df
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}",
            F.coalesce(
                F.regexp_count(text, F.lit(pat)), F.lit(0)
            ).cast("int"),
        )
    out = out.withColumn(
        "n_card_valid",
        F.coalesce(
            F.size(
                F.filter(
                    F.regexp_extract_all(
                        text, F.lit(PII_PATTERNS["card"]), 0
                    ),
                    luhn_valid,
                )
            ),
            F.lit(0),
        ).cast("int"),
    ).withColumn(
        "any_pii",
        sum(
            (F.col(f"n_{name}") for name in PII_PATTERNS),
            F.lit(0),
        )
        > 0,
    )
    if redact:
        red = text
        for name in _REDACT_ORDER:
            red = F.regexp_replace(
                red, PII_PATTERNS[name], f"[{name.upper()}]"
            )
        out = out.withColumn(f"{text_col}_redacted", red)
    return out
