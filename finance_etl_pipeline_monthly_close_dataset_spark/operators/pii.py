"""PII detection + redaction over a documents table.

The standard pre-training scrub pass (C4/RefinedWeb-style): find
emails, North-American-format phone numbers, and IPv4 addresses with
portable regexes, count them per document (the audit trail a
compliance review needs), and replace them with typed placeholder
tokens. Everything is built-in ``regexp_extract_all`` /
``regexp_replace`` expressions -- whole-stage-codegen'd, one scan,
zero shuffles, linear over a 100 TB corpus.

Pattern portability: the regexes use only syntax shared by Java's
``j.u.regex`` (Spark) and RE2 (DuckDB/Go) -- character classes,
bounded repetition, ``\\b`` word boundaries; no backreferences or
lookaround -- so an external engine reproduces the exact match set
and the scrub is oracle-checkable byte-for-byte
(``docs_pii_scrub``). Production note: these are the portable core
patterns; a full scrub adds locale-specific phone formats, IBANs,
and national-id patterns as additional (pattern, placeholder) pairs
-- the operator takes any such list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, regex, placeholder) -- order matters: earlier patterns are
# counted and replaced first (an email must not be half-eaten by the
# phone pattern's digit runs)
DEFAULT_PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "phone",
        r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
]


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Append per-pattern match counts (``n_<name>``) and the scrubbed
    text (``<text_col>_scrubbed``) to ``df``. Counts are taken against
    the ORIGINAL text before any replacement (so overlapping pattern
    families report what they saw, not what survived the previous
    replacement); replacements then apply in pattern order."""
    pats = DEFAULT_PII_PATTERNS if patterns is None else patterns
    out = df
    for name, pat, _ph in pats:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))),
        )
    scrubbed = F.col(text_col)
    for _name, pat, ph in pats:
        scrubbed = F.regexp_replace(scrubbed, pat, ph)
    return out.withColumn(f"{text_col}_scrubbed", scrubbed)
