"""PII detection + redaction over a documents table (canonical module).

The standard pre-training scrub pass (C4/RefinedWeb-style): find
emails, phone numbers, and IPv4 addresses with portable regexes,
count them per document (the audit trail a compliance review needs),
and replace them with typed placeholder tokens. Everything is
built-in ``regexp_extract_all`` / ``regexp_count`` /
``regexp_replace`` expressions -- whole-stage-codegen'd, one scan,
zero shuffles, linear over a 100 TB corpus.

Two surfaces over ONE shared pattern table:

* ``scrub_pii`` -- per-kind audit counts + ``<KIND>`` placeholders in
  a new column; the oracle-checked form (``docs_pii_scrub``
  value-checks counts AND the md5 of the redacted text against
  DuckDB).
* ``redact_pii`` -- the corpus-CLI policy form (re-exported from
  ``text_analysis`` where it originally lived): in-place replacement
  with ``[KIND]`` placeholders, a kinds filter, and one total
  ``n_redactions`` so a downstream filter can drop PII-dense
  documents entirely.

Pattern portability: only syntax shared by Java's ``j.u.regex``
(Spark) and RE2 (DuckDB/Go) -- character classes, bounded repetition,
non-capturing groups, ``\\b`` word boundaries; no backreferences,
lookaround, or ``\\s`` (Java's includes U+000B vertical tab, RE2's
does not -- explicit ``[ \\t]`` classes instead) -- so an external
engine reproduces the exact match set.
Regex scrubbing is a floor, not a guarantee: names, addresses, and
free-form identifiers need an NER pass (model inference via
mapInPandas, not hostable in this container); the operator seam is
the same either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, regex) -- order matters: earlier patterns are counted and
# replaced first (an email must not be half-eaten by the phone
# pattern's digit runs).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    # phone must be SHAPED like a phone (optional +cc, then 3-3-4
    # groups), not any long digit run: a finance corpus is full of
    # ISO dates and id numbers that a loose [\d\s-]{7,} class would
    # mangle. Dotted phones (415.555.0134) are the accepted false
    # negative -- dots would collide with IPv4/version shapes.
    ("phone", r"\+?\d{0,2}[ \t-]?\(?\d{3}\)?[ \t-]?\d{3}[ \t-]?\d{4}\b"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
)


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: tuple[tuple[str, str], ...] | None = None,
) -> DataFrame:
    """Append per-pattern match counts (``n_<name>``) and the scrubbed
    text (``<text_col>_scrubbed``, ``<NAME>`` placeholders) to ``df``.
    Counts are taken against the ORIGINAL text before any replacement
    (so overlapping pattern families report what they saw, not what
    survived the previous replacement); replacements then apply in
    pattern order."""
    pats = PII_PATTERNS if patterns is None else patterns
    out = df
    for name, pat in pats:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))),
        )
    scrubbed = F.col(text_col)
    for name, pat in pats:
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return out.withColumn(f"{text_col}_scrubbed", scrubbed)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = ("email", "phone", "ipv4"),
) -> DataFrame:
    """Scrub common PII shapes from a text column before training
    (the corpus-CLI policy form; see module docstring). Each kind is
    replaced by a ``[KIND]`` placeholder via chained
    ``regexp_replace``; ``n_redactions`` totals the placeholders the
    row received. Counts run against the stage-intermediate text
    (before each pattern's own replacement): counting placeholders
    afterwards would overcount documents that legitimately contain
    '[EMAIL]' etc."""
    patterns = [(k, p) for k, p in PII_PATTERNS if k in kinds]
    unknown = set(kinds) - {k for k, _ in PII_PATTERNS}
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    out = F.col(text_col)
    n = F.lit(0)
    for kind, pat in patterns:
        n = n + F.regexp_count(out, F.lit(pat))
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return (
        df.withColumn("_redacted", out)
        .withColumn("n_redactions", n.cast("int"))
        .withColumn(text_col, F.col("_redacted"))
        .drop("_redacted")
    )
