"""Shared text primitives: tokenization and shingling.

Everything is built-in Catalyst expressions over string/array columns
(split / transform / filter / aggregate) -- whole-stage-codegen'd,
no Python UDFs, so these scale linearly with a 100 TB documents table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Lower-cased whitespace tokens, empty strings removed."""
    return F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (n-grams joined with single spaces).

    Implemented as transform over token indexes + slice + array_join --
    one pass, no explode.
    """
    toks = tokens(text)
    n = F.size(toks)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        )
    )


def ngrams(text: Column, k: int = 2) -> Column:
    """ALL k-token n-grams in order (duplicates kept -- unlike
    ``shingles``); the primitive repetition statistics need, since
    repetition is exactly what ``array_distinct`` would erase."""
    toks = tokens(text)
    n = F.size(toks)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )


def char_ngrams(text: Column, k: int = 5) -> Column:
    """Distinct character k-grams of the lower-cased text."""
    s = F.lower(F.trim(text))
    n = F.length(s)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
            lambda i: s.substr(i, F.lit(k)),
        )
    )
