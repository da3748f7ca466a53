"""Portable Bloom-filter semi-join reduction (runtime row-level filter).

The classic 100 TB join optimization: before shuffling a fact table
into a join, broadcast a Bloom filter of the build side's keys and
drop non-matching fact rows MAP-SIDE, at the scan. The shuffle then
carries ~(matches + fpp x non-matches) rows instead of the whole
fact. Spark injects this itself for some shapes (InjectRuntimeFilter
with an internal ``BloomFilterAggregate``), but the aggregate is not
in the public function registry and its hash is engine-specific.

This operator re-expresses the technique with md5-derived bit
positions so (a) it builds from the public DataFrame API for ANY join
shape, and (b) an external SQL engine can reproduce the EXACT filter
decisions -- the survivor count is an oracle-checked quantity
(``lineitem_bloom_semijoin``), not a claim. The packed bitmap
(``array<long>``, num_bits/64 elements) broadcasts as one row.

Guarantees: NO false negatives (every true match survives; the
downstream exact join removes the ~fpp false positives), so
prefilter + exact join == exact join, always. Production note: swap
the md5 position hash for ``xxhash64`` when cross-engine
reproducibility isn't required -- the structure is identical.

Per the PLANS.md higher-order-function CSE rule, the per-key position
array is staged through a projection (``_pos``) before the membership
lambda consumes it, so each of the ``num_hashes`` md5 values is
computed exactly once per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_positions(key: Column, num_bits: int, num_hashes: int) -> Column:
    """Array of ``num_hashes`` bit positions for a key: position i is
    the first 8 hex digits of md5("<key>:<i>") mod num_bits -- both
    engines compute it identically (DuckDB: CAST('0x'||substr(md5(..),
    1,8) AS BIGINT) % num_bits)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", key.cast("string"), i.cast("string"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long"),
            F.lit(num_bits),
        ),
    )


def bloom_build(
    build: DataFrame,
    key_col: str,
    num_bits: int = 1 << 14,
    num_hashes: int = 4,
) -> DataFrame:
    """Aggregate the build side's keys into a 1-row DataFrame holding
    the packed bitmap ``bloom_words`` (array<long>, num_bits/64
    elements). Map-side: explode positions, OR per 64-bit word, then
    densify via a word->bits map -- the shuffle carries at most
    num_bits/64 rows regardless of build-side size."""
    n_words = num_bits // 64
    pos = build.select(
        F.explode(bloom_positions(F.col(key_col), num_bits, num_hashes)).alias("p")
    ).distinct()
    words = (
        pos.select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("_wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda w: F.coalesce(
                F.element_at(F.col("_wm"), w.cast("long")), F.lit(0).cast("long")
            ),
        ).alias("bloom_words")
    )


def bloom_might_contain_expr(pos_col: str = "_pos", words_col: str = "bloom_words") -> Column:
    """The membership test as ONE reusable expression: every position
    bit set in the packed bitmap. Shared by ``bloom_prefilter`` and
    the oracle-checked contract query, so the bit-indexing semantics
    cannot drift between the production filter and its check."""
    return F.expr(
        f"forall({pos_col}, p -> "
        f"(element_at({words_col}, cast(p div 64 as int) + 1) "
        f"& shiftleft(1L, cast(p % 64 as int))) != 0)"
    )


def bloom_prefilter(
    fact: DataFrame,
    bloom: DataFrame,
    key_col: str,
    num_bits: int = 1 << 14,
    num_hashes: int = 4,
) -> DataFrame:
    """Keep fact rows whose key MIGHT be in the bloom (all position
    bits set). The 1-row bitmap broadcasts; the check is a map-side
    expression at the fact scan -- no shuffle is introduced, and at
    cluster scale the join shuffle behind this filter shrinks to
    roughly the match rate."""
    staged = fact.crossJoin(F.broadcast(bloom)).withColumn(
        "_pos", bloom_positions(F.col(key_col), num_bits, num_hashes)
    )
    return staged.filter(bloom_might_contain_expr()).drop("_pos", "bloom_words")
