"""Mergeable sketch aggregates (HLL) for incremental 100 TB profiling.

An exact COUNT(DISTINCT) over 100 TB re-reads everything each close.
The scalable pattern is sketch partials: aggregate each increment
(day / month / partition) once into a tiny binary HLL sketch, persist
the sketches, and answer any coarser rollup by UNIONING sketches --
no raw-data re-scan, associative and re-orderable, so late-arriving
increments just union in. Spark 4 ships the Apache DataSketches HLL
family as built-ins (hll_sketch_agg / hll_union_agg /
hll_sketch_estimate); these wrappers pin the engine's usage shape.

Estimates are deterministic for fixed input but engine-specific, so
contract coverage is the exact side (`distinct_counts`) plus the
rows-only `approx_distinct_quantiles`; the merge==direct invariant is
unit-tested instead (`tests/test_scale_ops.py`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_checksums(
    df: DataFrame,
    row_string: Column,
    bucket: Column,
    n_buckets: int = 16,
) -> DataFrame:
    """Order-independent per-bucket table fingerprints for cross-
    cluster reconciliation: XOR of an md5-derived 60-bit row hash plus
    a row count, per hash bucket.

    At 100 TB you verify a replicated / migrated table by comparing
    ``n_buckets`` (checksum, count) pairs instead of moving data; a
    mismatched bucket narrows the re-scan to 1/n_buckets of the table.
    XOR is associative, commutative and overflow-free, so partial
    checksums from any partitioning merge to the same value -- and the
    md5-via-string hash is portable (DuckDB:
    ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`` equals Spark's
    ``conv(substring(md5(s), 1, 15), 16, 10)``).
    """
    h = F.conv(F.substring(F.md5(row_string), 1, 15), 16, 10).cast("bigint")
    return (
        df.select((bucket % n_buckets).alias("bucket"), h.alias("_h"))
        .groupBy("bucket")
        .agg(
            F.expr("bit_xor(_h)").alias("checksum"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def hll_partials(
    df: DataFrame,
    increment_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col`` per increment (e.g. per month):
    the persistable partial. lg_k=12 -> ~2 KB per sketch, ~1.6% rse."""
    return df.groupBy(*increment_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll_sketch")
    )


def hll_rollup(
    partials: DataFrame,
    rollup_cols: list[str],
    estimate_col: str = "n_distinct_est",
) -> DataFrame:
    """Merge increment sketches up to a coarser grain and estimate.
    Input is sketches (KBs per group), not raw rows -- the shuffle is
    metadata-sized no matter how large the underlying table was."""
    grouped = (
        partials.groupBy(*rollup_cols)
        if rollup_cols
        else partials.groupBy()
    )
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias(estimate_col)
    )
