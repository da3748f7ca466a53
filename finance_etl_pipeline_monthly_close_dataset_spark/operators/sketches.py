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
