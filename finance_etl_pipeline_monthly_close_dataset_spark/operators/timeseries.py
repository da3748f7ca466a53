"""Dense-spine time-series repair: linear interpolation over gaps.

`events_resampled` (contract.py) zero-fills empty buckets -- right for
counts, wrong for level-like series (a sensor that missed an hour did
not read zero).  This operator reconstructs missing buckets by LINEAR
interpolation between the nearest present neighbors, clamping to the
nearest known value before the first / after the last observation --
the standard telemetry-repair semantics (pandas `interpolate(
limit_direction="both")`).

Scale shape: the spine is sequence + explode off a 1-row bounds
aggregate cross-joined with the (broadcast, bounded) key dimension --
pure Catalyst, no driver loop; the neighbor search is two
IGNORE-NULLS window passes (forward last_value, backward first_value)
over the spine, which shuffles once on the series key; the
interpolation itself is a fixed IEEE expression (prev + (next - prev)
* frac), reproducible bit-for-bit by any engine, so the operator is
oracle-checkable end-to-end (`events_interpolated`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dense_spine(
    present: DataFrame,
    key_col: str,
    bucket_col: str,
    step: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """One row per (key, bucket) over the GLOBAL [min, max] bucket
    range of ``present``: a 1-row bounds aggregate explodes into the
    bucket sequence, cross-joined with the distinct-key dimension
    (broadcast: keys are a dimension by construction).  All buckets
    get the full spine so per-key series are comparable."""
    bounds = present.agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    buckets = bounds.select(
        F.explode(F.sequence("_lo", "_hi", F.expr(step))).alias(bucket_col)
    )
    keys = present.select(key_col).distinct()
    return buckets.crossJoin(F.broadcast(keys))


def interpolate_linear(
    spine: DataFrame,
    present: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    out_col: str = "value_interp",
) -> DataFrame:
    """Left-join ``present`` onto ``spine`` and fill null buckets by
    linear interpolation between the nearest present neighbors
    (clamped to the nearest observation at the edges).  The fraction
    is seconds-based, so irregular gaps interpolate correctly; the
    expression ``prev + (next - prev) * frac`` is evaluated in exactly
    this order to stay engine-portable."""
    joined = spine.join(present, [key_col, bucket_col], "left")
    w_back = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    sec: Column = F.unix_timestamp(F.col(bucket_col)).cast("double")
    present_sec = F.when(F.col(value_col).isNotNull(), sec)
    prev_v = F.last(value_col, ignorenulls=True).over(w_back)
    prev_s = F.last(present_sec, ignorenulls=True).over(w_back)
    next_v = F.first(value_col, ignorenulls=True).over(w_fwd)
    next_s = F.first(present_sec, ignorenulls=True).over(w_fwd)
    frac = (sec - prev_s) / (next_s - prev_s)
    filled = (
        F.when(F.col(value_col).isNotNull(), F.col(value_col))
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return joined.select(
        key_col,
        bucket_col,
        F.col(value_col).isNull().alias("is_gap"),
        filled.alias(out_col),
    )
