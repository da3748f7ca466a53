"""Interval (range) join -- point-in-interval matching without a
cross join.

Spark's optimizer turns ``l.ts BETWEEN r.start AND r.end`` with no
equality predicate into BroadcastNestedLoopJoin (O(|L| x |R|)); at
scale that is the plan that never finishes. This operator decomposes
time into fixed-width buckets: each interval is exploded to the
buckets it overlaps, each point maps to exactly one bucket, and the
join becomes an EQUALITY join on (bucket [, keys...]) followed by the
exact BETWEEN filter. Cost is O(|L| + |R| x avg_buckets_per_interval
+ |matches|) with a plain shuffled hash join -- the standard trick
interval-join implementations use (e.g. Flink's interval join and
spatial grid joins).

Pick ``bucket_width_seconds`` near the typical interval length: too
small multiplies the exploded right side, too large puts unrelated
rows in one bucket (they are discarded by the filter, but shuffle
them first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "_range_bucket"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bucket_width_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point_ts <= end`` (plus optional equi-keys ``on``).

    Each (point, interval) pair matches at most once: the point lives
    in exactly one bucket, so no post-join dedup is needed.

    Inner join only: with an outer ``how`` the post-join BETWEEN
    filter would silently drop the null-extended rows (degenerating to
    inner semantics), and Spark cannot push a non-equi predicate into
    a hash join -- callers needing left semantics should left-join the
    inner result back to ``points``.
    """
    if how != "inner":
        raise ValueError(f"range_join supports how='inner' only, got {how!r}")
    on = on or []
    w = bucket_width_seconds

    p = points.withColumn(_BUCKET, F.floor(F.unix_timestamp(F.col(point_ts)) / w))
    i = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / w),
                F.floor(F.unix_timestamp(F.col(end_col)) / w),
            )
        ),
    )
    cond = (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    return p.join(i, on=[*on, _BUCKET], how=how).filter(cond).drop(_BUCKET)
