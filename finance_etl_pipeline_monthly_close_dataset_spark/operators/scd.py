"""Slowly-changing-dimension (type 2) merge.

The reference pipeline rebuilds its dimensions from scratch every
monthly close (export_powerbi_star_schema.py:35-78 derives dim_entity /
dim_account per run). At 100 TB the dimensions themselves become large
and history matters: the standard warehouse answer is SCD2 -- keep
every version of a dimension row with an effective-date range and an
``is_current`` flag, and close/open versions as attribute updates
arrive.

``scd2_merge`` is one declarative plan:

1. split the incoming dimension into history (``is_current = false``,
   passed through untouched) and current rows;
2. full-outer-join current rows with the update batch on the business
   key -- ONE shuffle on the key (Catalyst broadcasts the update side
   when it is small, the common case for dimension deltas);
3. classify each key with null-safe comparisons in a SINGLE pass: each
   joined row emits an array of output versions -- [carried], [closed,
   opened], or [opened] -- exploded once. (A filter-per-branch union
   would recompute the join per branch: 6 scans of the dimension,
   caught by plan_lint's scan counter.)

No windows, no collect: the whole merge is joins + projections, so it
scales to a billion-row dimension exactly like any co-partitioned
join. Re-running the same batch is idempotent (no tracked attribute
differs, so every row carries through unchanged).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_COLS = ("effective_from", "effective_to", "is_current")


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    batch_date: str,
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension.

    ``dim`` must carry the three metadata columns ``effective_from``
    (string date), ``effective_to`` (string date or null), and
    ``is_current`` (boolean); every non-key, non-metadata column is a
    tracked attribute. ``updates`` carries the keys plus the same
    tracked columns. Rows whose tracked attributes differ (null-safe)
    from the current version are closed at ``batch_date`` and reopened
    with the new values; unknown keys are inserted.

    ``updates`` must carry at most one row per key (dedupe a CDC feed
    with latest-record-per-key first -- see
    ``q_latest_order_per_customer`` for the pattern); duplicate update
    keys would fan out the join and open conflicting versions.
    """
    tracked = [c for c in dim.columns if c not in keys and c not in META_COLS]
    missing = [c for c in keys + tracked if c not in updates.columns]
    if missing:
        raise ValueError(f"updates is missing columns {missing}")

    history = dim.filter(~F.col("is_current"))
    cur = dim.filter(F.col("is_current")).alias("c")
    # literal presence markers survive the full outer join as non-null
    # exactly when that side had a matching row (tracked columns can't
    # serve: an all-null update row is a legitimate "set to null")
    upd = updates.select(*keys, *tracked).withColumn("_upd", F.lit(True)).alias("u")

    joined = cur.join(upd, on=keys, how="full_outer")
    has_cur = F.col("c.is_current").isNotNull()
    has_upd = F.col("u._upd").isNotNull()
    changed = reduce(
        lambda a, b: a | b,
        [~F.col(f"c.{c}").eqNullSafe(F.col(f"u.{c}")) for c in tracked],
        F.lit(False),
    )

    def version(side: str, eff_from, eff_to, is_cur) -> F.Column:
        return F.struct(
            *[F.col(k).alias(k) for k in keys],
            *[F.col(f"{side}.{c}").alias(c) for c in tracked],
            eff_from.cast("string").alias("effective_from"),
            eff_to.cast("string").alias("effective_to"),
            is_cur.alias("is_current"),
        )

    carried = version(
        "c",
        F.col("c.effective_from"),
        F.col("c.effective_to"),
        F.col("c.is_current"),
    )
    closed = version(
        "c", F.col("c.effective_from"), F.lit(batch_date), F.lit(False)
    )
    opened = version(
        "u", F.lit(batch_date), F.lit(None).cast("string"), F.lit(True)
    )
    # one row -> its output version(s); exploded in the SAME pass so
    # the full outer join is computed exactly once
    versions = (
        F.when(has_cur & (~has_upd | ~changed), F.array(carried))
        .when(has_cur & has_upd & changed, F.array(closed, opened))
        .otherwise(F.array(opened))  # new key: update side only
    )

    out_cols = keys + tracked + list(META_COLS)
    merged = joined.select(F.explode(versions).alias("_v")).select("_v.*")
    return history.select(*out_cols).unionByName(merged.select(*out_cols))


def scd2_initial(dim: DataFrame, initial_date: str) -> DataFrame:
    """Wrap a plain dimension snapshot as the initial SCD2 load."""
    return dim.select(
        "*",
        F.lit(initial_date).alias("effective_from"),
        F.lit(None).cast("string").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
