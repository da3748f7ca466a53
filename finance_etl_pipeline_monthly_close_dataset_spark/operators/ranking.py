"""Distributed ranking: exact global rank / ntile without a
single-partition sort.

A global ``Window.orderBy(...)`` (no ``partitionBy``) collapses the
whole dataset onto ONE task -- the classic 100x scale-killer (the
``WindowExec: No Partition Defined`` warning). The same semantics
decompose into stages that all stay distributed:

1. ``repartitionByRange`` on the ordering key -- Spark's distributed
   sort: range boundaries come from a sampled sketch, and every
   partition holds a disjoint, ordered key range.
2. per-partition ``row_number`` -- the window is partitioned by
   ``spark_partition_id()``, so no task ever sees more than one
   partition's rows.
3. partition row-counts -> prefix-sum offsets. This collect is
   METADATA-sized (one long per partition, the same bounded pattern as
   ``operators/skew.py`` hot-key detection), never data.
4. ``global_rank = offset[pid] + local_rank``; ntile boundaries are
   then pure arithmetic on the exact rank.

``distributed_ntile`` matches ``ntile(k) OVER (ORDER BY ...)``
bit-for-bit (the first ``n % k`` tiles get the extra row), so it can
sit under a SQL-window oracle while surviving a 100x scale-up.
Ordering columns must form a total order (add a unique tie-break
column) for the result to be deterministic.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel


def _cols(order_cols) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


def global_rank(
    df: DataFrame,
    order_cols,
    rank_col: str = "global_rank",
    num_partitions: int | None = None,
    persist_intermediate: bool = True,
) -> Tuple[DataFrame, int]:
    """Exact 1-based global rank over ``order_cols`` with every stage
    distributed. Returns ``(df_with_rank, total_rows)`` -- the total is
    free (sum of the per-partition counts).

    The ranged DataFrame is persisted (MEMORY_AND_DISK, spills rather
    than OOMs) so the offset job and the consumer job see the identical
    partitioning; it stays cached until session end -- pass
    ``persist_intermediate=False`` for one-shot jobs that prefer a
    recompute over the cache footprint (range sampling is seeded
    deterministically, so a recompute reproduces the same boundaries
    for the same input either way).
    """
    if "_pid" in df.columns:
        raise ValueError("global_rank: input column name '_pid' is reserved")
    cols = _cols(order_cols)
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    ranged = df.repartitionByRange(num_partitions, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    if persist_intermediate:
        ranged = ranged.persist(StorageLevel.MEMORY_AND_DISK)
    counts = sorted(
        (row["_pid"], row["n"])
        for row in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets: dict[int, int] = {}
    total = 0
    for pid, n in counts:
        offsets[pid] = total
        total += n
    if offsets:
        omap = F.create_map(
            *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
        )
        offset_expr = F.coalesce(omap[F.col("_pid")], F.lit(0))
    else:
        offset_expr = F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*cols)
    out = ranged.withColumn(
        rank_col, (offset_expr + F.row_number().over(w)).cast("long")
    ).drop("_pid")
    return out, total


def distributed_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols,
    tile_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """``ntile(n_tiles) OVER (ORDER BY order_cols)`` without a global
    window: exact rank from :func:`global_rank`, then the SQL ntile
    bucket rule (first ``n % k`` buckets hold ``ceil(n/k)`` rows, the
    rest ``floor(n/k)``) applied as plain arithmetic."""
    if "_grank" in df.columns:
        raise ValueError("distributed_ntile: input column name '_grank' is reserved")
    ranked, total = global_rank(df, order_cols, rank_col="_grank", num_partitions=num_partitions)
    if total == 0:
        return ranked.withColumn(tile_col, F.lit(None).cast("int")).drop("_grank")
    base, rem = divmod(total, n_tiles)
    r = F.col("_grank")
    if base == 0:
        tile = r  # fewer rows than tiles: row r lands alone in tile r
    elif rem == 0:
        tile = F.floor((r - F.lit(1)) / F.lit(base)) + 1
    else:
        boundary = rem * (base + 1)
        tile = F.when(
            r <= F.lit(boundary), F.floor((r - F.lit(1)) / F.lit(base + 1)) + 1
        ).otherwise(
            F.lit(rem) + F.floor((r - F.lit(boundary) - F.lit(1)) / F.lit(base)) + 1
        )
    return ranked.withColumn(tile_col, tile.cast("int")).drop("_grank")
