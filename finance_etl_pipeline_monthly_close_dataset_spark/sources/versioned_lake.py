"""Versioned parquet lake: snapshot isolation, time travel, and a
change data feed over plain parquet -- the transactional-format
primitives (Delta/Iceberg) re-expressed with directories and an
atomically-replaced pointer file.

Layout:

    lake/
      v=1/ ... parquet ...
      v=2/ ...
      _LATEST            # one line: the current version number

Writers stage the next version's directory COMPLETELY, then flip
``_LATEST`` via write-temp + ``os.replace`` (atomic on POSIX). A
reader resolves the pointer once, then reads only ``v=N/`` -- it can
never observe a half-written version, and concurrent readers of an
older version are undisturbed because versions are immutable
(snapshot isolation by construction). Time travel is
``read_version(n)``; the change data feed between two versions is the
full-outer CDC diff (``operators/cdc.py``) of their snapshots;
``vacuum`` drops versions older than a retention window, mirroring
``VACUUM`` in the transactional formats.

At 100 TB the pointer flip and directory rename are metadata
operations on the object store / manifest service; the data motion is
exactly one write of the new version -- which ``upsert_version``
keeps proportional to the merged result, the same contract as the
``foreachBatch`` upsert sink.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_POINTER = "_LATEST"


def current_version(lake_dir: str) -> int:
    """0 when the lake does not exist yet."""
    p = os.path.join(lake_dir, _POINTER)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(f.read().strip())


def _flip_pointer(lake_dir: str, version: int) -> None:
    tmp = os.path.join(lake_dir, _POINTER + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(lake_dir, _POINTER))  # atomic


def write_version(df: DataFrame, lake_dir: str) -> int:
    """Commit ``df`` as the next full snapshot; returns its version.
    The version directory is complete before the pointer moves, so a
    crash mid-write leaves the previous version current and the
    orphaned directory is re-staged by the next commit."""
    os.makedirs(lake_dir, exist_ok=True)
    v = current_version(lake_dir) + 1
    vdir = os.path.join(lake_dir, f"v={v}")
    if os.path.exists(vdir):  # orphan from a crashed commit
        shutil.rmtree(vdir)
    df.write.mode("overwrite").parquet(vdir)
    _flip_pointer(lake_dir, v)
    return v


def read_version(spark: SparkSession, lake_dir: str, version: int) -> DataFrame:
    return spark.read.parquet(os.path.join(lake_dir, f"v={version}"))


def read_latest(spark: SparkSession, lake_dir: str) -> DataFrame:
    v = current_version(lake_dir)
    if v == 0:
        raise FileNotFoundError(f"no committed version in {lake_dir}")
    return read_version(spark, lake_dir, v)


def upsert_version(
    batch: DataFrame,
    lake_dir: str,
    key_col: str,
    ts_col: str,
) -> int:
    """Merge a batch into the latest snapshot (latest-per-key wins, the
    batch beating the lake on ties) and commit the result as a new
    version -- the versioned counterpart of ``streamed_upsert_sink``'s
    merge, with old versions retained for time travel / CDF."""
    spark = batch.sparkSession
    if current_version(lake_dir) > 0:
        current = read_latest(spark, lake_dir).withColumn("__is_new", F.lit(0))
        merged = batch.withColumn("__is_new", F.lit(1)).unionByName(current)
    else:
        merged = batch.withColumn("__is_new", F.lit(1))
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col("__is_new").desc()
    )
    latest = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__is_new")
        # sever lineage: the plan reads the version this write will
        # succeed (same hazard class as incremental_ingest)
        .localCheckpoint(eager=True)
    )
    return write_version(latest, lake_dir)


def changes_between(
    spark: SparkSession,
    lake_dir: str,
    from_version: int,
    to_version: int,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change data feed: the row-level insert/update/delete diff
    between two committed snapshots, via the CDC differ."""
    from ..operators.cdc import snapshot_diff

    old = read_version(spark, lake_dir, from_version)
    new = read_version(spark, lake_dir, to_version)
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in key_cols]
    return snapshot_diff(old, new, key_cols, compare_cols)


def vacuum(lake_dir: str, keep_last: int = 2) -> list[int]:
    """Drop versions older than the newest ``keep_last``; returns the
    removed version numbers. Never touches the current version."""
    cur = current_version(lake_dir)
    removed = []
    for name in sorted(os.listdir(lake_dir)):
        if not name.startswith("v="):
            continue
        v = int(name.split("=", 1)[1])
        if v <= cur - keep_last:
            shutil.rmtree(os.path.join(lake_dir, name))
            removed.append(v)
    return removed
