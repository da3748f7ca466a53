"""Snapshot diff (operators/cdc.py) and table checksums
(operators/sketches.py bucket_checksums)."""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_etl_pipeline_monthly_close_dataset_spark.operators.cdc import snapshot_diff
from finance_etl_pipeline_monthly_close_dataset_spark.operators.sketches import (
    bucket_checksums,
)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k bigint, price double, status string")


def test_snapshot_diff_classifies_all_change_types(spark):
    old = _snap(spark, [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C")])
    new = _snap(spark, [(2, 20.0, "B"), (3, 31.0, "C"), (4, 40.0, "D")])
    out = snapshot_diff(old, new, ["k"], ["price", "status"])
    got = {r["k"]: r["change_type"] for r in out.collect()}
    assert got == {1: "delete", 3: "update", 4: "insert"}
    upd = out.filter(F.col("k") == 3).first()
    assert upd["old_price"] == 30.0 and upd["new_price"] == 31.0


def test_snapshot_diff_null_transitions_are_updates(spark):
    # NULL -> value and value -> NULL must classify as update, and
    # NULL == NULL as unchanged (eqNullSafe struct comparison)
    old = _snap(spark, [(1, None, "A"), (2, 5.0, "B"), (3, None, "C")])
    new = _snap(spark, [(1, 1.0, "A"), (2, None, "B"), (3, None, "C")])
    out = snapshot_diff(old, new, ["k"], ["price", "status"])
    got = {r["k"]: r["change_type"] for r in out.collect()}
    assert got == {1: "update", 2: "update"}  # k=3 unchanged, excluded
    full = snapshot_diff(
        old, new, ["k"], ["price", "status"], include_unchanged=True
    )
    assert {r["k"]: r["change_type"] for r in full.collect()}[3] == "unchanged"


def test_bucket_checksums_order_and_partitioning_invariant(spark):
    df = spark.range(1000).select(
        F.col("id").alias("k"), F.concat(F.lit("row_"), F.col("id")).alias("s")
    )
    row_str = F.concat_ws("|", "k", "s")

    def sums(frame):
        return sorted(
            map(tuple, bucket_checksums(frame, row_str, F.col("k"), 8).collect())
        )

    base = sums(df)
    assert len(base) == 8 and sum(r[2] for r in base) == 1000
    # XOR checksum is order- and partitioning-independent
    assert sums(df.repartition(13).sortWithinPartitions(F.desc("k"))) == base
    # and any single-row change flips exactly one bucket's checksum
    tweaked = df.withColumn(
        "s", F.when(F.col("k") == 500, F.lit("CHANGED")).otherwise(F.col("s"))
    )
    diff = [a for a, b in zip(base, sums(tweaked)) if a != b]
    assert len(diff) == 1 and diff[0][0] == 500 % 8
