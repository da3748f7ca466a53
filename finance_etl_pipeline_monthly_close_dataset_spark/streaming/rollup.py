"""Continuous rollup (hypertable-style): incrementally maintained
time-bucketed aggregates over an event stream.

The pattern: each micro-batch aggregates its OWN rows into partial
(bucket, key) sums and appends them to a bucket-partitioned parquet
rollup table -- commutative partials, so no upsert/merge is needed and
batches never read existing rollup data. Readers fold partials with a
second group-by; the fold touches only the rollup table (orders of
magnitude smaller than the raw stream), and bucket partitioning prunes
time-range queries to the touched partitions.

This trades a tiny read-side aggregation for an append-only write path
-- the same design as TimescaleDB continuous aggregates' materialized
partials or a Druid-style ingest rollup. ``compact_rollup`` folds the
accumulated partials in place when a table has seen many batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _partials(batch: DataFrame, width_seconds: int, key_col: str) -> DataFrame:
    w = width_seconds
    bucket = F.timestamp_seconds(F.floor(F.unix_timestamp("ts") / w) * w)
    return batch.groupBy(
        bucket.alias("bucket"), F.col(key_col).alias("key")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
    ).withColumn("bucket_date", F.to_date("bucket"))


def start_rollup(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    rollup_dir: str,
    checkpoint_dir: str,
    width_seconds: int = 3600,
    key_col: str = "event_type",
    max_files_per_trigger: int | None = None,
):
    """Start the incremental rollup stream; returns the StreamingQuery.

    foreachBatch keeps the write path a plain batch parquet append, so
    the rollup table is readable by any engine mid-stream.

    ``max_files_per_trigger`` bounds each micro-batch to that many
    source files -- tests replaying a bounded file stream set 1 so the
    stream genuinely produces one micro-batch (and one batch_id) per
    staged file instead of swallowing the whole backlog in a single
    batch; production streams normally leave it unset and size
    micro-batches by arrival.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        # batch_id rides along so a replayed micro-batch (failure after
        # write, before checkpoint commit) cannot double-count: readers
        # keep one partial row per (bucket, key, batch_id)
        (
            _partials(batch, width_seconds, key_col)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("bucket_date")
            .parquet(rollup_dir)
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """Final aggregates: fold the partials (decimal sums -- exact and
    order-independent across however many batches contributed).
    Duplicate partials from a replayed batch collapse via the
    (bucket, key, batch_id) identity before folding."""
    partials = spark.read.parquet(rollup_dir).dropDuplicates(["bucket", "key", "batch_id"])
    return (
        partials.groupBy("bucket", "key")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").cast("double").alias("sum_value"),
        )
    )


def compact_rollup(spark: SparkSession, rollup_dir: str, out_dir: str) -> None:
    """Fold accumulated partials into one row per (bucket, key) --
    run occasionally to bound rollup-table growth under many batches."""
    partials = spark.read.parquet(rollup_dir).dropDuplicates(["bucket", "key", "batch_id"])
    (
        partials.groupBy("bucket", "bucket_date", "key")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
        )
        .withColumn("batch_id", F.lit(-1))
        .write.mode("overwrite")
        .partitionBy("bucket_date")
        .parquet(out_dir)
    )
