"""tWS vs applyInPandasWithState at the bench shape (2M/50k/4 batches,
RocksDB provider, core-sized state partitions)."""
import os, sys, shutil, tempfile, time
sys.path.insert(0, "/root/repo")
from finance_etl_pipeline_monthly_close_dataset_spark.session import get_spark
from finance_etl_pipeline_monthly_close_dataset_spark.streaming import stateful as st
from finance_etl_pipeline_monthly_close_dataset_spark.streaming import stateful_tws as tws
from pyspark.sql import functions as F, types as T
import bench

n_events, n_users, n_batches = 2_000_000, 50_000, 4
spark = get_spark(app_name="tws_scale", shuffle_partitions=8)
spark.conf.set("spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism))
spark.conf.set("spark.sql.streaming.stateStore.providerClass",
               "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

# stage the same deterministic slices bench._stream_state_bench builds
sdir = tempfile.mkdtemp(prefix="twsscale_")
seq = (F.col("id") / F.lit(n_users)).cast("long")
ev_df = spark.range(n_events).select(
    F.pmod("id", F.lit(n_users)).cast("long").alias("user_id"),
    (F.to_timestamp(F.lit("2025-12-01")).cast("long")
     + seq * (F.lit(600) + F.pmod("id", F.lit(5)) * F.lit(600))).cast("timestamp").alias("ts"),
)
n_seq = n_events // n_users
widths = bench._distinct_slice_widths(n_seq, n_batches)
bounds = [0]
for w in widths: bounds.append(bounds[-1] + w)
t_epoch = int(time.time()) - 86_400
os.makedirs(sdir + "/ev", exist_ok=True)
for i in range(n_batches):
    sl = ev_df.filter((seq >= bounds[i]) & (seq < bounds[i + 1]))
    stage = sdir + f"/stage_{i:02d}"
    sl.coalesce(1).write.parquet(stage)
    part = next(f for f in sorted(os.listdir(stage)) if f.endswith(".parquet"))
    dest = sdir + f"/ev/slice_{i:02d}.parquet"
    shutil.move(os.path.join(stage, part), dest)
    os.utime(dest, (t_epoch + 100 * i, t_epoch + 100 * i))
    shutil.rmtree(stage, ignore_errors=True)
schema = T.StructType([T.StructField("user_id", T.LongType()), T.StructField("ts", T.TimestampType())])

which = sys.argv[1] if len(sys.argv) > 1 else "both"
for label, fn in (("tws", tws.streaming_sessionize_tws), ("apip", st.streaming_sessionize)):
    if which != "both" and which != label:
        continue
    ck = tempfile.mkdtemp(prefix=f"ck_{label}_")
    t0 = time.perf_counter()
    q = (fn(spark, sdir + "/ev", schema, gap_minutes=30,
            source_options={"maxFilesPerTrigger": "1"})
         .writeStream.format("noop").outputMode("update")
         .option("checkpointLocation", ck).start())
    q.processAllAvailable()
    t = time.perf_counter() - t0
    progs = [p for p in q.recentProgress if p.get("stateOperators")]
    prog = progs[-1] if progs else (q.lastProgress or {})
    so = (prog.get("stateOperators") or [{}])[0]
    q.stop()
    print(f"{label}: t_replay={t:.1f}s state_rows={so.get('numRowsTotal')}", flush=True)
    shutil.rmtree(ck, ignore_errors=True)
shutil.rmtree(sdir, ignore_errors=True)
