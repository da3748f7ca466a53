"""Decompose the applyInPandasWithState per-group floor.
Variants of the per-group fn at fixed volume, core-sized partitions:
  full      -- the real sessionizer
  noout     -- real state logic, emit EMPTY frame (isolates output build+ser)
  minimal   -- consume iterator, constant state update, empty frame
              (pure harness floor: anything left is framework cost)
Usage: python /tmp/stream_floor.py [n_events] [n_users]
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import pandas as pd
from finance_etl_pipeline_monthly_close_dataset_spark.session import get_spark
from finance_etl_pipeline_monthly_close_dataset_spark.streaming import stateful as st
import bench

n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

real = st._sessionize_group

def noout(gap_seconds, use_timeout):
    inner = real(gap_seconds, use_timeout)
    def fn(key, pdfs, state):
        for out in inner(key, pdfs, state):
            yield out.iloc[0:0]
    return fn

def minimal(gap_seconds, use_timeout):
    empty = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                          "ts": pd.Series([], dtype="datetime64[ns]"),
                          "session_id": pd.Series([], dtype="int64")})
    def fn(key, pdfs, state):
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((0, n))
        yield empty
    return fn

spark = get_spark(app_name="stream_floor", shuffle_partitions=8)
for label, factory in (("minimal", minimal), ("noout", noout), ("full", real)):
    st._sessionize_group = factory
    r = bench._stream_state_bench(spark, n_events=n_events, n_users=n_users)
    print(label, {lb: (r[lb]["t_replay"], r[lb]["state_rows"]) for lb in ("hdfs", "rocksdb")}, flush=True)
st._sessionize_group = real
