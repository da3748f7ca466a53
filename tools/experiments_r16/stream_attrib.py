"""r16 item #3: attribute the r15 stream_state 70->24s win between
config (state partitions) and code (vectorized gap scan).
Runs _stream_state_bench 4 ways: {old loop, new loop} x {8 parts, core parts}.
Usage: python /tmp/stream_attrib.py [n_events]
"""
import sys, time
sys.path.insert(0, "/root/repo")
from collections.abc import Iterator
import pandas as pd
from finance_etl_pipeline_monthly_close_dataset_spark.session import get_spark
from finance_etl_pipeline_monthly_close_dataset_spark.streaming import stateful as st
import bench

def old_sessionize_group(gap_seconds, use_timeout):
    def fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove(); return
        last_ts, session_id = state.get if state.exists else (None, 0)
        out_ts, out_sid = [], []
        chunks = [pdf for pdf in pdfs]
        all_ts = pd.concat([pdf["ts"] for pdf in chunks]) if chunks else pd.Series([], dtype="datetime64[ns]")
        for ts in all_ts.sort_values():
            ts_micros = int(ts.value // 1000)
            if last_ts is None or ts_micros - last_ts > gap_seconds * 1_000_000:
                session_id += 1
            last_ts = ts_micros
            out_ts.append(ts); out_sid.append(session_id)
        state.update((last_ts, session_id))
        if use_timeout:
            state.setTimeoutDuration(gap_seconds * 1000)
        yield pd.DataFrame({"user_id": key[0], "ts": out_ts, "session_id": out_sid})
    return fn

n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
spark = get_spark(app_name="stream_attrib", shuffle_partitions=8)
new_fn = st._sessionize_group
import types

results = {}
for code_label, fn in (("new", new_fn), ("old", old_sessionize_group)):
    st._sessionize_group = fn
    for parts_label in ("core", "8"):
        if parts_label == "8":
            # neutralize the bench's core-sizing for this run
            orig = spark.sparkContext.defaultParallelism
            # monkeypatch: _stream_state_bench sets shuffle partitions to
            # defaultParallelism; to force 8 we pre-set and patch the set call
            import unittest.mock as mock
            real_set = spark.conf.set
            def patched_set(k, v, _real=real_set):
                if k == "spark.sql.shuffle.partitions":
                    v = "8"
                return _real(k, v)
            spark.conf.set = patched_set
        try:
            r = bench._stream_state_bench(spark, n_events=n_events)
        finally:
            if parts_label == "8":
                spark.conf.set = real_set
        key = f"{code_label}_loop/{parts_label}_parts"
        results[key] = {lb: (r[lb]["t_replay"], r[lb]["state_rows"]) for lb in ("hdfs", "rocksdb")}
        print(key, results[key], flush=True)
print("SUMMARY")
for k, v in results.items():
    print(k, v)
