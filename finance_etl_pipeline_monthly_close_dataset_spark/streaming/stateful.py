"""Custom stateful streaming operator: incremental gap-based
sessionization via ``applyInPandasWithState``.

The batch sessionizer (``events.sessionize``) needs the whole history
of a user to number sessions; a stream cannot replay history per
micro-batch. This operator keeps O(1) state per user -- the last seen
event time and the running session counter -- and assigns session ids
incrementally: arrow-batched per group, update output mode, with an
idle-processing-timeout that finalizes (emits and clears) sessions for
users who go quiet.

Scale: state is two scalars per user key, partitioned by user_id
across executors by the streaming state store; per-batch work is a
sort of that user's new events only. Hot users are bounded by their
own event rate, not history size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("session_id", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_micros", T.LongType()),
        T.StructField("session_id", T.LongType()),
    ]
)


def _sessionize_group(gap_seconds: int, use_timeout: bool):
    """Build the per-group stateful function (closure over the gap)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last_ts, session_id = state.get if state.exists else (None, 0)
        out_ts: list[pd.Timestamp] = []
        out_sid: list[int] = []
        # Concatenate the key's whole micro-batch and sort ONCE:
        # chunked Arrow delivery with interleaved times would
        # otherwise mis-number order-sensitive session ids.
        chunks = [pdf for pdf in pdfs]
        all_ts = pd.concat([pdf["ts"] for pdf in chunks]) if chunks else pd.Series([], dtype="datetime64[ns]")
        for ts in all_ts.sort_values():
            ts_micros = int(ts.value // 1000)
            if last_ts is None or ts_micros - last_ts > gap_seconds * 1_000_000:
                session_id += 1
            last_ts = ts_micros
            out_ts.append(ts)
            out_sid.append(session_id)
        state.update((last_ts, session_id))
        if use_timeout:
            state.setTimeoutDuration(gap_seconds * 1000)
        yield pd.DataFrame(
            {"user_id": key[0], "ts": out_ts, "session_id": out_sid}
        )

    return fn


def streaming_sessionize(
    spark: SparkSession,
    parquet_dir: str,
    schema: T.StructType,
    gap_minutes: float = 30,
    idle_timeout: bool = False,
    source_options: dict | None = None,
) -> DataFrame:
    """File-source stream -> per-user incremental session assignment.

    Returns the unstarted streaming DataFrame; callers attach a sink
    (tests use a memory sink in update mode). Session ids match the
    batch ``events.sessionize`` when events arrive in order -- the
    same lag/gap recurrence evaluated incrementally.

    ``idle_timeout=True`` arms a processing-time timeout that clears
    state for users idle longer than the gap (bounds state size on an
    unbounded production stream). Leave it off for bounded replays:
    pending timeouts keep scheduling no-data micro-batches, so
    ``processAllAvailable`` would never settle.
    """
    reader = spark.readStream.schema(schema)
    for k, v in (source_options or {}).items():
        # e.g. maxFilesPerTrigger=1 to force one micro-batch per file
        # (files are consumed oldest-mtime-first, so a replay can pin
        # cross-batch delivery order by staging file mtimes)
        reader = reader.option(k, v)
    stream = reader.parquet(parquet_dir)
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if idle_timeout else GroupStateTimeout.NoTimeout
    )
    # fractional gap_minutes supported so TTL tests can run second-
    # scale timeouts; production callers pass whole minutes unchanged
    gap_seconds = max(1, int(round(gap_minutes * 60)))
    return (
        stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group(gap_seconds, idle_timeout),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
