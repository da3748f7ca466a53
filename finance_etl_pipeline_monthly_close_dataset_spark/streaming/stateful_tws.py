"""Incremental gap-sessionization on Spark 4's ``transformWithState``
API -- the successor to ``applyInPandasWithState`` (see
``streaming/stateful.py`` for that implementation of the SAME
semantics; both are kept: the old API for parity with deployed
pipelines, this one as the forward path).

What the new API buys at 100 TB:

* **Typed, named state** (``getValueState`` with a schema) instead of
  one opaque tuple -- multiple states per key compose without manual
  packing, and the state store can evolve schemas.
* **Native state TTL** (``ttlDurationMs``): the store itself expires
  idle keys -- no hand-rolled timeout plumbing in the processor, and
  (unlike ``GroupState`` processing-time timeouts) no extra no-data
  micro-batches are needed just to observe the expiry.
* The same O(1)-per-key scale story: state is two scalars per user,
  partitioned across executors by the state store; per-batch work is
  each user's new events only.

Session semantics are identical to ``streaming_sessionize``: events
more than ``gap`` apart open a new session; session ids stitch across
micro-batches via the state store; ids match the batch lag/gap
recurrence when events arrive in order.

ENVIRONMENT GATE: ``transformWithState``'s Python<->JVM state
transport is protobuf-based, and ``google.protobuf`` is not installed
in this container (verified: the streaming runner crashes with
``ImportError: cannot import name 'descriptor'`` during operator
pre-init).  ``streaming_sessionize_tws`` therefore raises
``NotImplementedError`` where protobuf is absent -- the same gate
pattern as ``multimodal.decode_images_real`` (PIL) -- and activates
unchanged wherever protobuf is installed.  The PROCESSOR logic is
real and tested here regardless: ``SessionizeProcessor`` is exercised
directly against a fake value-state handle
(``test_tws_sessionize_processor_logic``), which pins the same
cross-batch stitching recurrence the applyInPandasWithState path
verifies end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("session_id", T.LongType()),
    ]
)


class SessionizeProcessor(StatefulProcessor):
    """Per-user (last event time, session counter) value state; new
    session whenever the gap to the previous event exceeds
    ``gap_seconds``.  ``ttl_ms`` (optional) lets the state store
    evict idle users natively."""

    def __init__(self, gap_seconds: int, ttl_ms: int | None = None):
        self.gap_us = int(gap_seconds) * 1_000_000
        self.ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState(
            "session",
            "last_ts_micros LONG, session_id LONG",
            ttlDurationMs=self.ttl_ms,
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        import numpy as np

        if self.state.exists():
            last_ts, session_id = self.state.get()
        else:
            last_ts, session_id = None, 0
        # A micro-batch may arrive as several Arrow chunks with
        # interleaved times; session ids are order-sensitive, so
        # concatenate the key's whole batch and sort ONCE before
        # assigning (per-chunk sorting would mis-number sessions
        # whenever chunks interleave).
        chunks = [pdf["ts"] for pdf in rows]
        all_ts = (
            chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        ) if chunks else pd.Series([], dtype="datetime64[ns]")
        all_ts = all_ts.sort_values(ignore_index=True)
        n = len(all_ts)
        if n:
            # vectorized gap scan (r16, same shape as stateful.py's
            # r15 rewrite): one int64 diff + cumsum instead of a
            # per-event Python loop; .value semantics preserved (ns
            # regardless of series unit)
            us = all_ts.astype("datetime64[ns]").astype("int64").to_numpy() // 1000
            new_session = np.empty(n, dtype=bool)
            new_session[0] = last_ts is None or us[0] - last_ts > self.gap_us
            if n > 1:
                np.greater(us[1:] - us[:-1], self.gap_us, out=new_session[1:])
            sids = session_id + np.cumsum(new_session)
            last_ts = int(us[-1])
            session_id = int(sids[-1])
        else:
            sids = np.empty(0, dtype=np.int64)
        self.state.update((last_ts, session_id))
        yield pd.DataFrame(
            {"user_id": key[0], "ts": all_ts, "session_id": sids}
        )

    def close(self) -> None:
        pass


def streaming_sessionize_tws(
    spark: SparkSession,
    parquet_dir: str,
    schema: T.StructType,
    gap_minutes: float = 30,
    ttl_minutes: float | None = None,
    source_options: dict | None = None,
) -> DataFrame:
    """File-source stream -> per-user incremental session assignment
    via ``transformWithStateInPandas``.  Returns the unstarted
    streaming DataFrame; callers attach a sink (tests/contract use a
    memory sink in update mode).  ``ttl_minutes`` arms native state
    TTL -- an idle user's state expires in the store and its next
    event starts over at session 1.

    Raises ``NotImplementedError`` where ``google.protobuf`` is
    absent: the transformWithState runtime cannot initialize its
    state transport without it.  Since r16 this container HAS a
    protobuf runtime (``tools/install_protobuf_shim.py`` installs the
    machine's vendored pure-Python copy), so the e2e test runs.  The
    operator additionally requires the **RocksDB state store
    provider** (``spark.sql.streaming.stateStore.providerClass``):
    transformWithState keeps named states in column families, which
    the HDFS-backed provider rejects at query start.

    Measured at the bench shape (r16, 2M events / 50k users / 4
    batches, RocksDB, core-sized state partitions): t_replay 38.8 s vs
    applyInPandasWithState's 26.6 s -- the per-key state-server RPCs
    (exists/get/update round a socket per key per batch) plus the
    pure-Python protobuf serialization cost MORE than the old API's
    inline state columns at this group count, so the apip path remains
    the bench/production default and this operator stays the
    API-forward alternative."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf for its "
            "state transport, which is not installed in this container. "
            "Use streaming.stateful.streaming_sessionize "
            "(applyInPandasWithState, same semantics) here; this "
            "operator activates unchanged wherever protobuf is installed."
        ) from exc
    reader = spark.readStream.schema(schema)
    for k, v in (source_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.parquet(parquet_dir)
    gap_seconds = max(1, int(round(gap_minutes * 60)))
    ttl_ms = None if ttl_minutes is None else max(1, int(round(ttl_minutes * 60_000)))
    return (
        stream.select("user_id", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionizeProcessor(gap_seconds, ttl_ms),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="ProcessingTime" if ttl_ms is not None else "None",
        )
    )
