"""Python UDTFs: the engine's table-function extension point.

Spark 4 lets users register Python classes as table-valued functions
invocable from SQL (``SELECT ... FROM tbl, LATERAL my_udtf(col, ...)``)
-- the extension seam a reference user reaches for when an operator
doesn't exist yet.  This module pins the engine's usage shape: Arrow-
batched (``useArrow=True`` -- the plan shows ArrowEvalPythonUDTF, not
the row-at-a-time BatchEvalPython the plan lint bans), deterministic,
and oracle-paired (``docs_chunks_udtf``).

The hot-path rule still applies: the PRODUCTION chunker is the pure-
expression ``operators/chunking.py`` (JVM-side, whole-stage codegen);
the UDTF form exists to keep the extension point itself tested, so a
user-supplied table function has a working, plan-audited template to
follow.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


class _ChunkText:
    """Fixed-width character chunker with stride: one output row per
    chunk.  Pure function of its arguments (declared deterministic),
    so Catalyst may cache/reorder it freely."""

    def eval(self, doc_id, text, width: int, step: int):  # noqa: ANN001
        if text is None or step <= 0:
            return
        ix = 0
        for start in range(0, len(text), step):
            yield doc_id, ix, text[start : start + width]
            ix += 1


# udtf() defaults to deterministic=False; both functions are pure, so
# mark them deterministic for real -- otherwise Catalyst refuses the
# predicate pushdown / reuse the docstrings promise
chunk_text_udtf = udtf(
    _ChunkText,
    returnType="doc_id bigint, chunk_ix int, chunk string",
    useArrow=True,
).asDeterministic()


def register_udtfs(spark) -> None:
    """Idempotently register the engine's UDTFs for SQL use."""
    spark.udtf.register("chunk_text", chunk_text_udtf)
    spark.udtf.register("user_session_stats", user_session_stats_udtf)


class _UserSessionStats:
    """TABLE-argument UDTF: consumes one user's events in event-time
    order (``PARTITION BY user_id ORDER BY ts``) and emits a single
    summary row from ``terminate()`` -- sessions counted with a
    30-minute inactivity gap.  The per-partition state is three
    scalars, so memory is O(1) per user regardless of event count."""

    GAP_SECONDS = 1800

    def __init__(self) -> None:
        self._user = None
        self._last = None
        self._sessions = 0
        self._events = 0

    def eval(self, row):  # noqa: ANN001
        user_id, ts = row["user_id"], row["ts"]
        if ts is None:
            return
        self._user = user_id
        if (
            self._last is None
            or (ts - self._last).total_seconds() > self.GAP_SECONDS
        ):
            self._sessions += 1
        self._last = ts
        self._events += 1

    def terminate(self):
        if self._events:
            yield self._user, self._sessions, self._events


user_session_stats_udtf = udtf(
    _UserSessionStats,
    returnType="user_id bigint, n_sessions int, n_events int",
    useArrow=True,
).asDeterministic()
