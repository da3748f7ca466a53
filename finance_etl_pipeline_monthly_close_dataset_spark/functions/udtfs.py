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


chunk_text_udtf = udtf(
    _ChunkText,
    returnType="doc_id bigint, chunk_ix int, chunk string",
    useArrow=True,
)


def register_udtfs(spark) -> None:
    """Idempotently register the engine's UDTFs for SQL use."""
    spark.udtf.register("chunk_text", chunk_text_udtf)
