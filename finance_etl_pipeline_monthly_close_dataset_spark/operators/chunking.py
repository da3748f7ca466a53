"""Sliding-window document chunking for LLM context preparation.

Splits each document's token stream into fixed-size windows with
overlap (HF-datasets ``return_overflowing_tokens`` semantics): chunk k
covers tokens ``[1 + k*stride, 1 + k*stride + chunk_size)``; the last
chunk may be short; a document never emits a window that starts past
its end, and every document emits at least one chunk.

Everything is built-in Catalyst array expressions (split / transform /
slice / posexplode) -- whole-stage-codegen'd, no Python UDFs, no
shuffle at all: chunking is a pure per-row flatMap, so it scales
embarrassingly with a 100 TB documents table and the output is
partition-aligned with the input (downstream tokenize/pack stages
inherit the partitioning for free).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def chunk_count(n_tokens: Column, chunk_size: int, stride: int) -> Column:
    """Number of sliding windows over ``n_tokens`` tokens:
    ``max(ceil((n - chunk_size) / stride), 0) + 1`` -- the standard
    overflow-window count (1 window when the doc fits, never a window
    fully contained in the previous one)."""
    extra = F.ceil((n_tokens - F.lit(chunk_size)) / F.lit(float(stride)))
    return F.greatest(extra, F.lit(0)).cast("int") + F.lit(1)


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode documents into (doc_id, chunk_idx, start_token,
    chunk_tokens, chunk_hash) rows.

    ``chunk_hash`` is the md5 of the space-joined window -- a portable
    chunk fingerprint any engine reproduces, so chunk-level dedup can
    run downstream without carrying the text.
    """
    if stride <= 0 or chunk_size <= 0 or stride > chunk_size:
        raise ValueError("need 0 < stride <= chunk_size")
    toks = tokens(F.col(text_col))
    staged = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        chunk_count(F.size(toks), chunk_size, stride).alias("_n_chunks"),
    )
    exploded = staged.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), F.col("_n_chunks") - 1)).alias(
            "chunk_idx", "_k"
        ),
        F.col("_toks"),
    )
    start = F.col("chunk_idx") * stride + 1
    window = F.slice(F.col("_toks"), start, chunk_size)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx"),
        start.alias("start_token"),
        F.size(window).alias("chunk_tokens"),
        F.md5(F.array_join(window, " ")).alias("chunk_hash"),
    )


def quantize_embeddings_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector min/max int8 (0..255) quantization summary.

    Training-data pipelines quantize embedding columns to cut storage
    4x before ANN indexing; this emits the quantized codes' exact
    integer summary (sum / min / max / dims) per vector so correctness
    is checkable cross-engine without floating-point hash hazards.
    All math is double-precision IEEE (cast from float32 first), so
    any engine computes bit-identical codes. Pure per-row map -- no
    shuffle, scales linearly.

    The min/max scalars and the codes array are staged through
    explicit projections: inlined into the per-element lambda they are
    recomputed for EVERY element (O(d^2) per row -- measured 38x
    slower at 1M x 64d; CollapseProject keeps multi-referenced
    non-trivial aliases staged, which is what this leans on).
    """
    staged = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    ).select(
        id_col, "_v", F.array_min("_v").alias("_mn"), F.array_max("_v").alias("_mx")
    ).select(
        id_col,
        "_v",
        "_mn",
        ((F.col("_mx") - F.col("_mn")) / F.lit(255.0)).alias("_scale"),
    )
    codes = F.transform(
        F.col("_v"),
        lambda v: F.when(F.col("_scale") == 0, F.lit(0)).otherwise(
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.floor((v - F.col("_mn")) / F.col("_scale") + F.lit(0.5)),
                ),
            )
        ).cast("int"),
    )
    return staged.select(
        F.col(id_col), F.size("_v").alias("n_dims"), codes.alias("_codes")
    ).select(
        id_col,
        "n_dims",
        F.aggregate(F.col("_codes"), F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "code_sum"
        ),
        F.array_min("_codes").alias("code_min"),
        F.array_max("_codes").alias("code_max"),
    )
