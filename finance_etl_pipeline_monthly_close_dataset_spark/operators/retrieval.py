"""RAG-shaped chunk retrieval: chunk -> hash-embed -> cosine top-k.

The end-to-end retrieval-preparation pipeline over the documents
table, composed from the engine's own primitives:

1. sliding-window chunking (``chunking.chunk_documents`` semantics:
   size/stride token windows);
2. feature-hash embedding of EVERY CHUNK (the hashing trick of
   ``text_analysis.feature_hash_embedding``, applied per window);
3. exact cosine top-k of a probe query's embedding against the chunk
   vectors.

Everything through the embedding is EXPRESSION-ONLY and zero-shuffle:
tokens are projected once, per-token 60-bit portable hashes are staged
once (Catalyst does not CSE through higher-order-function lambdas --
the PLANS.md quantization lesson -- so the hash array is materialized
in a projection before the per-dimension aggregates consume it), and
each chunk's signed-count vector folds over an array slice with
``F.aggregate``. The only shuffle in the whole retrieval is the final
top-k rank -- and the ranked input is (id, dim scalars), never text.

At 100 TB: chunks never leave their scan partition until they are
dim-wide integer rows; per-probe ranking is a TakeOrderedAndProject.
For probe BATCHES, broadcast the probe matrix and reuse
``similarity.cosine_topk``'s shape over the chunk vectors instead of
one rank per probe.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .chunking import chunk_count
from .dedup import portable_token_hash
from .text import tokens


def embed_text(text: str, dim: int = 8) -> list[int]:
    """Driver-side mirror of the feature-hash embedding for probe
    strings: same tokenizer (lowercase, whitespace), same 60-bit md5
    hash, same bucket/sign bits -- so a probe embedded here is
    bit-identical to a document embedded in-plan."""
    if dim & (dim - 1):
        raise ValueError("dim must be a power of two")
    shift = dim.bit_length() - 1
    vec = [0] * dim
    for tok in (t for t in text.lower().strip().split() if t):
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        sign = 1 if ((h >> shift) & 1) == 0 else -1
        vec[h & (dim - 1)] += sign
    return vec


def _sign(h: Column, shift: int) -> Column:
    return F.when(
        F.shiftright(h, shift).bitwiseAND(F.lit(1)) == 0, F.lit(1)
    ).otherwise(F.lit(-1))


def chunk_hash_embeddings(
    df: DataFrame,
    dim: int = 8,
    chunk_size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-chunk feature-hash embeddings as ``dim`` integer columns
    (f0..f{dim-1}) plus ``chunk_tokens`` -- zero shuffle: hash array
    staged once per document, sliced per chunk, folded per dimension.
    """
    if dim & (dim - 1):
        raise ValueError("dim must be a power of two")
    shift = dim.bit_length() - 1
    toks = tokens(F.col(text_col))
    staged = df.select(
        F.col(id_col),
        # one md5 per token for the whole document, shared by every
        # chunk and every dimension below (HOF-CSE hazard: staged as a
        # real projection, not re-derived inside each lambda)
        F.transform(toks, lambda t: portable_token_hash(t)).alias("_hs"),
        chunk_count(F.size(toks), chunk_size, stride).alias("_n"),
    )
    sliced = staged.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("chunk_idx", "_k"),
        F.col("_hs"),
    ).select(
        F.col(id_col),
        "chunk_idx",
        F.slice(F.col("_hs"), F.col("chunk_idx") * stride + 1, chunk_size).alias("_sl"),
    )
    def dim_sum(d: int) -> Column:
        # closure (not a default arg: PySpark reads lambda arity from
        # the signature, so a bound default would make it 3-ary)
        return F.aggregate(
            F.col("_sl"),
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(dim - 1)) == d, _sign(h, shift)).otherwise(
                F.lit(0)
            ),
        ).alias(f"f{d}")

    sums = [dim_sum(d) for d in range(dim)]
    return sliced.select(
        F.col(id_col), "chunk_idx", F.size("_sl").alias("chunk_tokens"), *sums
    )


def chunk_retrieval_topk(
    df: DataFrame,
    probe_text: str,
    k: int = 10,
    dim: int = 8,
    chunk_size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact cosine top-k chunks for one probe string. The dot product
    and norms unroll over the ``dim`` scalar columns in fixed order
    (left-assoc adds over exact integer products), so every engine
    computes bit-identical doubles; ties rank by (id, chunk_idx)."""
    pv = embed_text(probe_text, dim)
    psumsq = sum(x * x for x in pv)
    if psumsq == 0:
        raise ValueError("probe text embeds to the zero vector")
    emb = chunk_hash_embeddings(df, dim, chunk_size, stride, id_col, text_col)
    dot: Column = F.lit(0.0)
    sumsq: Column = F.lit(0.0)
    for d in range(dim):
        fd = F.col(f"f{d}").cast("double")
        dot = dot + fd * F.lit(float(pv[d]))
        sumsq = sumsq + fd * fd
    sim = dot / (F.sqrt(sumsq) * F.lit(math.sqrt(float(psumsq))))
    # Zero-norm chunks are excluded WITHOUT a pre-filter (r15): the
    # old ``filter(sumsq > 0)`` was pushed below the embedding
    # projection, so every f_d aggregate ran once in the filter and
    # again in the projection (guide SS4.4's duplication, expression
    # flavor -- measured 1.08 -> 0.69 s at sf0.1).  Equivalent form:
    # sumsq == 0 (or null) makes _sim NULL (non-ANSI /0), DESC ranks
    # NULLS LAST, so the top-k prefix holds exactly the
    # min(k, n_valid) valid rows the filtered form kept -- dropping
    # null sims after the limit is set-identical for ANY data, and the
    # rank window numbers the survivors contiguously either way.
    scored = emb.withColumn("_sim", sim)
    # orderBy + limit plans as TakeOrderedAndProject (distributed
    # partial top-k, no global sort); the rank window then runs over
    # the k surviving rows only
    top = scored.orderBy(
        F.col("_sim").desc_nulls_last(), F.col(id_col).asc(), F.col("chunk_idx").asc()
    ).limit(k).filter(F.col("_sim").isNotNull())
    from pyspark.sql.window import Window

    w = Window.orderBy(
        F.col("_sim").desc_nulls_last(), F.col(id_col).asc(), F.col("chunk_idx").asc()
    )
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            F.col(id_col),
            "chunk_idx",
            "chunk_tokens",
            F.round("_sim", 6).alias("cosine_sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
