"""Sliding-window chunking + int8 quantization edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_etl_pipeline_monthly_close_dataset_spark.operators.chunking import (
    chunk_documents,
    quantize_embeddings_int8,
)
import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_short_doc_single_chunk(spark):
    df = _docs(spark, [(1, "a b c")])
    out = chunk_documents(df, chunk_size=4, stride=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.chunk_idx, r.start_token, r.chunk_tokens) == (0, 1, 3)


def test_exact_fit_no_overflow_chunk(spark):
    # doc of exactly chunk_size tokens must emit ONE chunk, not a
    # redundant tail window contained in the first
    df = _docs(spark, [(1, "a b c d")])
    out = chunk_documents(df, chunk_size=4, stride=3).collect()
    assert len(out) == 1


def test_overflow_windows_cover_all_tokens(spark):
    # 10 tokens, chunk 4, stride 3 -> ceil((10-4)/3)+1 = 3 chunks,
    # starts 1,4,7; last chunk covers tokens 7..10 (the full tail)
    text = " ".join(f"t{i}" for i in range(10))
    out = (
        chunk_documents(_docs(spark, [(1, text)]), chunk_size=4, stride=3)
        .orderBy("chunk_idx")
        .collect()
    )
    assert [r.start_token for r in out] == [1, 4, 7]
    assert [r.chunk_tokens for r in out] == [4, 4, 4]


def test_empty_doc_emits_one_empty_chunk(spark):
    out = chunk_documents(_docs(spark, [(1, "")]), chunk_size=4, stride=3).collect()
    assert len(out) == 1
    assert out[0].chunk_tokens == 0


def test_chunk_hash_is_content_addressed(spark):
    df = _docs(spark, [(1, "x y z"), (2, "x y z"), (3, "x y q")])
    out = chunk_documents(df, chunk_size=8, stride=8).collect()
    hashes = {r.doc_id: r.chunk_hash for r in out}
    assert hashes[1] == hashes[2]
    assert hashes[1] != hashes[3]


def test_bad_stride_rejected(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), chunk_size=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), chunk_size=4, stride=0)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_quantize_spans_full_code_range(spark):
    out = quantize_embeddings_int8(_vecs(spark, [(1, [0.0, 0.5, 1.0])])).collect()[0]
    assert (out.code_min, out.code_max, out.n_dims) == (0, 255, 3)
    assert out.code_sum == 0 + 128 + 255


def test_quantize_constant_vector_is_all_zero(spark):
    # degenerate scale (max == min) must not divide by zero
    out = quantize_embeddings_int8(_vecs(spark, [(1, [2.5, 2.5, 2.5])])).collect()[0]
    assert (out.code_min, out.code_max, out.code_sum) == (0, 0, 0)


def test_chunking_plan_has_no_shuffle(spark):
    df = _docs(spark, [(1, "a b c d e f g h")])
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_hash_embeddings_match_driver_mirror(spark):
    """A short (single-chunk) document's in-plan chunk embedding must
    equal the driver-side probe mirror (same tokenizer, hash, bucket
    and sign bits), and a multi-chunk doc embeds each window over the
    staged hash slice (chunk 1 covers tokens 49..112 of 120)."""
    from finance_etl_pipeline_monthly_close_dataset_spark.operators.retrieval import (
        chunk_hash_embeddings,
        embed_text,
    )

    short = "Spark WINDOW merge   join spark"
    long_toks = " ".join(f"tok{i % 9}" for i in range(120))
    df = spark.createDataFrame(
        [(1, short), (2, long_toks)], "doc_id long, text string"
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_hash_embeddings(df, dim=8).collect()
    }
    got = [rows[(1, 0)][f"f{d}"] for d in range(8)]
    assert got == embed_text(short, dim=8)
    assert rows[(1, 0)]["chunk_tokens"] == 5

    toks = long_toks.split()
    assert (2, 1) in rows and rows[(2, 1)]["chunk_tokens"] == 64
    want = embed_text(" ".join(toks[48:112]), dim=8)
    assert [rows[(2, 1)][f"f{d}"] for d in range(8)] == want
