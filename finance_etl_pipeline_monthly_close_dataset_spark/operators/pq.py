"""Product quantization (PQ) + asymmetric-distance (ADC) top-k search.

The memory-bound member of the engine's ANN family (exact
``cosine_topk``, hyperplane LSH, and IVF live in ``similarity.py``):
PQ splits a ``dim``-float vector into ``m`` subvectors, replaces each
with the index of its nearest codeword from a per-subspace codebook of
``k_codes`` entries, and searches over the codes with per-query
distance TABLES instead of the raw floats (Jegou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 -- public
method). No reference counterpart: the reference repo
(`/root/reference`, finance close pipeline) has no vector operators;
this extends the training-data side of the engine.

Scale shape, explicitly:

* **Compression is the point.** dim=64 float32 = 256 bytes/vector;
  m=4 one-byte codes = 4 bytes/vector -- 64x. At 100 TB of raw
  embeddings the codes table is ~1.6 TB and fits cluster memory,
  which is what makes the ADC scan a memory-bandwidth problem instead
  of an I/O problem.
* **Encoding is map-side.** Codebooks are tiny literals
  (m * k_codes * sub doubles); the argmin per subspace is a
  whole-stage-codegen expression over the vector column. No shuffle,
  no UDF.
* **ADC search is one bounded broadcast.** Each query precomputes its
  m x k_codes distance table (again map-side); the query set
  broadcasts and the codes table never shuffles -- per pair the work
  is m array lookups + (m-1) adds. One shuffle ranks within each
  query partition.
* **Determinism / oracle-exactness.** Codebooks are the ``k_codes``
  vectors with the smallest md5("pq:" || id) keys (random-sampling
  codebook init, the standard PQ baseline before Lloyd refinement --
  the engine's ``kmeans.py`` can refine, but then the oracle could
  not re-derive the books in SQL). All float math is pinned
  engine-portable: per-element ``(a-b)*(a-b)`` then a LEFT FOLD from
  a 0.0 seed (both Spark ``aggregate`` and DuckDB ``list_reduce``
  fold left; 0.0 + x == x exactly), argmin via first-index-of-min
  (ties -> smallest codeword index in both engines), and the ranked
  distance quantized to BIGINT micros BEFORE ranking (the r10
  micro_rank lesson: rank on the quantized integer, never on a raw
  double).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def pq_seed_codebooks(
    vecs: DataFrame,
    dim: int,
    m: int = 4,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic codebooks: the ``k_codes`` seed vectors are those
    with the smallest md5("pq:" || id) keys (ties -> smallest id), cut
    into ``m`` subvectors. Returns ``books[s][j]`` = codeword ``j``
    (0-based here; codes are 1-based downstream) of subspace ``s``.

    Bounded collect: exactly ``k_codes`` rows reach the driver (same
    contract as the IVF centroid collect in ``similarity.ivf_topk``).
    """
    seeds = (
        vecs.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn(
            "_h", F.md5(F.concat(F.lit("pq:"), F.col("_id").cast("string")))
        )
        .orderBy("_h", "_id")
        .limit(k_codes)
        .collect()
    )
    if len(seeds) < k_codes:
        raise ValueError(
            f"need at least {k_codes} vectors to seed the codebooks, "
            f"got {len(seeds)}"
        )
    sub = dim // m
    if sub * m != dim:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    return [
        [
            [float(x) for x in row["_v"][s * sub : (s + 1) * sub]]
            for row in seeds
        ]
        for s in range(m)
    ]


def _codeword_sql(cw: list[float]) -> str:
    """A codeword as a double-array literal. ``repr(float)`` is the
    shortest round-trip decimal, and decimal->double parsing is
    correctly rounded in both engines, so the literal reproduces the
    exact stored double."""
    return "array(" + ", ".join(f"cast({v!r} as double)" for v in cw) + ")"


def _l2sq_sql(subvec_expr: str, cw: list[float]) -> str:
    """L2^2 between a subvector expression and a codeword literal:
    per-element (a-b)*(a-b), left fold from 0.0 -- the pinned
    engine-portable float discipline."""
    return (
        f"aggregate(zip_with({subvec_expr}, {_codeword_sql(cw)}, "
        "(a, b) -> (a - b) * (a - b)), cast(0.0 as double), "
        "(acc, x) -> acc + x)"
    )


def _subvec_sql(vec_col: str, s: int, sub: int) -> str:
    return (
        f"transform(slice({vec_col}, {s * sub + 1}, {sub}), "
        "x -> cast(x as double))"
    )


def pq_encode(
    vecs: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to ``m`` 1-based codes ``code_0 .. code_{m-1}``
    (1-based so the code doubles as an ``element_at`` index into the
    per-query distance table). Argmin = first index achieving the
    array minimum, so distance ties break toward the smaller codeword
    index in every engine. Map-side only."""
    m = len(books)
    sub = len(books[0][0])
    out = vecs.select(F.col(id_col), F.col(vec_col))
    for s in range(m):
        dists = (
            "array("
            + ", ".join(
                _l2sq_sql(_subvec_sql(vec_col, s, sub), cw) for cw in books[s]
            )
            + ")"
        )
        out = out.withColumn(f"_pqd{s}", F.expr(dists)).withColumn(
            f"code_{s}",
            F.expr(
                f"cast(array_position(_pqd{s}, array_min(_pqd{s})) as int)"
            ),
        ).drop(f"_pqd{s}")
    return out.drop(vec_col)


def pq_adc_topk(
    corpus: DataFrame,
    probes: DataFrame,
    books: list[list[list[float]]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Asymmetric-distance top-k: probes stay float, the corpus is its
    PQ codes. Each probe precomputes ``dt_s[j]`` = L2^2(probe subvector
    ``s``, codeword ``j``) map-side; the approximate distance to a
    corpus vector is the explicit left-to-right sum of its ``m`` table
    lookups, quantized to BIGINT micros BEFORE ranking. Probes must be
    small (broadcast); the codes table never shuffles; one shuffle
    ranks within each probe partition. Ties break on neighbor id."""
    m = len(books)
    sub = len(books[0][0])
    codes = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        *[F.col(f"code_{s}") for s in range(m)],
    )
    p = probes.select(
        F.col(probe_id_col).alias("probe_id"),
        *[
            F.expr(
                "array("
                + ", ".join(
                    _l2sq_sql(_subvec_sql(vec_col, s, sub), cw)
                    for cw in books[s]
                )
                + ")"
            ).alias(f"_dt{s}")
            for s in range(m)
        ],
    )
    adc = " + ".join(f"element_at(_dt{s}, code_{s})" for s in range(m))
    scored = codes.join(F.broadcast(p)).select(
        "probe_id",
        "neighbor_id",
        F.expr(
            f"cast(floor(({adc}) * 1000000.0 + 0.5) as bigint)"
        ).alias("adc_micro"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc_micro").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "adc_micro", "rank")
    )
