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


def pq_seed_codebooks_np(
    vecs: DataFrame,
    dim: int,
    m: int = 8,
    k_codes: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = False,
):
    """Codebooks as a ``(m, k_codes, dim//m)`` float64 ndarray for the
    Arrow path -- same deterministic md5 seed selection as
    ``pq_seed_codebooks`` but sized for production (k_codes=256 -> one
    byte per code; the expression form stays at k=16 because a 256-way
    argmin as a literal codegen expression is exactly the blow-up the
    Arrow path exists to avoid). ``normalize`` L2-normalizes seeds so
    ADC's L2 ordering matches cosine ordering on normalized corpora."""
    import numpy as np

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
    mat = np.array([row["_v"] for row in seeds], dtype=np.float64)
    if normalize:
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    return mat.reshape(k_codes, m, sub).transpose(1, 0, 2).copy()


def pq_encode_arrow(
    corpus: DataFrame,
    books,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = False,
) -> DataFrame:
    """Arrow-batched PQ encoder (``mapInArrow``): per batch, the
    ``(n, dim)`` block computes all-subspace squared distances against
    the ``(m, k, sub)`` codebook tensor with one broadcasted numpy
    subtraction per subspace and emits 1-based argmin codes as an
    ``array<int>`` column. The codebook rides in the closure (tiny);
    no shuffle -- encoding is embarrassingly parallel, which is what
    makes PQ index builds linear at 100 TB."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from .similarity import _vec_matrix

    m, _k, sub = books.shape
    dim = m * sub
    out_schema = (
        f"{id_col} {corpus.schema[id_col].dataType.simpleString()}, "
        "codes array<int>"
    )

    def encode(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            X = _vec_matrix(batch, vec_col, dim).astype(np.float64)
            if normalize:
                X = X / np.linalg.norm(X, axis=1, keepdims=True)
            ids = batch.column(batch.schema.get_field_index(id_col)).to_numpy(
                zero_copy_only=False
            )
            n = X.shape[0]
            codes = np.empty((n, m), dtype=np.int32)
            for s in range(m):
                Xs = X[:, s * sub : (s + 1) * sub]
                # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over c
                # drops the ||x||^2 term
                d = books[s] @ Xs.T  # (k, n)
                cn = (books[s] * books[s]).sum(axis=1)[:, None]  # (k, 1)
                codes[:, s] = np.argmin(cn - 2.0 * d, axis=0) + 1
            # buffer-level list column (guide SS4.2): one flat int32
            # buffer + an arithmetic offsets array -- the
            # from_pandas(list(codes)) form this replaces built n
            # Python row-arrays and converted them row by row
            # (measured ~2x the whole encode's Arrow cost at 1M)
            codes_arr = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int32)),
                pa.array(codes.reshape(-1)),
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), codes_arr], names=[id_col, "codes"]
            )

    from .dedup import spread_partitions

    return spread_partitions(corpus.select(id_col, vec_col)).mapInArrow(
        encode, schema=out_schema
    )


def pq_adc_topk_arrow(
    codes: DataFrame,
    probes: DataFrame,
    books,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    normalize: bool = False,
) -> DataFrame:
    """Arrow-batched ADC search over a pre-encoded codes table: probes
    collect (bounded) and precompute their ``(p, m, k)`` distance
    tables; each Arrow batch gathers per-subspace table entries by
    fancy-indexing the codes matrix and emits its local top-k per
    probe, so the shuffle carries ``partitions x probes x k`` rows --
    the codes themselves never move. A final window ranks candidates
    globally. Same candidate-flow discipline as
    ``similarity.cosine_topk_arrow``."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    m, _kc, sub = books.shape
    probe_rows = probes.select(probe_id_col, vec_col).collect()
    probe_ids = [r[0] for r in probe_rows]
    pm = np.array([r[1] for r in probe_rows], dtype=np.float64)
    if normalize:
        pm = pm / np.linalg.norm(pm, axis=1, keepdims=True)
    # dt[pi, s, j] = ||probe_sub - codeword_j||^2
    dt = np.stack(
        [
            (
                (pm[:, s * sub : (s + 1) * sub][:, None, :] - books[s][None, :, :])
                ** 2
            ).sum(axis=2)
            for s in range(m)
        ],
        axis=1,
    )

    out_schema = (
        f"probe_id {probes.schema[probe_id_col].dataType.simpleString()}, "
        f"neighbor_id {codes.schema[id_col].dataType.simpleString()}, "
        "adc_dist double"
    )

    def search(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(batch.schema.get_field_index(id_col)).to_numpy(
                zero_copy_only=False
            )
            cl = batch.column(batch.schema.get_field_index("codes"))
            cmat = np.asarray(cl.flatten()).reshape(len(ids), m) - 1  # 0-based
            frames = []
            for pi, pid in enumerate(probe_ids):
                # adc = sum_s dt[pi, s, code_s]
                adc = dt[pi, np.arange(m)[None, :], cmat].sum(axis=1)
                top = min(k, adc.shape[0])
                idx = np.argpartition(adc, top - 1)[:top]
                frames.append(
                    pd.DataFrame(
                        {
                            "probe_id": pid,
                            "neighbor_id": ids[idx],
                            "adc_dist": adc[idx],
                        }
                    )
                )
            yield pa.RecordBatch.from_pandas(
                pd.concat(frames), preserve_index=False
            )

    candidates = codes.mapInArrow(search, schema=out_schema)
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "adc_dist", "rank")
    )


def pq_adc_rerank_topk(
    corpus: DataFrame,
    codes: DataFrame,
    probes: DataFrame,
    books,
    k: int = 10,
    rerank: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    normalize: bool = False,
) -> DataFrame:
    """The standard production PQ recipe: ADC over the codes table
    shortlists ``rerank`` candidates per probe, then ONLY those
    candidates' raw vectors are re-scored with exact cosine and the
    top ``k`` win. The refetch is a broadcast semi-join of the
    (probes x rerank)-bounded candidate set against the corpus -- at
    100 TB that is the only stage touching raw floats, and it touches
    ``probes * rerank`` rows of them, not the corpus."""
    cand = pq_adc_topk_arrow(
        codes,
        probes,
        books,
        k=rerank,
        id_col=id_col,
        vec_col=vec_col,
        probe_id_col=probe_id_col,
        normalize=normalize,
    ).select("probe_id", "neighbor_id")
    return rerank_exact_cosine(
        corpus, cand, probes, k=k,
        id_col=id_col, vec_col=vec_col, probe_id_col=probe_id_col,
    )


def rerank_exact_cosine(
    corpus: DataFrame,
    cand: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact-cosine rerank of a bounded (probe_id, neighbor_id)
    candidate frame: broadcast semi-join refetches only the candidate
    vectors, exact cosine scores them, one window ranks per probe.
    Shared by the PQ and IVF-PQ shortlist+rerank recipes -- any
    approximate shortlister can feed it."""
    from .similarity import _dot, _norm

    p = probes.select(
        F.col(probe_id_col).alias("probe_id"),
        F.col(vec_col).alias("_pvec"),
        _norm(F.col(vec_col)).alias("_pnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        _norm(F.col(vec_col)).alias("_cnorm"),
    )
    scored = (
        c.join(F.broadcast(cand.select("probe_id", "neighbor_id")), on="neighbor_id")
        .join(F.broadcast(p), on="probe_id")
        .select(
            "probe_id",
            "neighbor_id",
            (
                _dot(F.col("_cvec"), F.col("_pvec"))
                / (F.col("_cnorm") * F.col("_pnorm"))
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine_sim", "rank")
    )


def ivfpq_encode_arrow(
    corpus: DataFrame,
    centroids,
    books,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = False,
) -> DataFrame:
    """IVF-PQ index build (the FAISS-style composition): one Arrow
    pass assigns each vector to its nearest coarse centroid AND
    PQ-encodes the RESIDUAL ``x - centroid[cell]`` -- residual
    encoding is what lets a shared codebook stay accurate across
    cells, since residuals live in a common origin-centered ball
    regardless of which cell a vector came from. Output per vector:
    ``(id, cell, codes)`` -- with k_cells<=2^16 and k_codes<=256 that
    is ~2 + m bytes of index per vector. Embarrassingly parallel, no
    shuffle."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from .similarity import _vec_matrix

    m, _k, sub = books.shape
    dim = m * sub
    C = np.asarray(centroids, dtype=np.float64)  # (n_cells, dim)
    cn = (C * C).sum(axis=1)[:, None]  # (n_cells, 1)
    out_schema = (
        f"{id_col} {corpus.schema[id_col].dataType.simpleString()}, "
        "cell int, codes array<int>"
    )

    def encode(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            X = _vec_matrix(batch, vec_col, dim).astype(np.float64)
            if normalize:
                X = X / np.linalg.norm(X, axis=1, keepdims=True)
            ids = batch.column(batch.schema.get_field_index(id_col)).to_numpy(
                zero_copy_only=False
            )
            cells = np.argmin(cn - 2.0 * (C @ X.T), axis=0)
            R = X - C[cells]  # residuals
            n = X.shape[0]
            codes = np.empty((n, m), dtype=np.int32)
            for s in range(m):
                Rs = R[:, s * sub : (s + 1) * sub]
                B = books[s]
                bn = (B * B).sum(axis=1)[:, None]
                codes[:, s] = np.argmin(bn - 2.0 * (B @ Rs.T), axis=0) + 1
            # buffer-level list column -- see pq_encode_arrow
            codes_arr = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int32)),
                pa.array(codes.reshape(-1)),
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(cells.astype(np.int32)), codes_arr],
                names=[id_col, "cell", "codes"],
            )

    from .dedup import spread_partitions

    return spread_partitions(corpus.select(id_col, vec_col)).mapInArrow(
        encode, schema=out_schema
    )


def ivfpq_residual_books_np(
    vecs: DataFrame,
    centroids,
    dim: int,
    m: int = 8,
    k_codes: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = False,
):
    """Residual codebooks for IVF-PQ: the same deterministic md5 seed
    selection as ``pq_seed_codebooks_np``, but each seed contributes
    its RESIDUAL against its nearest coarse centroid -- matching what
    the encoder quantizes. Bounded collect (k_codes rows)."""
    import numpy as np

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
    X = np.array([row["_v"] for row in seeds], dtype=np.float64)
    if normalize:
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = np.asarray(centroids, dtype=np.float64)
    cells = np.argmin(
        (C * C).sum(axis=1)[:, None] - 2.0 * (C @ X.T), axis=0
    )
    R = X - C[cells]
    return R.reshape(k_codes, m, sub).transpose(1, 0, 2).copy()


def ivfpq_topk_arrow(
    codes: DataFrame,
    probes: DataFrame,
    centroids,
    books,
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    normalize: bool = False,
) -> DataFrame:
    """Cell-pruned ADC search over an IVF-PQ index: each probe ranks
    the coarse centroids, keeps its ``nprobe`` nearest cells, and
    builds one residual distance table PER PROBED CELL
    (``dt[s][j] = ||(q - centroid)_s - codeword_j||^2`` -- the
    residual tables are what make shared codebooks valid across
    cells). The scan prunes to the UNION of probed cells with an
    ordinary column predicate (partition/row-group prunable when the
    codes table is laid out by cell), and within a batch each probe
    only scores rows of its own probed cells. Candidate flow matches
    ``pq_adc_topk_arrow``: local top-k per probe, one ranking
    shuffle. At fixed nprobe the scanned fraction is ~nprobe/n_cells
    of the corpus -- the sublinear regime IVF adds to PQ's
    memory-bound scan."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    m, _kc, sub = books.shape
    C = np.asarray(centroids, dtype=np.float64)
    probe_rows = probes.select(probe_id_col, vec_col).collect()
    probe_ids = [r[0] for r in probe_rows]
    pm = np.array([r[1] for r in probe_rows], dtype=np.float64)
    if normalize:
        pm = pm / np.linalg.norm(pm, axis=1, keepdims=True)
    cd = ((pm[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)  # (p, n_cells)
    probed = np.argsort(cd, axis=1)[:, :nprobe]  # (p, nprobe)
    # dt[(pi, cell)] = (m, k) residual table
    tables: dict[tuple[int, int], "np.ndarray"] = {}
    for pi in range(pm.shape[0]):
        for cell in probed[pi]:
            r = pm[pi] - C[cell]
            tables[(pi, int(cell))] = np.stack(
                [
                    (
                        (r[s * sub : (s + 1) * sub][None, :] - books[s]) ** 2
                    ).sum(axis=1)
                    for s in range(m)
                ]
            )
    all_cells = sorted({int(c) for row in probed for c in row})

    out_schema = (
        f"probe_id {probes.schema[probe_id_col].dataType.simpleString()}, "
        f"neighbor_id {codes.schema[id_col].dataType.simpleString()}, "
        "adc_dist double"
    )

    def search(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(batch.schema.get_field_index(id_col)).to_numpy(
                zero_copy_only=False
            )
            cells = batch.column(
                batch.schema.get_field_index("cell")
            ).to_numpy(zero_copy_only=False)
            cl = batch.column(batch.schema.get_field_index("codes"))
            cmat = np.asarray(cl.flatten()).reshape(len(ids), m) - 1
            frames = []
            for pi, pid in enumerate(probe_ids):
                adcs, nids = [], []
                for cell in probed[pi]:
                    mask = cells == cell
                    if not mask.any():
                        continue
                    dt = tables[(pi, int(cell))]
                    sub_codes = cmat[mask]
                    adcs.append(
                        dt[np.arange(m)[None, :], sub_codes].sum(axis=1)
                    )
                    nids.append(ids[mask])
                if not adcs:
                    continue
                adc = np.concatenate(adcs)
                nid = np.concatenate(nids)
                top = min(k, adc.shape[0])
                idx = np.argpartition(adc, top - 1)[:top]
                frames.append(
                    pd.DataFrame(
                        {
                            "probe_id": pid,
                            "neighbor_id": nid[idx],
                            "adc_dist": adc[idx],
                        }
                    )
                )
            if frames:
                yield pa.RecordBatch.from_pandas(
                    pd.concat(frames), preserve_index=False
                )

    pruned = codes.filter(F.col("cell").isin(all_cells))
    candidates = pruned.mapInArrow(search, schema=out_schema)
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "adc_dist", "rank")
    )
