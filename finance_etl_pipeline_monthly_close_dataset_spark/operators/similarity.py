"""Similarity search over embedding columns (array<float>).

Two paths:

* ``cosine_topk`` -- exact brute force: broadcast the (small) probe
  set against the corpus, dot products via ``zip_with`` +
  ``aggregate`` higher-order functions (JVM-side, no Python), top-k
  per probe via a ranking window partitioned by probe id.
  At 100 TB this is the correctness baseline and is embarrassingly
  parallel: corpus stays partitioned, probes broadcast.

* ``lsh_bucketed_topk`` -- the scale path: random-hyperplane LSH
  (deterministic seeded planes) assigns each vector a bucket key;
  search compares only same-bucket (plus optional multi-probe)
  candidates, turning the scan into an equality join on bucket keys.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per probe.

    ``probes`` must be small (it is broadcast); the corpus never
    shuffles -- similarity computes map-side, then one shuffle ranks
    within each probe partition. Ties break on neighbor id for
    determinism.
    """
    # both norms staged before the probe cross: the corpus norm folds
    # once per row (not once per row x probe) and the probe norm once
    # per probe; the per-pair work is the dot product only. Same
    # doubles as the inline form, so oracles are unaffected.
    p = probes.select(
        F.col(probe_id_col).alias("probe_id"),
        F.col(vec_col).alias("_probe_vec"),
        _norm(F.col(vec_col)).alias("_pnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vec"),
        _norm(F.col(vec_col)).alias("_cnorm"),
    )
    scored = c.join(F.broadcast(p)).select(
        "probe_id",
        "neighbor_id",
        (
            _dot(F.col("_vec"), F.col("_probe_vec"))
            / (F.col("_cnorm") * F.col("_pnorm"))
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine_sim", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (unit Gaussian, fixed seed)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def portable_hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic +-1 hyperplanes derived from md5 -- Rademacher
    planes are valid sign-random projections (Achlioptas-style sparse
    projections), and any engine with md5 can rebuild them, so an
    external SQL oracle can reproduce the exact bucket assignment
    (numpy Gaussians cannot be re-derived in SQL)."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[0], 16) % 2 else -1.0
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id from random-hyperplane projections.

    Each plane contributes one bit: sign(dot(vec, plane)). Built from
    higher-order functions over the array column -- the planes are
    literal arrays folded into the plan (no join, no UDF).
    """
    from .kmeans import lit_double_array

    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_col = lit_double_array(plane)
        bit = F.when(
            _dot(vec, plane_col) >= 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def lsh_bucketed_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    seed: int = 42,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's LSH
    bucket. Recall < 1.0 by construction; raise n_planes for smaller
    buckets or lower it for higher recall. Pass explicit ``planes``
    (e.g. :func:`portable_hyperplanes`) for cross-engine
    reproducibility."""
    if planes is None:
        planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vec"),
        _norm(F.col(vec_col)).alias("_cnorm"),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    p = probes.select(
        F.col(probe_id_col).alias("probe_id"),
        F.col(vec_col).alias("_probe_vec"),
        _norm(F.col(vec_col)).alias("_pnorm"),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    scored = c.join(F.broadcast(p), on="_bucket").select(
        "probe_id",
        "neighbor_id",
        (
            _dot(F.col("_vec"), F.col("_probe_vec"))
            / (F.col("_cnorm") * F.col("_pnorm"))
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine_sim", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    seed: int = 42,
    centroids: DataFrame | None = None,
    micro_rank: bool = False,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse quantizer
    partitions the corpus into ``n_centroids`` cells; each probe
    searches only its ``nprobe`` nearest cells.

    Structure (all DataFrame ops, MLlib KMeans for training):

    1. fit KMeans on the corpus vectors (seeded -> deterministic), or
       take explicit ``centroids`` -- a small ``(cell int, centroid
       array<double>)`` DataFrame (e.g. a deterministic corpus sample,
       which makes the whole search reproducible by an external SQL
       oracle; KMeans quality is better but engine-specific);
    2. assign every corpus vector its cell id (model.transform, or an
       argmin over the broadcast centroid table -- either way one
       map-side pass, no shuffle);
    3. rank cells per probe by distance to the centroid (probes x
       centroids is a tiny literal cross join), keep ``nprobe``;
    4. equi-join corpus cells to probe cells -> cosine -> windowed
       top-k, exactly like ``cosine_topk`` but over ~nprobe/n_centroids
       of the corpus.

    At 100 TB: training samples the corpus (KMeans does its own
    aggregation), the cell assignment is a narrow map, and the search
    join shuffles only on the small cell-id key space. Recall < 1.0 by
    construction; raise ``nprobe`` toward ``n_centroids`` to trade
    speed for recall.
    """
    spark = corpus.sparkSession
    if centroids is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_vec"),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
        )
        model = KMeans(k=n_centroids, seed=seed, maxIter=20).fit(c.select("features"))
        assigned = model.transform(c).select(
            "neighbor_id", "_vec", F.col("prediction").alias("_cell")
        )
        # tiny probes x centroids ranking (centroids are literal arrays)
        cent_rows = [
            (i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())
        ]
        cent_df = spark.createDataFrame(cent_rows, "cell int, centroid array<double>")
    else:
        cent_df = centroids
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vec")
        )
        a_d2 = F.aggregate(
            F.zip_with(
                F.col("_vec"), F.col("centroid"),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        # argmin via min_by under a groupBy: partial aggregation
        # collapses the xN-centroids expansion map-side, so the shuffle
        # carries ~one row per vector (a window would shuffle all N)
        assigned = (
            c.crossJoin(F.broadcast(cent_df))
            .withColumn("_d2", a_d2)
            .groupBy("neighbor_id")
            .agg(
                F.min_by(F.col("cell"), F.struct(F.col("_d2"), F.col("cell"))).alias("_cell"),
                F.first("_vec").alias("_vec"),
            )
            .select("neighbor_id", "_vec", "_cell")
        )
    p = probes.select(
        F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("_probe_vec")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("_probe_vec"), F.col("centroid"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w_cells = Window.partitionBy("probe_id").orderBy(F.col("_d2").asc(), F.col("cell").asc())
    probe_cells = (
        p.crossJoin(F.broadcast(cent_df))
        .withColumn("_d2", d2)
        .withColumn("_cr", F.row_number().over(w_cells))
        .filter(F.col("_cr") <= nprobe)
        .select("probe_id", "_probe_vec", F.col("cell").alias("_cell"))
    )

    # norms staged pre-join (one fold per corpus row / probe row, not
    # per candidate pair; identical doubles, oracles unaffected)
    scored = (
        assigned.withColumn("_cnorm", _norm(F.col("_vec")))
        .join(
            F.broadcast(
                probe_cells.withColumn("_pnorm", _norm(F.col("_probe_vec")))
            ),
            on="_cell",
        )
        .select(
            "probe_id",
            "neighbor_id",
            (
                _dot(F.col("_vec"), F.col("_probe_vec"))
                / (F.col("_cnorm") * F.col("_pnorm"))
            ).alias("cosine_sim"),
        )
    )
    return _topk_rank(scored, k, micro_rank)


def _topk_rank(scored: DataFrame, k: int, micro_rank: bool = False) -> DataFrame:
    """Final per-probe top-k ranking over a ``(probe_id, neighbor_id,
    cosine_sim)`` candidate set.

    ``micro_rank=True`` ranks on the exact BIGINT micro-unit
    quantization of the cosine (tie-broken by ``neighbor_id``) and
    emits ``cosine_sim_micro`` instead of the raw double, so the rank
    is a TOTAL function of the quantized output the oracle-paired
    queries hash: two candidates whose raw doubles differ by a
    summation-order ulp across engines but land on the same micro-unit
    can no longer flip rank rows (r9 ADVICE -- the latent CHECKALL
    flake class the old rank-on-raw-double form admitted).  The DuckDB
    oracles order by the literal same
    ``CAST(floor(sim * 1e6 + 0.5) AS BIGINT)`` expression."""
    if not micro_rank:
        w = Window.partitionBy("probe_id").orderBy(
            F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("probe_id", "neighbor_id", "cosine_sim", "rank")
        )
    from .kmeans import micro_units_col

    q = scored.withColumn("cosine_sim_micro", micro_units_col(F.col("cosine_sim")))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine_sim_micro").desc(), F.col("neighbor_id").asc()
    )
    return (
        q.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine_sim_micro", "rank")
    )


def _local_topk_order(sims_col, ids, kk: int, micro_rank: bool):
    """Indices of a batch-local top-``kk`` selection, under the SAME
    total order the final window uses: raw double descending when
    ``micro_rank`` is off (ulp-tied rows are interchangeable there),
    (micro-unit desc, id asc) lexicographic when it is on -- the local
    cut must agree with the global quantized order or a boundary row
    that ties in micro-units could be dropped in favor of one the
    global tie-break ranks lower."""
    import numpy as np

    if not micro_rank:
        return np.argpartition(-sims_col, kk - 1)[:kk]
    micro = np.floor(sims_col * 1_000_000.0 + 0.5)
    return np.lexsort((ids, -micro))[:kk]


def _vec_matrix(batch, vec_col: str, dim: int):
    """Arrow ``list<float>`` column of a RecordBatch -> (n, dim)
    float64 ndarray with NO pandas round-trip: flatten the list
    buffer (slice-safe; embeddings are non-null fixed-length by
    construction) and reshape.  The pandas path
    (``Series.tolist()`` -> ``np.array``) builds n x dim Python float
    objects and profiled as the dominant cost of every arrow-batched
    vector operator at the 1M x 64d bench scale.

    ``dim`` is required (every caller knows it from its probe/centroid
    matrix): a ragged batch would otherwise reshape into silently
    misaligned rows -- here it fails loudly instead (r9 ADVICE).  The
    total-count check alone is NOT enough (a ragged [[a,b,c],[d]] still
    has 2 x dim-2 elements), so variable-length list columns also get a
    per-row offsets check -- one vectorized diff over the offsets
    buffer, negligible next to the flatten."""
    import numpy as np
    import pyarrow as pa

    col = batch.column(batch.schema.get_field_index(vec_col))
    flat = col.flatten()
    vals = flat.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    if vals.size != len(col) * dim:
        raise ValueError(
            f"ragged vector column {vec_col!r}: {vals.size} elements "
            f"for {len(col)} rows x dim {dim}"
        )
    if isinstance(col, (pa.ListArray, pa.LargeListArray)):
        off = col.offsets.to_numpy(zero_copy_only=False)
        if not ((off[1:] - off[:-1]) == dim).all():
            raise ValueError(
                f"ragged vector column {vec_col!r}: row lengths differ "
                f"from dim {dim}"
            )
    return vals.reshape(len(col), dim)


def lsh_topk_arrow(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    seed: int = 42,
    planes: list[list[float]] | None = None,
    micro_rank: bool = False,
) -> DataFrame:
    """LSH bucket top-k with Arrow-batched numpy for the bucketing AND
    the within-bucket scoring -- the production probe path, same
    pattern as ``ivf_topk_arrow``.  The expression form
    (``lsh_bucketed_topk``) evaluates one HOF dot fold per plane per
    row to bucket and one per candidate PAIR to score (measured 10.2 s
    at 1M x 64d / 16 probes, LOSING to the brute arrow matmul's
    4.4 s); here each Arrow batch buckets its block with one
    ``block @ planes.T`` sign matmul and scores only rows landing in a
    probed bucket as one block matmul, emitting local top-k per probe
    -- the shuffle carries partitions x probes x k candidates.  Same
    candidate semantics as ``lsh_bucketed_topk`` (exact bucket
    equality); buckets can differ from the expression form only if a
    projection is EXACTLY zero under one summation order and not the
    other (same caveat class as ``assign_cells_arrow``).  Tracked per
    round by the ``ann_1m`` bench block alongside the expression
    form."""
    import numpy as np
    import pandas as pd

    if planes is None:
        planes = hyperplanes(dim, n_planes, seed)
    pl = np.array(planes, dtype=np.float64)  # (n_planes, dim)
    bitw = 1 << np.arange(pl.shape[0], dtype=np.int64)

    probe_rows = probes.select(probe_id_col, vec_col).collect()
    pids = [r[0] for r in probe_rows]
    pm = np.array([[float(x) for x in r[1]] for r in probe_rows], dtype=np.float64)
    pn = pm / np.linalg.norm(pm, axis=1, keepdims=True)
    pbuckets = ((pm @ pl.T) >= 0) @ bitw  # (n_probes,)
    probed: dict[int, list[int]] = {}
    for pi, b in enumerate(pbuckets):
        probed.setdefault(int(b), []).append(pi)

    out_schema = (
        f"probe_id {probes.schema[probe_id_col].dataType.simpleString()}, "
        f"neighbor_id {corpus.schema[id_col].dataType.simpleString()}, "
        "cosine_sim double"
    )

    def part(batches):
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            vm = _vec_matrix(batch, vec_col, pl.shape[1])
            ids = batch.column(batch.schema.get_field_index(id_col)).to_numpy(
                zero_copy_only=False
            )
            buckets = ((vm @ pl.T) >= 0) @ bitw
            out_p, out_n, out_s = [], [], []
            for b, pidx in probed.items():
                mask = buckets == b
                if not mask.any():
                    continue
                sub = vm[mask]
                sub_ids = ids[mask]
                subn = sub / np.linalg.norm(sub, axis=1, keepdims=True)
                sims = subn @ pn[pidx].T
                kk = min(k, sims.shape[0])
                for j, pi in enumerate(pidx):
                    top = _local_topk_order(sims[:, j], sub_ids, kk, micro_rank)
                    out_p.extend([pids[pi]] * len(top))
                    out_n.extend(sub_ids[top])
                    out_s.extend(sims[top, j])
            if not out_p:
                continue  # empty pandas frames infer object dtypes
            yield pa.RecordBatch.from_pandas(
                pd.DataFrame(
                    {"probe_id": out_p, "neighbor_id": out_n, "cosine_sim": out_s}
                ),
                preserve_index=False,
            )

    from .dedup import spread_partitions

    cand = spread_partitions(corpus.select(id_col, vec_col)).mapInArrow(
        part, schema=out_schema
    )
    return _topk_rank(cand, k, micro_rank)


def ivf_topk_arrow(
    corpus: DataFrame,
    probes: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    micro_rank: bool = False,
) -> DataFrame:
    """IVF top-k with Arrow-batched numpy for BOTH the cell assignment
    and the within-cell scoring -- the production probe path at corpus
    scale.  The expression form (``ivf_topk`` with explicit centroids)
    pays N x n_centroids interpreted-lambda evals to assign and one
    64-term HOF fold per candidate pair to score (measured 71 s at
    1M x 64d / k=64 / nprobe=8 on local[32]); here each Arrow batch
    does assignment as two BLAS matmuls (same argmin-lowest-cell
    tie-break as ``assign_cells_arrow``) and scores only the rows
    landing in probed cells as one block matmul, emitting its LOCAL
    top-k per probe -- the shuffle carries partitions x probes x k
    candidate rows, never the scored corpus (same trick as
    ``cosine_topk_arrow``).  Same semantics as ``ivf_topk``; cosines
    differ only by float summation order (numpy pairwise vs left
    fold).  Measured 6.5 s on the same 1M corpus -- the number
    ``bench.py``'s ``ann_1m`` block tracks per round."""
    import numpy as np
    import pandas as pd

    cent_rows = sorted(
        (int(r["cell"]), [float(x) for x in r["centroid"]])
        for r in centroids.collect()
    )
    cells_arr = np.array([i for i, _ in cent_rows], dtype=np.int64)
    cm = np.array([c for _, c in cent_rows], dtype=np.float64)
    cm_sq = (cm * cm).sum(axis=1)

    probe_rows = probes.select(probe_id_col, vec_col).collect()
    pids = [r[0] for r in probe_rows]
    pm = np.array([[float(x) for x in r[1]] for r in probe_rows], dtype=np.float64)
    pn = pm / np.linalg.norm(pm, axis=1, keepdims=True)
    # rank cells per probe by (d2, cell id) -- identical tie-break to
    # the expression form's row_number window
    pd2 = ((pm[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
    probed: dict[int, list[int]] = {}
    for pi in range(len(pids)):
        order = np.lexsort((cells_arr, pd2[pi]))[:nprobe]
        for ci in order:
            probed.setdefault(int(cells_arr[ci]), []).append(pi)

    out_schema = (
        f"probe_id {probes.schema[probe_id_col].dataType.simpleString()}, "
        f"neighbor_id {corpus.schema[id_col].dataType.simpleString()}, "
        "cosine_sim double"
    )

    def part(batches):
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            vm = _vec_matrix(batch, vec_col, cm.shape[1])
            ids = batch.column(batch.schema.get_field_index(id_col)).to_numpy(
                zero_copy_only=False
            )
            best = np.argmin(cm_sq[None, :] - 2.0 * (vm @ cm.T), axis=1)
            bcells = cells_arr[best]
            out_p, out_n, out_s = [], [], []
            for cell, pidx in probed.items():
                mask = bcells == cell
                if not mask.any():
                    continue
                sub = vm[mask]
                sub_ids = ids[mask]
                subn = sub / np.linalg.norm(sub, axis=1, keepdims=True)
                sims = subn @ pn[pidx].T  # (m, len(pidx))
                kk = min(k, sims.shape[0])
                for j, pi in enumerate(pidx):
                    top = _local_topk_order(sims[:, j], sub_ids, kk, micro_rank)
                    out_p.extend([pids[pi]] * len(top))
                    out_n.extend(sub_ids[top])
                    out_s.extend(sims[top, j])
            if not out_p:
                continue  # empty pandas frames infer object dtypes
            yield pa.RecordBatch.from_pandas(
                pd.DataFrame(
                    {"probe_id": out_p, "neighbor_id": out_n, "cosine_sim": out_s}
                ),
                preserve_index=False,
            )

    from .dedup import spread_partitions

    cand = spread_partitions(corpus.select(id_col, vec_col)).mapInArrow(
        part, schema=out_schema
    )
    return _topk_rank(cand, k, micro_rank)


def cosine_topk_arrow(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy matmul
    (``mapInArrow``) -- the vectorized-Python alternative to the
    JVM higher-order-function formulation in ``cosine_topk``.

    The probe matrix is tiny and rides into the workers inside the
    closure; each Arrow batch computes ``corpus_block @ probes.T`` and
    emits only its local top-k per probe, so the shuffle carries
    ``partitions x probes x k`` candidate rows, never the scored
    corpus. A final ranking window reduces candidates to the global
    top-k. Results match ``cosine_topk`` exactly up to float summation
    order (numpy pairwise vs left-fold); both are correct cosines.

    r9: the batch iterator is ``mapInArrow``, not ``mapInPandas`` --
    the vector column materializes by flattening the Arrow list buffer
    straight into a (n, dim) ndarray (``_vec_matrix``) instead of a
    pandas Series of Python lists, which profiled as the dominant cost
    of the 1M x 64d brute scan; pandas appears only on the k x probes
    output rows."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    probe_rows = probes.select(probe_id_col, vec_col).collect()
    probe_ids = [r[0] for r in probe_rows]
    pm = np.array([r[1] for r in probe_rows], dtype=np.float64)
    pm_norm = pm / np.linalg.norm(pm, axis=1, keepdims=True)

    out_schema = (
        f"probe_id {probes.schema[probe_id_col].dataType.simpleString()}, "
        f"neighbor_id {corpus.schema[id_col].dataType.simpleString()}, "
        "cosine_sim double"
    )

    def score(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            cm = _vec_matrix(batch, vec_col, pm_norm.shape[1])
            ids = batch.column(batch.schema.get_field_index(id_col)).to_numpy(
                zero_copy_only=False
            )
            cm_norm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cm_norm @ pm_norm.T  # (batch, probes)
            top = min(k, sims.shape[0])
            idx = np.argpartition(-sims, top - 1, axis=0)[:top]
            frames = []
            for j, pid in enumerate(probe_ids):
                rows = idx[:, j]
                frames.append(
                    pd.DataFrame(
                        {
                            "probe_id": pid,
                            "neighbor_id": ids[rows],
                            "cosine_sim": sims[rows, j],
                        }
                    )
                )
            yield pa.RecordBatch.from_pandas(
                pd.concat(frames), preserve_index=False
            )

    from .dedup import spread_partitions

    candidates = spread_partitions(corpus.select(id_col, vec_col)).mapInArrow(
        score, schema=out_schema
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine_sim", "rank")
    )


def semantic_dedup(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow_assign: bool = False,
    arrow_pairs: bool = False,
    persist_intermediates: bool = True,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster-then-compare.

    The pattern from Abbas et al. 2023 ("SemDeDup") -- instead of an
    all-pairs cosine scan over the corpus, assign every vector to its
    nearest coarse centroid (one map-side argmin pass over a broadcast
    k x d model, the same assignment as ``ivf_topk``) and compare
    pairs ONLY within a cell. A vector is a duplicate if some
    EARLIER (lower-id) vector in its cell has cosine >= ``threshold``;
    the keep-lowest-id rule makes the drop set a total function of the
    data, no tie luck. Returns one row per dropped vector:
    ``(vec_id, cell, kept_ref, cosine_sim_micro)`` where ``kept_ref``
    is the smallest qualifying earlier neighbor and the similarity is
    an exact BIGINT in micro-units.

    Scale: the quadratic is confined to a cell, so cost is
    sum(|cell|^2) instead of N^2 -- k grows with the corpus to keep
    cells bounded (k ~ N / target_cell_size), exactly how SemDeDup
    runs at dataset scale. The pair join shuffles on the cell id;
    similarity is quantized to exact integer MICRO-UNITS
    (``floor(sim * 1e6 + 0.5)``, pure IEEE ops -- see
    ``kmeans.quantize_micro``) BEFORE the threshold compare, so the
    oracle's boundary is the identical integer comparison with no
    round()-of-doubles exposure.

    ``arrow_assign=True`` swaps the broadcast-argmin HOF assignment
    for the Arrow-batched numpy matmul (``assign_cells_arrow``) -- the
    large-k production path (the HOF pass evaluates N x k interpreted
    lambdas). Same deterministic lowest-cell tie-break; assignment can
    differ from the HOF path only on near-exact distance ties.
    ``arrow_pairs=True`` additionally runs the within-cell compare as
    one numpy block matmul per cell (``applyInPandas`` over the cell
    groups) -- SemDeDup's actual inner loop; same keep-lowest-id rule
    and the same micro-unit quantization, differing from the
    expression path only in float summation order.
    """
    import math as _math

    thr_micro = int(_math.floor(threshold * 1e6 + 0.5))
    vecs = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    if arrow_assign:
        # keep_vec: the assignment batch emits (id, cell, vec) in one
        # pass, so no shuffle join is needed to reattach the embedding
        assigned = assign_cells_arrow(
            df, centroids, id_col=id_col, vec_col=vec_col, keep_vec=True
        ).select(F.col(id_col).alias("_id"), "cell", F.col(vec_col).alias("_vec"))
    else:
        assigned = _hof_assign(vecs, centroids)
    if arrow_pairs:
        return _arrow_cell_drops(assigned, thr_micro, id_col)
    # stage each vector's norm ONCE before the pair join: cosine per
    # pair then costs one dot-product fold instead of three (the norms
    # are the same doubles either way, so the oracle's inline-norm SQL
    # still matches bit-for-bit). PERSISTED: the a and b pair sides
    # both read this projection -- without the cache the corpus (and
    # the assignment argmin) computes twice.
    staged = assigned.select(
        "_id", "cell", "_vec", _norm(F.col("_vec")).alias("_nm")
    )
    if persist_intermediates:
        # derived projection, not the caller's frame; lives until the
        # session clears caches (persist_intermediates=False opts out)
        staged = staged.persist()
    a = staged.select(
        F.col("_id").alias("id_a"), F.col("cell").alias("_ca"),
        F.col("_vec").alias("_va"), F.col("_nm").alias("_na"),
    )
    b = staged.select(
        F.col("_id").alias("id_b"), F.col("cell").alias("_cb"),
        F.col("_vec").alias("_vb"), F.col("_nm").alias("_nb"),
    )
    pairs = (
        a.join(b, (F.col("_ca") == F.col("_cb")) & (F.col("id_a") < F.col("id_b")))
        .select(
            "id_a",
            "id_b",
            F.col("_cb").alias("cell"),
            F.floor(
                _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
                * F.lit(1e6) + F.lit(0.5)
            ).cast("bigint").alias("sim"),
        )
        .filter(F.col("sim") >= F.lit(thr_micro))
    )
    return (
        pairs.groupBy("id_b", "cell")
        .agg(F.min_by(F.struct("id_a", "sim"), "id_a").alias("best"))
        .select(
            F.col("id_b").alias(id_col),
            "cell",
            F.col("best.id_a").alias("kept_ref"),
            F.col("best.sim").alias("cosine_sim_micro"),
        )
    )


def _hof_assign(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """Broadcast-argmin HOF cell assignment over (_id, _vec)."""
    return (
        vecs.crossJoin(F.broadcast(centroids))
        .withColumn(
            "_d2",
            F.aggregate(
                F.zip_with(
                    F.col("_vec"), F.col("centroid"),
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        .groupBy("_id")
        .agg(
            F.min_by(F.col("cell"), F.struct(F.col("_d2"), F.col("cell"))).alias("cell"),
            F.first("_vec").alias("_vec"),
        )
    )


def assign_cells_arrow(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """Arrow-batched nearest-centroid assignment: each batch computes
    the full ``block x centroids`` squared-distance matrix in numpy and
    emits ``(id, cell)`` -- the production-scale alternative to the
    broadcast-argmin HOF pass when k is large (the HOF path evaluates
    N x k interpreted lambdas; this path is two BLAS matmuls per
    batch). Ties break to the lowest cell id exactly like the HOF
    argmin: numpy argmin returns the FIRST minimal index and cells are
    ordered, so both paths pick the same cell even on exact-equal
    distances. Distances differ from the HOF fold only by float
    summation order -- argmin decisions can differ ONLY on near-exact
    ties, which the deterministic tie-break then resolves identically.
    """
    import numpy as np

    cent_rows = sorted(centroids.collect(), key=lambda r: r["cell"])
    cells = np.array([r["cell"] for r in cent_rows], dtype=np.int64)
    cm = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    cm_sq = (cm * cm).sum(axis=1)  # (k,)

    # keep_vec carries the vector through the same Arrow batch so the
    # caller needs NO join to reunite (id, cell) with the embedding --
    # semantic_dedup's pair stage groups by cell directly
    out_schema = f"{id_col} {df.schema[id_col].dataType.simpleString()}, cell int"
    if keep_vec:
        out_schema += f", {vec_col} {df.schema[vec_col].dataType.simpleString()}"

    def assign(batches):
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            vm = _vec_matrix(batch, vec_col, cm.shape[1])
            # ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2; ||v||^2 is
            # constant per row, so argmin needs only the last two terms
            d2 = cm_sq[None, :] - 2.0 * (vm @ cm.T)
            best = cells[np.argmin(d2, axis=1)]
            # mapInArrow (r9): ids and the kept vector column pass
            # through as the INPUT batch's own Arrow buffers -- the
            # embedding never round-trips through pandas object lists
            arrays = [
                batch.column(batch.schema.get_field_index(id_col)),
                pa.array(best.astype("int32"), type=pa.int32()),
            ]
            names = [id_col, "cell"]
            if keep_vec:
                arrays.append(batch.column(batch.schema.get_field_index(vec_col)))
                names.append(vec_col)
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    from .dedup import spread_partitions

    return spread_partitions(df.select(id_col, vec_col)).mapInArrow(
        assign, schema=out_schema
    )


def _arrow_cell_drops(
    assigned: DataFrame,
    thr_micro: int,
    id_col: str,
) -> DataFrame:
    """Within-cell duplicate detection as one numpy block per cell
    (``applyInPandas`` over the cell groups) -- the SemDeDup
    inner loop as a matmul instead of per-pair HOF folds. For each
    vector, the kept reference is the smallest LOWER id in its cell
    with quantized cosine >= ``thr_micro`` (identical rule and the
    identical ``floor(sim * 1e6 + 0.5)`` micro-unit quantization as
    the expression path and the oracle -- integer compare, no
    rounding-mode exposure). Large cells process in row blocks so
    memory stays O(block x cell)."""
    import numpy as np
    import pandas as pd

    out_schema = (
        f"{id_col} {assigned.schema['_id'].dataType.simpleString()}, "
        "cell int, "
        f"kept_ref {assigned.schema['_id'].dataType.simpleString()}, "
        "cosine_sim_micro bigint"
    )

    def find(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id")
        ids = pdf["_id"].values
        V = np.array(pdf["_vec"].tolist(), dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        cell = int(pdf["cell"].iloc[0])
        out_id, out_ref, out_sim = [], [], []
        block = 1024
        for lo in range(1, len(ids), block):
            hi = min(lo + block, len(ids))
            # (rows, earlier+self) in exact integer micro-units
            sims = np.floor(Vn[lo:hi] @ Vn[:hi].T * 1e6 + 0.5)
            for r in range(hi - lo):
                j = lo + r
                earlier = sims[r, :j]
                hits = np.nonzero(earlier >= thr_micro)[0]
                if hits.size:
                    i = int(hits[0])  # ids sorted -> first hit = min id
                    out_id.append(ids[j])
                    out_ref.append(ids[i])
                    out_sim.append(int(earlier[i]))
        return pd.DataFrame(
            {id_col: out_id, "cell": cell, "kept_ref": out_ref,
             "cosine_sim_micro": pd.Series(out_sim, dtype="int64")}
        )

    return assigned.groupBy("cell").applyInPandas(find, schema=out_schema)
