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
    p = probes.select(
        F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("_probe_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vec"))
    scored = c.join(F.broadcast(p)).select(
        "probe_id",
        "neighbor_id",
        cosine(F.col("_vec"), F.col("_probe_vec")).alias("cosine_sim"),
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


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id from random-hyperplane projections.

    Each plane contributes one bit: sign(dot(vec, plane)). Built from
    higher-order functions over the array column -- the planes are
    literal arrays folded into the plan (no join, no UDF).
    """
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
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
) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's LSH
    bucket. Recall < 1.0 by construction; raise n_planes for smaller
    buckets or lower it for higher recall."""
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    p = probes.select(
        F.col(probe_id_col).alias("probe_id"),
        F.col(vec_col).alias("_probe_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    scored = c.join(F.broadcast(p), on="_bucket").select(
        "probe_id",
        "neighbor_id",
        cosine(F.col("_vec"), F.col("_probe_vec")).alias("cosine_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine_sim", "rank")
    )
