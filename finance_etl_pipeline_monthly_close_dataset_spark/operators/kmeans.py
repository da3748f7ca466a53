"""Engine-portable distributed Lloyd's k-means.

``similarity.ivf_topk`` trains its coarse quantizer with MLlib KMeans
by default -- good quality, but the centroids are engine-specific, so
the trained search can only be rows-checked. This module implements
Lloyd's iterations directly on DataFrames with DETERMINISTIC,
cross-engine-reproducible arithmetic:

* init: the k lowest-id vectors (rounded to 6 dp);
* assign: crossJoin-broadcast of the k centroids + map-side
  ``min_by`` argmin (ties break on cell id) -- the shuffle carries one
  row per vector, never the k-way expansion (same pattern as
  ``ivf_topk``'s explicit-centroid path);
* update: posexplode to (cell, pos, value), partial-aggregated means
  per (cell, pos) -- shuffle is ~k x d rows after map-side combine --
  reassembled into arrays and ROUNDED to 6 dp on the driver before
  re-broadcast, so distributed partial-sum order cannot leak into the
  next iteration's argmin decisions.

Centroids pass through the driver between iterations as a k x d
literal (bounded scalar, the same thing MLlib's driver does), keeping
every iteration's plan shallow. A DuckDB oracle unrolls the identical
iterations with list comprehensions (`embedding_kmeans_centroids`),
so the trained quantizer is value-checked, not just plausible.

At 100 TB: assignment is one map-side pass over the corpus per
iteration; the update shuffle is k x d (KBs). Sample the corpus for
training if even one pass per iteration is too much -- the structure
is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _d2(vec_col: str, cent_col: str):
    """Squared L2 distance between two array columns (double math,
    index order summation -- DuckDB's list_sum over a comprehension
    computes the identical sequence)."""
    return F.aggregate(
        F.zip_with(
            F.col(vec_col), F.col(cent_col),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def lloyd_kmeans(
    df: DataFrame,
    k: int = 4,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Run ``n_iters`` Lloyd iterations; returns a small
    ``(cell int, centroid array<double>)`` DataFrame suitable for
    ``similarity.ivf_topk(..., centroids=...)``. Fully deterministic:
    same data -> same centroids on any engine."""
    spark = df.sparkSession
    vecs = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))

    init_rows = (
        vecs.orderBy("_id")
        .limit(k)
        .select(F.transform("_vec", lambda x: F.round(x.cast("double"), decimals)).alias("c"))
        .collect()
    )
    centroids = [[float(x) for x in r["c"]] for r in init_rows]

    for _ in range(n_iters):
        cent_df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)], "cell int, centroid array<double>"
        )
        assigned = (
            vecs.crossJoin(F.broadcast(cent_df))
            .withColumn("_d2", _d2("_vec", "centroid"))
            .groupBy("_id")
            .agg(
                F.min_by(F.col("cell"), F.struct(F.col("_d2"), F.col("cell"))).alias("cell"),
                F.first("_vec").alias("_vec"),
            )
        )
        # per-(cell, position) means; map-side combine collapses the
        # posexplode before the shuffle, which then carries ~k x d rows
        means = (
            assigned.select("cell", F.posexplode("_vec").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform("pm", lambda s: F.round(s["m"], decimals)).alias("c"))
            .collect()
        )
        new = {r["cell"]: [float(x) for x in r["c"]] for r in means}
        # an emptied cell keeps its previous centroid (standard Lloyd's)
        centroids = [new.get(i, centroids[i]) for i in range(k)]

    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cell int, centroid array<double>"
    )


def kmeans_profile(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell training profile for a trained quantizer: cluster
    size, centroid L2 norm, and mean squared distance (the per-cell
    inertia) -- the scalars that make the trained model
    value-checkable without hashing float arrays."""
    vecs = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    assigned = (
        vecs.crossJoin(F.broadcast(centroids))
        .withColumn("_d2", _d2("_vec", "centroid"))
        .groupBy("_id")
        .agg(
            F.min_by(
                F.struct(F.col("cell"), F.col("_d2")),
                F.struct(F.col("_d2"), F.col("cell")),
            ).alias("best")
        )
        .select(F.col("best.cell").alias("cell"), F.col("best._d2").alias("d2"))
    )
    norm = F.round(
        F.sqrt(F.aggregate(F.col("centroid"), F.lit(0.0), lambda a, v: a + v * v)), 6
    )
    return (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("d2"), 6).alias("avg_d2"),
        )
        .join(centroids.select("cell", norm.alias("centroid_norm")), on="cell")
        .select("cell", "n_vectors", "centroid_norm", "avg_d2")
    )
