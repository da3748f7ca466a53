"""Engine-portable distributed Lloyd's k-means.

``similarity.ivf_topk`` trains its coarse quantizer with MLlib KMeans
by default -- good quality, but the centroids are engine-specific, so
the trained search can only be rows-checked. This module implements
Lloyd's iterations directly on DataFrames with DETERMINISTIC,
cross-engine-reproducible arithmetic:

* init: the k lowest-id vectors (snapped to the 1e-6 micro-unit grid
  via ``floor(x * 1e6 + 0.5) / 1e6`` -- pure IEEE ops, bit-identical
  on any engine, no decimal-repr dependency);
* assign: the centroids are a driver-side k x d literal between
  iterations, so the argmin is ONE expression per row --
  ``array_min`` over k ``(d2, cell)`` structs (struct ordering =
  distance then cell id, the same tie-break as ``min_by``) -- a
  ZERO-SHUFFLE map pass, no k-way row expansion and no groupBy to
  reassemble it (the crossJoin+min_by form this replaces shuffled all
  N vectors once per iteration);
* update: posexplode to (cell, pos, value), partial-aggregated means
  per (cell, pos) -- shuffle is ~k x d rows after map-side combine --
  reassembled into arrays and micro-unit-quantized on the driver
  before re-broadcast, so distributed partial-sum order cannot leak
  into the next iteration's argmin decisions.

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


MICRO = 1_000_000.0  # the quantization grid: 1e-6 ("micro-units")


def quantize_micro(x: float) -> float:
    """Quantize a double onto the micro-unit grid:
    ``floor(x * 1e6 + 0.5) / 1e6``.  Every step is a pure IEEE-754
    operation (multiply, add, floor, divide, all correctly rounded),
    so ANY engine computing this from the same input double produces
    the bit-identical result -- there is no decimal-repr dependency.
    This replaces the earlier HALF_UP ``Decimal.quantize`` helper,
    which matched Spark's ``F.round`` but could diverge from DuckDB's
    binary ``round`` one ulp below a repr-exact half (the retired
    r7/r8 ADVICE caveat).  Convention: halves round toward +inf
    (``floor(x + 0.5)``), identical on both engines by construction.
    Non-finite values pass through unchanged (``math.floor`` would
    raise on them)."""
    import math

    if not math.isfinite(x):
        return x
    return math.floor(x * MICRO + 0.5) / MICRO


def quantize_micro_col(col):
    """Column form of ``quantize_micro``: same IEEE ops via Catalyst's
    FLOOR (long result, exact back-conversion below 2^53).  DuckDB
    mirror: ``floor(x * 1000000.0 + 0.5) / 1000000.0``.

    Non-finite asymmetry vs the Python form: ``quantize_micro`` passes
    NaN/inf through unchanged, but Catalyst's FLOOR produces a LONG, so
    NaN/inf would be mangled here.  Harmless on every current feed
    (centroid means of finite embeddings are finite by construction);
    if this ever quantizes raw, possibly non-finite data, wrap it in
    ``F.when(F.isnan(col) | col.isin(inf...), col)`` first."""
    return F.floor(col * F.lit(MICRO) + F.lit(0.5)) / F.lit(MICRO)


def micro_units_col(col):
    """Exact integer micro-units of a double column:
    ``CAST(floor(x * 1e6 + 0.5) AS BIGINT)`` -- the hash-stable output
    form for cross-engine value checks (DuckDB mirror is the literal
    same expression)."""
    return F.floor(col * F.lit(MICRO) + F.lit(0.5)).cast("bigint")


def lit_double_array(values) -> "F.Column":
    """Literal ``array<double>`` column built in ONE driver call.

    ``F.array(*[F.lit(float(x)) for x in xs])`` issues one py4j round
    trip per element -- measured ~50 ms of driver-side chatter per
    256-element centroid batch, which dominated the per-iteration cost
    of ``lloyd_kmeans`` at bench scale (optimization guide SS1.1: the
    time was in neither the plan nor the executors but in building the
    expression tree).  ``repr()`` of a finite double round-trips
    exactly through the JVM's correctly-rounded ``Double.parseDouble``,
    so the parsed literal is bit-identical to the per-element form at
    ~1/25 the build cost.  Non-finite values (repr 'inf'/'nan' has no
    SQL literal form) and the empty array fall back to the exact
    per-element build."""
    import math

    vals = [float(x) for x in values]
    if vals and all(math.isfinite(x) for x in vals):
        return F.expr("array(" + ",".join(repr(x) + "D" for x in vals) + ")")
    return F.array(*[F.lit(x) for x in vals])


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


def _argmin_best(
    vec_col: str, centroids: list[list[float]], cells: list[int] | None = None
):
    """Nearest-cell ``(d2, cell)`` struct against a DRIVER-SIDE
    centroid list.  Struct comparison orders by d2 then cell, so ties
    break on the lowest cell id -- bit-identical arithmetic and
    tie-breaks to the crossJoin+``min_by`` form, with zero shuffle and
    no k-way row expansion.

    r16 shape: ``array_min`` over ONE ``transform`` of a literal
    ``array<array<double>>`` (k x d in a single parsed literal, the
    ``lit_double_array`` trick one level up) instead of k separately-
    built ``zip_with``/``aggregate`` folds.  The per-row arithmetic is
    IDENTICAL -- the same fold runs per centroid in the same index
    order, producing the same ``(d2, cell)`` structs for the same
    ``array_min`` -- but the expression tree shrinks from k copies of
    the fold (which analysis, optimization and codegen each walk, and
    which InferFiltersFromConstraints/pushdown CLONE wholesale -- the
    r13 lesson) to one.  Measured on the k=64 bench lane: the HOF
    Lloyd pass is analysis/codegen-bound, and the single-transform
    form removes that cost; at k=4 oracle scale the two forms time the
    same.  Non-finite centroid values (no SQL literal form) fall back
    to the per-element k-struct build.
    """
    import math

    k = len(centroids)
    cell_ids = [int(cells[i]) if cells is not None else i for i in range(k)]
    flat = [float(x) for c in centroids for x in c]
    if flat and all(math.isfinite(x) for x in flat):
        cents = F.expr(
            "array("
            + ",".join(
                "array(" + ",".join(repr(float(x)) + "D" for x in c) + ")"
                for c in centroids
            )
            + ")"
        )
        identity_cells = cell_ids == list(range(k))
        cells_lit = None if identity_cells else F.expr(
            "array(" + ",".join(str(c) for c in cell_ids) + ")"
        )
        structs = F.transform(
            cents,
            lambda c, i: F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col), c,
                        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d2"),
                # the transform index IS the cell id in the common
                # contiguous case; a re-labeled centroid list looks the
                # id up in a second literal array
                (i if identity_cells else F.element_at(cells_lit, i + F.lit(1))).alias("cell"),
            ),
        )
        return F.array_min(structs)

    structs = []
    for i, c in enumerate(centroids):
        cent = lit_double_array(c)
        # HOF form deliberately: an unrolled k*d term chain was tried
        # and is WORSE -- the optimizer clones the giant tree into the
        # scan's pushed predicates and plan time dominates (10s vs 2s)
        d2 = F.aggregate(
            F.zip_with(
                F.col(vec_col), cent,
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        structs.append(F.struct(d2.alias("d2"), F.lit(cell_ids[i]).alias("cell")))
    return F.array_min(F.array(*structs))


def _argmin_cell(vec_col: str, centroids: list[list[float]]):
    return _argmin_best(vec_col, centroids)["cell"]


def _arrow_cell_partials(vecs: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """One Arrow-batched pass: per (batch, cell), the vector count and
    per-dimension float64 sums. Assignment is two BLAS matmuls per
    batch (argmin over ``||c||^2 - 2 v.c``; first-minimal index =
    lowest cell id, the HOF path's exact tie-break); the emitted
    partials are ~k rows per batch, so the driver combine is bounded
    by k x n_batches regardless of corpus size.

    Numerics caveat (same as ``similarity.assign_cells_arrow``): the
    BLAS form computes distances in a different summation order than
    the HOF/oracle fold, so an assignment can flip on a NEAR-EXACT
    distance tie; downstream that would shift a centroid mean by
    ~1/|cell|. The oracle pairing makes such a flip a visible hash
    mismatch rather than silent drift -- none occurs on the driver
    testdata at any SF (CHECKALL) -- but on adversarial data the
    arrow path's assignment is argmin-equivalent only up to float
    ulps, not bit-identical."""
    import numpy as np

    from .dedup import spread_partitions
    from .similarity import _vec_matrix

    cm = np.array(centroids, dtype=np.float64)
    cm_sq = (cm * cm).sum(axis=1)

    def part(batches):
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            # mapInArrow (r9): flatten the Arrow list buffer straight
            # to the (n, d) matrix, no pandas object lists
            vm = _vec_matrix(batch, "_vec", cm.shape[1])
            best = np.argmin(cm_sq[None, :] - 2.0 * (vm @ cm.T), axis=1)
            out_c, out_n, out_s = [], [], []
            for cell in np.unique(best):
                m = vm[best == cell]
                out_c.append(int(cell))
                out_n.append(int(m.shape[0]))
                out_s.append(m.sum(axis=0).tolist())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_c, type=pa.int32()),
                    pa.array(out_n, type=pa.int64()),
                    pa.array(out_s, type=pa.list_(pa.float64())),
                ],
                names=["cell", "n", "s"],
            )

    return spread_partitions(vecs).mapInArrow(
        part, schema="cell int, n long, s array<double>"
    )


def lloyd_kmeans(
    df: DataFrame,
    k: int = 4,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: bool = False,
) -> DataFrame:
    """Run ``n_iters`` Lloyd iterations; returns a small
    ``(cell int, centroid array<double>)`` DataFrame suitable for
    ``similarity.ivf_topk(..., centroids=...)``. Fully deterministic:
    same data -> same centroids on any engine.

    ``arrow=True`` swaps the HOF argmin + posexplode update for one
    Arrow-batched numpy pass per iteration (``_arrow_cell_partials``)
    -- assignment and per-cell sums come out of the same two BLAS
    matmuls, the shuffle disappears entirely (partials are k rows per
    batch, combined on the driver with order-independent
    ``math.fsum``), and the N x k interpreted-lambda cost goes with
    it. The large-k production path, same pattern as
    ``semantic_dedup(arrow_assign=True)``; oracle-paired by
    ``embedding_kmeans_centroids_arrow`` against the SAME unrolled
    SQL, so any assignment flip on a near-exact distance tie (the one
    way the paths can diverge -- see ``_arrow_cell_partials``) is a
    hash mismatch, not a silent drift.

    Quantization: centroids are snapped onto the 1e-6 grid between
    iterations via ``quantize_micro`` / ``quantize_micro_col`` --
    ``floor(x * 1e6 + 0.5) / 1e6``, pure IEEE-754 ops that every
    engine computes bit-identically from the same input double, so
    the oracle's unrolled iterations carry NO decimal-repr exposure
    (the HALF_UP/``F.round`` form this replaces could diverge from
    DuckDB's binary ``round`` one ulp below a repr-exact half).  With
    quantization pinned, float-summation order is the only remaining
    way the ARROW and HOF paths can diverge (near-exact-tie
    assignment flips, see ``_arrow_cell_partials``)."""
    import math

    spark = df.sparkSession
    vecs = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))

    init_rows = (
        vecs.orderBy("_id")
        .limit(k)
        .select(F.transform("_vec", lambda x: quantize_micro_col(x.cast("double"))).alias("c"))
        .collect()
    )
    centroids = [[float(x) for x in r["c"]] for r in init_rows]

    for _ in range(n_iters):
        if arrow:
            partials = _arrow_cell_partials(vecs, centroids).collect()
            acc: dict[int, tuple[int, list[list[float]]]] = {}
            for r in partials:
                n_prev, sums = acc.get(r["cell"], (0, []))
                acc[r["cell"]] = (n_prev + r["n"], sums + [list(r["s"])])
            new = {
                cell: [
                    quantize_micro(math.fsum(s[d] for s in sums) / n)
                    for d in range(len(sums[0]))
                ]
                for cell, (n, sums) in acc.items()
            }
        else:
            assigned = vecs.withColumn("cell", _argmin_cell("_vec", centroids))
            # per-(cell, position) means; map-side combine collapses the
            # posexplode before the shuffle, which then carries ~k x d rows
            means = (
                assigned.select("cell", F.posexplode("_vec").alias("pos", "v"))
                .groupBy("cell", "pos")
                .agg(F.avg(F.col("v").cast("double")).alias("m"))
                .groupBy("cell")
                .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
                .select("cell", F.transform("pm", lambda s: quantize_micro_col(s["m"])).alias("c"))
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
    # k x d bounded collect: the trained model is driver-sized by
    # construction, and inlining it as a literal makes the assignment
    # a zero-shuffle map pass (same trade as lloyd_kmeans itself)
    cent_rows = sorted(
        (int(r["cell"]), [float(x) for x in r["centroid"]])
        for r in centroids.collect()
    )
    assigned = vecs.select(
        _argmin_best(
            "_vec", [c for _, c in cent_rows], cells=[i for i, _ in cent_rows]
        ).alias("best")
    ).select(
        # coalesce makes the join key provably non-null: without it the
        # inner join on cell makes InferFiltersFromConstraints push an
        # isnotnull(<argmin>) filter BELOW this projection, evaluating
        # the whole k x d argmin TWICE per row (guide SS4.4's
        # duplication, expression flavor -- plan showed 2x the zip_with
        # folds; measured 1.19 -> 0.96 s at sf0.1).  Values unchanged:
        # best.cell is null only for a null embedding, whose row the
        # inner join dropped before and the -1 sentinel (no such
        # centroid) drops now.
        F.coalesce(F.col("best.cell"), F.lit(-1)).alias("cell"),
        F.col("best.d2").alias("d2"),
    )
    # outputs in exact integer micro-units (hash-stable, no round() of
    # doubles on either engine -- DuckDB computes the literal same
    # floor expression); sqrt is correctly rounded per IEEE-754 so the
    # input doubles are bit-identical cross-engine
    norm = micro_units_col(
        F.sqrt(F.aggregate(F.col("centroid"), F.lit(0.0), lambda a, v: a + v * v))
    )
    return (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            micro_units_col(F.avg("d2")).alias("avg_d2_micro"),
        )
        .join(centroids.select("cell", norm.alias("centroid_norm_micro")), on="cell")
        .select("cell", "n_vectors", "centroid_norm_micro", "avg_d2_micro")
    )
