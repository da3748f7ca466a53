"""Closed-form distributed OLS + residual outlier screening.

"Train a model inside the engine" in its simplest honest form: a
two-feature linear regression fit by the normal equations, where the
distributed work is ONE aggregate of exact integer moment sums and the
solve is a 3x3 Cramer expression over that single row. The
training-pipeline use is anomaly screening: fit ``tokens ~ chars +
<feature>`` over the corpus and surface the documents whose token
count deviates most from the length-based prediction -- whitespace-
stripped text, pathological tokenization, binary-ish payloads.

No reference counterpart (`/root/reference` is a finance close
pipeline); this extends the training-data operator family.

Engine-portable exactness (the repo's pinned float discipline):

* The moment sums (n, Sx1, Sx2, Sx1x1, Sx1x2, Sx2x2, Sy, Sx1y, Sx2y)
  are INTEGER sums of integer features -- exact, order-independent,
  shuffle-safe. This is why the features must be integers: a double
  feature would make the partial-aggregation order observable.
* The Cramer solve runs in doubles ON THE AGGREGATED ROW with every
  product and subtraction explicitly parenthesized, and the SAME
  generated expression string is used by the Spark plan and the DuckDB
  oracle (``det3_sql``) -- so the coefficients are bit-identical
  across engines. Integer sums stay exact in a double up to 2^53;
  beyond that (far past these SFs) the documented mitigation is
  mean-centering the features before the moments.
* Residual ranking happens on the BIGINT micro-quantized |residual|
  (the r10 micro_rank discipline), ties on the id.

Scale shape: pass 1 is one narrow aggregate to a single row (map-side
partials, one shuffle); the solve is driver-free (a 1-row projection);
pass 2 re-scans the features and joins the broadcast 1-row coefficient
frame -- two scans total, the same derived-threshold two-pass shape as
``corpus.token_budget_mix``, because persisting a corpus-sized feature
frame to save a scan is the wrong trade at 100 TB.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def det3_sql(m: list[list[str]]) -> str:
    """Fully parenthesized 3x3 determinant over column/expression
    names -- the SAME string feeds Spark and DuckDB, which is what
    makes the solve bit-identical across engines."""
    a11, a12, a13 = m[0]
    a21, a22, a23 = m[1]
    a31, a32, a33 = m[2]
    return (
        f"((({a11}) * ((({a22}) * ({a33})) - (({a23}) * ({a32}))))"
        f" - (({a12}) * ((({a21}) * ({a33})) - (({a23}) * ({a31})))))"
        f" + (({a13}) * ((({a21}) * ({a32})) - (({a22}) * ({a31}))))"
    )


#: The shared solve expressions over the aggregated moment row whose
#: double-cast columns are named n_d, sx1, sx2, s11, s12, s22, sy,
#: s1y, s2y. Used verbatim by both engines.
DET_A = det3_sql([["n_d", "sx1", "sx2"], ["sx1", "s11", "s12"], ["sx2", "s12", "s22"]])
DET_B0 = det3_sql([["sy", "sx1", "sx2"], ["s1y", "s11", "s12"], ["s2y", "s12", "s22"]])
DET_B1 = det3_sql([["n_d", "sy", "sx2"], ["sx1", "s1y", "s12"], ["sx2", "s2y", "s22"]])
DET_B2 = det3_sql([["n_d", "sx1", "sy"], ["sx1", "s11", "s1y"], ["sx2", "s12", "s2y"]])


def ols_fit_3x3(
    features: DataFrame,
    y_col: str = "y",
    x1_col: str = "x1",
    x2_col: str = "x2",
) -> DataFrame:
    """One-row coefficient frame ``(n, b0, b1, b2)`` for
    ``y ~ b0 + b1*x1 + b2*x2``, fit by exact integer moments + the
    shared Cramer expressions. The feature columns MUST be integral
    (see module docstring)."""
    y, x1, x2 = (F.col(c).cast("bigint") for c in (y_col, x1_col, x2_col))
    sums = features.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("_sx1"),
        F.sum(x2).alias("_sx2"),
        F.sum(x1 * x1).alias("_s11"),
        F.sum(x1 * x2).alias("_s12"),
        F.sum(x2 * x2).alias("_s22"),
        F.sum(y).alias("_sy"),
        F.sum(x1 * y).alias("_s1y"),
        F.sum(x2 * y).alias("_s2y"),
    )
    as_d = sums.select(
        "n",
        F.col("n").cast("double").alias("n_d"),
        *[
            F.col(f"_{c}").cast("double").alias(c)
            for c in ("sx1", "sx2", "s11", "s12", "s22", "sy", "s1y", "s2y")
        ],
    )
    return as_d.select(
        "n",
        F.expr(f"({DET_B0}) / ({DET_A})").alias("b0"),
        F.expr(f"({DET_B1}) / ({DET_A})").alias("b1"),
        F.expr(f"({DET_B2}) / ({DET_A})").alias("b2"),
    )


def residual_outliers(
    features: DataFrame,
    coefs: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    y_col: str = "y",
    x1_col: str = "x1",
    x2_col: str = "x2",
) -> DataFrame:
    """Top-k rows by absolute OLS residual: the 1-row coefficient
    frame broadcasts onto the feature scan, the residual
    ``y - ((b0 + (b1 * x1)) + (b2 * x2))`` is computed with pinned
    parenthesization, and the cut runs on the BIGINT micro units with
    id tie-break via sort+limit -- ``TakeOrderedAndProject``, the
    distributed partial top-k, NEVER a global-ordering window (the
    single-partition-window scale killer plan_lint sweeps for)."""
    joined = features.crossJoin(F.broadcast(coefs))
    scored = joined.select(
        F.col(id_col),
        F.col(y_col).cast("bigint").alias("y_obs"),
        F.expr(
            f"cast(floor(abs(cast({y_col} as double) - "
            f"((b0 + (b1 * cast({x1_col} as double))) + "
            f"(b2 * cast({x2_col} as double)))) * 1000000.0 + 0.5) as bigint)"
        ).alias("abs_resid_micro"),
    )
    return scored.orderBy(
        F.col("abs_resid_micro").desc(), F.col(id_col).asc()
    ).limit(k)
