"""Distribution drift between two corpus snapshots.

A continuously-ingested training corpus needs a cheap, mechanical
answer to "did this month's crawl change shape?" before the expensive
downstream stages run. This operator compares two snapshots'
histograms of any numeric column (document length, token count,
quality score) per group (language, source) and emits two standard
drift statistics:

* **total variation distance** ``0.5 * sum_b |p_b - q_b|`` -- the
  fraction of mass that moved, in [0, 1];
* **chi-square distance** ``sum_b (p_b - q_b)^2 / (p_b + q_b)`` --
  quadratic, more sensitive to moves in small buckets.

PSI (the industry's usual drift score) needs ``ln``, which is 1-ulp
libm-dependent and therefore NOT engine-portable; both statistics here
use only +, -, *, /, abs on doubles, each individually exact, with the
bucket fold pinned LEFT-TO-RIGHT in bucket order in both this plan and
the SQL oracle -- the same float discipline as ``corpus.
temperature_mix``. Buckets are exact integer division
(``value div bucket_width``), never quantiles (quantile edges are
estimation-dependent and would make the oracle approximate).

No reference counterpart (`/root/reference` is a finance close
pipeline); this is a first-class training-data-pipeline operator like
`operators/dedup.py`.

Scale shape: each snapshot contributes ONE narrow (group, bucket)
count aggregate; the union's conditional sums keep both sides in a
single shuffle; per-group totals derive from the bucket counts (no
second scan); the bucket lists that get folded are bounded by
(groups x buckets), never by rows.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def histogram_drift(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "lang",
    bucket_width: int = 200,
) -> DataFrame:
    """Per-group drift statistics between ``baseline`` and ``current``.

    Returns one row per group: ``n_buckets`` (union of occupied
    buckets), ``tvd`` and ``chi_square`` (rounded to 6 dp for
    cross-engine hashing; the unrounded doubles are bit-identical
    across engines by construction).
    """
    bucket = F.expr(f"cast({value_col} as bigint) div {bucket_width}")

    def _side(df: DataFrame, tag: int) -> DataFrame:
        return df.select(
            F.col(group_col).alias("g"),
            bucket.alias("b"),
            F.lit(tag).alias("_side"),
        )

    tagged = _side(baseline, 0).unionByName(_side(current, 1))
    # persisted: cnts feeds BOTH the totals aggregate and the terms
    # join; without the persist Catalyst re-derives the subtree and
    # each snapshot scans twice (4 scans total). The frame is bounded
    # by groups x buckets, so caching it is metadata-cheap.
    cnts = tagged.groupBy("g", "b").agg(
        F.sum(F.when(F.col("_side") == 0, 1).otherwise(0)).alias("cb"),
        F.sum(F.when(F.col("_side") == 1, 1).otherwise(0)).alias("cc"),
    ).persist()
    # per-group totals derive from the bucket counts: no extra scan,
    # and the tiny (groups) frame broadcasts back
    tot = cnts.groupBy("g").agg(
        F.sum("cb").alias("tb"), F.sum("cc").alias("tc")
    )
    terms = cnts.join(F.broadcast(tot), on="g").select(
        "g",
        "b",
        (F.col("cb").cast("double") / F.col("tb").cast("double")).alias("p"),
        (F.col("cc").cast("double") / F.col("tc").cast("double")).alias("q"),
    )
    packed = terms.select(
        "g",
        F.struct(
            F.col("b"),
            F.expr("abs(p - q)").alias("tvd_term"),
            F.expr("((p - q) * (p - q)) / (p + q)").alias("chi_term"),
        ).alias("_t"),
    ).groupBy("g").agg(
        F.expr("array_sort(collect_list(_t))").alias("_ts")
    )
    return packed.select(
        F.col("g").alias(group_col),
        F.size("_ts").alias("n_buckets"),
        F.round(
            F.lit(0.5)
            * F.expr(
                "aggregate(_ts, cast(0.0 as double), (acc, x) -> acc + x.tvd_term)"
            ),
            6,
        ).alias("tvd"),
        F.round(
            F.expr(
                "aggregate(_ts, cast(0.0 as double), (acc, x) -> acc + x.chi_term)"
            ),
            6,
        ).alias("chi_square"),
    )
