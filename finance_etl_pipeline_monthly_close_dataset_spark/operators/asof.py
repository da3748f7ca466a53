"""As-of (last-value-before) join -- an operator Spark's DataFrame API
lacks, composed from built-ins (SURVEY.md §2.3 note: the reference's
FX lookup is exact-date; an as-of join is what a rate lookup becomes
when quotes are sparse).

Semantics: for each left row, attach the latest right row with the
same key whose timestamp is <= the left timestamp (backward as-of,
optionally bounded by a tolerance). Equivalent to DuckDB/pandas
``ASOF JOIN`` / ``merge_asof``.

Implementation is the union-and-carry-forward technique, not a range
join: tag both inputs, union them, and carry the most recent right
value forward within each key via ``last(..., ignorenulls=True)`` over
an ordered window. One shuffle on the key (the window partition) --
same cost as a single groupBy, independent of how many right rows
precede each left row. A naive range join (l JOIN r ON key AND r.ts
<= l.ts + max per pair) is O(pairs) and collapses at scale; this stays
O(n log n) per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: left rows + the latest right values at or
    before each left timestamp.

    ``value_cols`` are the right columns to attach (default: all
    non-key, non-ts columns). Right rows never appear in the output;
    left rows always do (null values when no right row precedes, or
    when the match is older than ``tolerance_seconds``).

    Tie rule: a right row with ts == left ts IS visible to that left
    row; among right rows sharing a timestamp the last one in the
    union's sort order wins (make right timestamps unique per key for
    full determinism).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join value columns collide with left columns: {sorted(clash)}; "
            "rename one side before joining"
        )

    # all value columns ride in ONE struct per right row, carried with a
    # single last(ignorenulls=True): every attached value comes from the
    # SAME matched row. (Carrying columns independently would back-fill
    # a null field from an OLDER right row -- diverging from pandas
    # merge_asof / DuckDB ASOF JOIN, which attach the matched row's
    # values nulls included.)
    if "_matched_ts" in value_cols:
        raise ValueError("asof_join: value column name '_matched_ts' is reserved")
    r_struct = F.struct(
        F.col(right_ts).cast("timestamp").alias("_matched_ts"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    r_struct_type = right.select(r_struct.alias("_rv")).schema["_rv"].dataType

    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_struct_type).alias("_rv"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_rv"),
    )

    # right rows sort before left rows at equal timestamps so an
    # equal-ts quote is visible to the left row
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "_is_left",
        "_l",
        F.last("_rv", ignorenulls=True).over(w).alias("_cv"),
    )

    out = carried.filter(F.col("_is_left") == 1)
    if tolerance_seconds is not None:
        matched_ts = F.col("_cv").getField("_matched_ts")
        in_tol = matched_ts.isNotNull() & (
            F.unix_timestamp(F.col("_l").getField(left_ts))
            - F.unix_timestamp(matched_ts)
            <= tolerance_seconds
        )
        out = out.select("_l", F.when(in_tol, F.col("_cv")).alias("_cv"))
    return out.select(
        *[F.col("_l").getField(c).alias(c) for c in left.columns],
        *[F.col("_cv").getField(c).alias(c) for c in value_cols],
    )
