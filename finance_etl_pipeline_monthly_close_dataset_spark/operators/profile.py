"""One-pass automatic table profiling.

The "describe my table" primitive every warehouse ships: per column —
row count, null count, exact distinct count, min / max (rendered as
strings so one tidy schema covers every input type). Everything folds
in a SINGLE aggregate pass over the table (one scan, one reduce), then
unpivots to one row per column via a literal explode; the unpivot
operates on a 1-row intermediate, so the only cost that grows with the
data is the shared scan.

Numeric columns render through a DECIMAL(38,6) cast so both engines
produce identical text for identical doubles (the table-fingerprint
convention; values beyond the 38,6 range fall back to a plain string
cast rather than NULL); timestamps render as ``yyyy-MM-dd HH:mm:ss``.

At 100 TB: one scan with ``dim`` aggregate expressions; the exact
distinct counts expand the aggregate (Spark plans multi-distinct via
expand), so for very wide tables swap ``approx_count_distinct`` in via
``exact_distinct=False`` — same shape, sketch-merged counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _render(col: F.Column, dtype: T.DataType) -> F.Column:
    if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        # DECIMAL(38,6): fixed 6-dp text identical across engines for
        # |v| < 10^32 (DECIMAL(18,6) silently NULLed anything >= 10^12).
        # Beyond that, fall back to the engine-native string rather
        # than report NULL -- a profile must never silently lose a
        # min/max; that tail renders engine-native and is documented.
        dec = col.cast("decimal(38,6)").cast("string")
        return F.when(dec.isNull() & col.isNotNull(), col.cast("string")).otherwise(
            dec
        )
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def profile_table(df: DataFrame, exact_distinct: bool = True) -> DataFrame:
    """Profile every column of ``df`` in one aggregate pass. Returns
    ``(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)``
    with one row per input column, in schema order."""
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        c = F.col(f.name)
        aggs.append(F.count(c).alias(f"__nn_{f.name}"))
        if exact_distinct:
            aggs.append(F.countDistinct(c).alias(f"__nd_{f.name}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{f.name}"))
        aggs.append(_render(F.min(c), f.dataType).alias(f"__mn_{f.name}"))
        aggs.append(_render(F.max(c), f.dataType).alias(f"__mx_{f.name}"))
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(f.name).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{f.name}")).alias("n_nulls"),
                F.col(f"__nd_{f.name}").alias("n_distinct"),
                F.col(f"__mn_{f.name}").alias("min_value"),
                F.col(f"__mx_{f.name}").alias("max_value"),
            )
            for f in df.schema.fields
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")
