"""Z-order (Morton-curve) data layout for multi-dimensional data skipping.

A lake sorted on one column prunes parquet row groups only for
predicates on that leading column; a 100 TB scan filtered on the
*other* dimension reads everything. Interleaving the bits of two key
columns and range-partitioning + sorting on the interleaved value
makes every output file cover a tight hyper-rectangle in BOTH
dimensions, so parquet min/max statistics prune box predicates on
either column. This is the layout-time lever (Delta/Iceberg
``OPTIMIZE ZORDER BY``) re-expressed with stock Spark primitives:
one range repartition + in-partition sort, no custom writer.

The z-value is a pure bit-twiddling column expression (shift/and/or
chain, whole-stage codegen'd, no UDF) and is dropped before write --
the layout, not the schema, carries the information.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: result bit 2i is bit i of ``a``, bit 2i+1 is bit
    i of ``b``. Values beyond ``bits`` bits fold into the same cell
    (upper bits are ignored), which coarsens -- never breaks -- the
    layout. Pure expression; codegen keeps it JVM-side."""
    a = a.cast("long")
    b = b.cast("long")
    out = None
    for i in range(bits):
        ta = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        tb = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        out = ta.bitwiseOR(tb) if out is None else out.bitwiseOR(ta).bitwiseOR(tb)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet laid out along the z-curve of
    (``col_a``, ``col_b``).

    ``repartitionByRange`` on the z-value gives each output file a
    contiguous z-range (a small set of curve tiles => tight min/max
    in both source columns); ``sortWithinPartitions`` tightens the
    per-row-group statistics inside each file. At cluster scale
    ``num_files`` is sized so files land near the row-group /
    maxPartitionBytes sweet spot (~128 MB)."""
    z = z_value(F.col(col_a), F.col(col_b), bits=bits)
    out = df.withColumn("__z", z)
    if num_files is not None:
        out = out.repartitionByRange(num_files, "__z")
    else:
        out = out.repartitionByRange("__z")
    out.sortWithinPartitions("__z").drop("__z").write.mode("overwrite").parquet(path)
