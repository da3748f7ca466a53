"""Measure z-order data skipping on a 10M-row two-predicate scan
(judge r3 task 6).

Writes the same 10M-row table (two independent uniform keys x, y in
[0, 4096)) under three layouts -- unsorted, linearly sorted on x, and
z-ordered on (x, y) -- then evaluates a box predicate
``x in [lo, lo+w) AND y in [lo, lo+w)`` two ways:

* **stats pruning** (the 100 TB quantity): per parquet FILE and per
  ROW GROUP, count how many must be touched given their min/max
  footer statistics -- exactly the skipping decision Spark's parquet
  reader makes from pushed filters;
* **wall time**: the Spark scan under each layout (same filter).

Prints one JSON line; the PLANS.md z-order row records the result.

Usage: python tools/zorder_bench.py [n_rows] [n_files] [box_width]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from finance_etl_pipeline_monthly_close_dataset_spark.operators.layout import (  # noqa: E402
    write_zordered,
)
from finance_etl_pipeline_monthly_close_dataset_spark.session import get_spark  # noqa: E402

DOMAIN = 4096


def stats_prune(path: str, cols: list[str], lo: int, hi: int) -> dict:
    """Files / row groups whose [min,max] intersects [lo,hi) on every
    predicate column."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    f_hit = rg_hit = rg_total = rows_hit = rows_total = 0
    for fp in files:
        meta = pq.ParquetFile(fp).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        file_touches = False
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            rg_total += 1
            rows_total += rg.num_rows
            ok = True
            for col in cols:
                st = rg.column(names[col]).statistics
                if st is not None and (st.max < lo or st.min >= hi):
                    ok = False
                    break
            if ok:
                rg_hit += 1
                rows_hit += rg.num_rows
                file_touches = True
        if file_touches:
            f_hit += 1
    return {
        "files": len(files), "files_read": f_hit,
        "row_groups": rg_total, "row_groups_read": rg_hit,
        "rows_total": rows_total, "rows_scanned": rows_hit,
    }


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    width = int(sys.argv[3]) if len(sys.argv) > 3 else 256  # 1/16 of each axis

    spark = get_spark(app_name="zorder-bench")
    base = tempfile.mkdtemp(prefix="zorder_bench_")

    # two independent uniform keys + a payload column
    df = spark.range(n_rows).select(
        F.pmod(F.xxhash64("id"), F.lit(DOMAIN)).cast("int").alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(DOMAIN)).cast("int").alias("y"),
        F.col("id").alias("payload"),
    )

    layouts = {}
    p_plain = os.path.join(base, "plain")
    df.repartition(n_files).write.parquet(p_plain)
    layouts["unsorted"] = p_plain

    p_linear = os.path.join(base, "linear_x")
    df.repartitionByRange(n_files, "x").sortWithinPartitions("x").write.parquet(p_linear)
    layouts["linear_x"] = p_linear

    p_z = os.path.join(base, "zorder_xy")
    write_zordered(df, p_z, "x", "y", bits=12, num_files=n_files)
    layouts["zorder_xy"] = p_z

    lo, hi = DOMAIN // 2, DOMAIN // 2 + width
    predicates = {
        "x_only": ["x"],      # linear layout's home turf
        "y_only": ["y"],      # where a linear-on-x layout cannot prune at all
        "x_and_y": ["x", "y"],
    }
    out = {"n_rows": n_rows, "n_files": n_files,
           "box": f"[{lo},{hi}) per predicate column", "results": {}}
    for pname, cols in predicates.items():
        out["results"][pname] = {}
        for lname, path in layouts.items():
            entry = stats_prune(path, cols, lo, hi)
            cond = None
            for c in cols:
                cc = (F.col(c) >= lo) & (F.col(c) < hi)
                cond = cc if cond is None else (cond & cc)
            t0 = time.time()
            n = spark.read.parquet(path).filter(cond).count()
            entry["scan_sec"] = round(time.time() - t0, 2)
            entry["result_rows"] = n
            out["results"][pname][lname] = entry

    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
