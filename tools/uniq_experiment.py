"""Decompose the lakefed dq_sweep cost and A/B the uniqueness check
shapes at volume (r14, judge r13 ask #2).

The r13 PLANS row names the lakefed dq_sweep residual (47.7 s at 100M)
as "the check explode + two uniqueness group-bys (an 80M-row shuffle on
2 string columns)".  Before committing to a lever, measure the parts:

  explode     row-level check explode over sales+expenses (no unique)
  uniq_str    current shape: groupBy(key cols).count().filter(>1)
  uniq_hash   two-phase exact: xxhash64 pre-agg (long shuffle) ->
              candidate hashes -> broadcast semi-join back -> exact
              groupBy on the tiny matched subset (collision-safe: the
              final counts come from the real key columns)

Usage: python tools/uniq_experiment.py [n_rows]
Prints one JSON line.  Exclusive-run protocol: serialize with
everything else on this box.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from finance_etl_pipeline_monthly_close_dataset_spark.config import Settings
from finance_etl_pipeline_monthly_close_dataset_spark.plans.quality import (
    build_dataset_specs,
    checked_slice,
    collect_exceptions,
)
from finance_etl_pipeline_monthly_close_dataset_spark.session import get_spark
from finance_etl_pipeline_monthly_close_dataset_spark.sources.raw_lake import (
    ingest_raw_to_lake,
    read_raw_lake,
)
from tools.stress_pipeline import MONTH, generate


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10_000_000
    spark = get_spark(app_name="uniq-experiment")
    base = tempfile.mkdtemp(prefix="uniqexp_")
    out: dict = {"n_rows": n_rows}
    try:
        raw_dir = os.path.join(base, "raw")
        ref_dir = os.path.join(base, "ref")
        lake = os.path.join(base, "lake")
        t0 = time.time()
        generate(spark, raw_dir, ref_dir, n_rows, skew=False)
        out["t_generate"] = round(time.time() - t0, 1)
        t0 = time.time()
        ingest_raw_to_lake(spark, MONTH, raw_dir, lake)
        out["t_ingest"] = round(time.time() - t0, 1)

        settings = Settings()
        specs = build_dataset_specs(settings.allowed_currencies, settings.base_currency)
        frames = {
            name: read_raw_lake(spark, lake, name, MONTH)
            for name in ("sales", "expenses")
        }

        def timed(label: str, fn) -> None:
            t = time.time()
            n = fn()
            out[label] = {"s": round(time.time() - t, 1), "n": n}
            print(f"{label}: {out[label]}", file=sys.stderr)

        # A. row-level explode only (strip unique_keys from the spec)
        def explode_only() -> int:
            total = 0
            for name, df in frames.items():
                import dataclasses

                spec = dataclasses.replace(specs[name], unique_keys=[])
                total += collect_exceptions(
                    checked_slice(df, spec), spec, persist_intermediates=False
                ).count()
            return total

        # B. current uniqueness shape (string-key groupBy)
        def uniq_str() -> int:
            total = 0
            for name, df in frames.items():
                for keys in specs[name].unique_keys:
                    total += (
                        df.groupBy(*keys)
                        .count()
                        .filter(F.col("count") > 1)
                        .count()
                    )
            return total

        # C. two-phase exact via xxhash64
        def uniq_hash() -> int:
            total = 0
            for name, df in frames.items():
                for keys in specs[name].unique_keys:
                    slim = df.select(*keys)
                    h = F.xxhash64(*[F.col(k) for k in keys]).alias("_kh")
                    cand = (
                        slim.select(h)
                        .groupBy("_kh")
                        .agg(F.count(F.lit(1)).alias("c"))
                        .filter(F.col("c") > 1)
                        .select("_kh")
                    )
                    dup = (
                        slim.join(
                            F.broadcast(cand),
                            F.xxhash64(*[F.col(k) for k in keys]) == F.col("_kh"),
                            "left_semi",
                        )
                        .groupBy(*keys)
                        .count()
                        .filter(F.col("count") > 1)
                    )
                    total += dup.count()
            return total

        timed("explode", explode_only)
        timed("uniq_str", uniq_str)
        timed("uniq_hash", uniq_hash)
        # repeat in reverse order to control for cache warm-up
        timed("uniq_hash_2", uniq_hash)
        timed("uniq_str_2", uniq_str)
        timed("explode_2", explode_only)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
