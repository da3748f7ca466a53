"""Capture .explain('formatted') for the bench-timed queries.

Usage: python tools/capture_plans.py <tag> [query ...]

Writes plans/r15/<query>_<tag>.txt for every timed query (default:
bench HEADLINE + HEAVY) -- the optimization round's before/after plan
evidence.  Construction-side jobs (e.g. lloyd_kmeans' iteration
collects) run as part of building the DataFrame, exactly as the bench
does, so the captured plan is the final action's plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from finance_etl_pipeline_monthly_close_dataset_spark import contract  # noqa: E402
from finance_etl_pipeline_monthly_close_dataset_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or (bench.HEADLINE + bench.HEAVY)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r16"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="capture_plans",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4MB",
            "spark.sql.files.openCostInBytes": "1MB",
        },
    )
    for name in names:
        try:
            spark.catalog.clearCache()
            df = contract.QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
