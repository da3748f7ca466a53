"""Benchmark harness: runs the headline contract queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query materializes fully via the noop sink (no driver-side
collect in the timed path) so timings reflect executor work, not
result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from finance_etl_pipeline_monthly_close_dataset_spark import contract
from finance_etl_pipeline_monthly_close_dataset_spark.session import get_spark

HEADLINE = [
    "flagship_revenue_by_month",
    "pricing_summary",
    "status_pivot",
    "topk_customers",
    "brand_revenue",
    "revenue_share",
    "duplicate_keys",
    "events_hourly",
    "events_sessions",
    "docs_quality",
    "docs_fingerprint",
    "docs_minhash_near_dup",
    "embedding_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")

    spark = get_spark(app_name="bench")
    # warm the JVM + parquet footers with one tiny action
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = contract.QUERIES[name]
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
