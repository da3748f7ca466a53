"""Exclusive reproduction of the r13 bench drift (judge r13 ask #1).

Mirrors bench.py's protocol exactly -- same session conf, same
sf0.001 warmup, same clearCache + 3-runs-per-query loop -- but times
ONLY the drifted queries across N passes in one JVM, so the pass-decay
signature seen in BENCH_LOCAL_r13.json (docs_ngram_jaccard_recall
3.09 -> 2.42 -> 1.49 across passes 0/1/2) is either reproduced on a
quiet machine (=> JVM warm-up mechanism, not code and not foreign
load) or absent (=> environment-specific to that capture).

Usage: python tools/repro_drift.py [n_passes] [query ...]
Prints one JSON line with per-pass medians and spreads.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finance_etl_pipeline_monthly_close_dataset_spark import contract
from finance_etl_pipeline_monthly_close_dataset_spark.session import get_spark

DEFAULT_QUERIES = [
    "docs_ngram_jaccard_recall",
    "docs_minhash_near_dup",
    "docs_pack_budget",
    "customer_scd2",
    "docs_fingerprint",
    "docs_chunk_dedup",
    "nation_market_share",
]


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="repro_drift",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4MB",
            "spark.sql.files.openCostInBytes": "1MB",
        },
    )
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        contract.QUERIES[name](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    out: dict = {"passes": [], "loadavg_boot": list(os.getloadavg())}
    for p in range(n_passes):
        row: dict = {}
        for name in names:
            spark.catalog.clearCache()
            runs = []
            for _ in range(3):
                start = time.perf_counter()
                contract.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - start)
            runs.sort()
            row[name] = {
                "median": round(runs[1], 3),
                "spread": [round(runs[0], 3), round(runs[-1], 3)],
            }
        out["passes"].append(row)
        print(f"pass {p}: " + json.dumps(row), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
