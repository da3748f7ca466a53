"""Regenerate QUERIES.md from contract.QUERIES / contract.ORACLES."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finance_etl_pipeline_monthly_close_dataset_spark import contract


def main() -> None:
    n = len(contract.QUERIES)
    n_oracle = sum(1 for k in contract.QUERIES if k in contract.ORACLES)
    lines = [
        "# QUERIES — the driver-contract catalog",
        "",
        f"{n} queries; {n_oracle} have exact DuckDB oracles (value-hash-matched "
        "at sf0.001 and sf0.01; spot-validated at sf0.1), the rest are "
        "approximate/iterative and rows-only checked. Each entry is a callable "
        "`(spark, sf_dir) -> DataFrame` in "
        "`finance_etl_pipeline_monthly_close_dataset_spark/contract.py`.",
        "",
        "| query | oracle | what it exercises |",
        "|---|---|---|",
    ]
    for name, fn in contract.QUERIES.items():
        doc = (fn.__doc__ or "").strip().splitlines()
        para: list[str] = []
        for seg in doc:
            if not seg.strip():
                break
            para.append(seg.strip())
        first = " ".join(para).replace("|", "\\|")
        kind = "exact" if name in contract.ORACLES else "rows-only"
        lines.append(f"| `{name}` | {kind} | {first} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {n} queries, {n_oracle} oracles")


if __name__ == "__main__":
    main()
