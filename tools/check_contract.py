"""Local stand-in for the driver's correctness gate.

Runs every contract query on Spark and its oracle on DuckDB at the
given scale factor, then compares row count, column names, and
order-insensitive values (exact on non-floats, tiny-epsilon report on
floats so float mismatches are visible before the driver sees them).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from finance_etl_pipeline_monthly_close_dataset_spark import contract
from finance_etl_pipeline_monthly_close_dataset_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    return v


def compare(name: str, spark_rows, spark_cols, duck_rows, duck_cols) -> list[str]:
    problems = []
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
    if [c.lower() for c in spark_cols] != [c.lower() for c in duck_cols]:
        problems.append(f"columns spark={spark_cols} duck={duck_cols}")
        return problems

    def key(row):
        return tuple(
            (f"{v:.9e}" if isinstance(v, float) else str(v)) for v in row
        )

    s_sorted = sorted([tuple(norm_cell(v) for v in r) for r in spark_rows], key=key)
    d_sorted = sorted([tuple(norm_cell(v) for v in r) for r in duck_rows], key=key)
    n_bad = 0
    max_rel = 0.0
    for sr, dr in zip(s_sorted, d_sorted):
        for sv, dv in zip(sr, dr):
            if isinstance(sv, float) and isinstance(dv, float):
                if sv != dv:
                    if math.isnan(sv) and math.isnan(dv):
                        continue
                    rel = abs(sv - dv) / max(abs(sv), abs(dv), 1e-300)
                    max_rel = max(max_rel, rel)
                    n_bad += 1
            elif sv != dv:
                n_bad += 1
    if len(s_sorted) != len(d_sorted):
        pass
    elif n_bad:
        problems.append(f"{n_bad} cell mismatches (max_rel_float_diff={max_rel:.3e})")
        for sr, dr in list(zip(s_sorted, d_sorted))[:2000]:
            if sr != dr:
                problems.append(f"  spark={sr}")
                problems.append(f"  duck ={dr}")
                break
    return problems


_DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
_DUCK_FLOAT = {"FLOAT", "DOUBLE"}
_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOAT = {"float", "double"}


def dtype_parity(spark_dtypes, duck_types_by_col) -> list[str]:
    """Numeric-class guard for the DRIVER's pandas canonicalization.

    fetchall() yields Python ints for HUGEINT, so the value compare
    passes -- but pandas renders HUGEINT as float64 (573850.0 vs
    573850), a hash mismatch downstream. Flag HUGEINT oracle columns
    (CAST the SUM AS BIGINT) and any int-vs-float class split between
    engines. int32-vs-int64 width differences are fine."""
    problems = []
    duck_types = {c.lower(): t for c, t in duck_types_by_col.items()}
    for col, sp_t in spark_dtypes:
        du_t = duck_types.get(col.lower())
        if du_t is None:
            continue
        if "HUGEINT" in du_t:
            problems.append(
                f"oracle column '{col}' is {du_t}: pandas floatifies it"
                " -- CAST(... AS BIGINT) in the oracle SQL"
            )
        elif sp_t in _SPARK_INT and du_t in _DUCK_FLOAT:
            problems.append(f"column '{col}' int on spark ({sp_t}) vs float on duckdb ({du_t})")
        elif sp_t in _SPARK_FLOAT and du_t in _DUCK_INT:
            problems.append(f"column '{col}' float on spark ({sp_t}) vs int on duckdb ({du_t})")
    return problems


def duck_connect(sf_dir: str):
    # DuckDB 1.0 takes one mmap per buffer block; the synthvecs volume
    # oracles need ~120k mappings vs the 65530 Linux default. Raise the
    # (system-wide) sysctl here -- the oracle-harness entrypoint --
    # rather than at library import (round-12 ADVICE fix).
    contract._raise_map_count()
    con = duckdb.connect()
    # Bound the oracle engine's footprint and let it SPILL instead of
    # malloc-failing (r11: a synthvecs oracle hit a transient
    # "Out of Memory Error: Failed to allocate block" right after a
    # 100M-row close freed its JVM -- system memory was still being
    # reclaimed.  DuckDB's default limit is 80% of RAM with no temp
    # directory, so any transient squeeze is a hard failure; with a
    # 24 GB cap + spill dir the same squeeze degrades to out-of-core.)
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for tbl in TABLES:
        p = f"{sf_dir}/{tbl}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{p}'")
    return con


def run_check(spark, con, sf_dir: str, only=None, show_time: bool = False):
    """Run every (or the selected) contract query vs its oracle at one
    scale factor. Returns {name: {"ok": bool, "rows": int,
    "oracle": "duckdb"|"rows-only", "seconds": float, "err": str|None}}
    and prints the human-readable report as it goes."""
    import time

    results: dict[str, dict] = {}
    for name, fn in contract.QUERIES.items():
        if only and name not in only:
            continue
        # queries persist() intermediates for their own single-scan
        # plans; each sweep iteration builds fresh DataFrames, so
        # without this the cached blocks of 150 queries accumulate for
        # the session's life and degrade the tail of the sweep
        spark.catalog.clearCache()
        sql = contract.ORACLES.get(name)
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            results[name] = {
                "ok": False, "rows": None, "oracle": "duckdb",
                "seconds": round(time.perf_counter() - t0, 2),
                "err": f"spark: {exc}"[:200],
            }
            continue
        if sql is None:
            print(f"ok*   {name}: rows-only, {len(spark_rows)} rows")
            results[name] = {
                "ok": True, "rows": len(spark_rows), "oracle": "rows-only",
                "seconds": round(time.perf_counter() - t0, 2), "err": None,
            }
            continue
        try:
            res = con.execute(sql)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            results[name] = {
                "ok": False, "rows": len(spark_rows), "oracle": "duckdb",
                "seconds": round(time.perf_counter() - t0, 2),
                "err": f"duckdb: {exc}"[:200],
            }
            continue
        problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        try:
            rel = con.sql(sql)
            duck_types = dict(zip(rel.columns, (str(t).upper() for t in rel.types)))
        except Exception:  # noqa: BLE001
            duck_types = {}
        problems += dtype_parity(sdf.dtypes, duck_types)
        elapsed = round(time.perf_counter() - t0, 2)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
            results[name] = {
                "ok": False, "rows": len(spark_rows), "oracle": "duckdb",
                "seconds": elapsed, "err": "; ".join(problems)[:200],
            }
        else:
            suffix = f"  [{elapsed:.1f}s]" if show_time else ""
            print(f"ok    {name}: {len(spark_rows)} rows match{suffix}")
            results[name] = {
                "ok": True, "rows": len(spark_rows), "oracle": "duckdb",
                "seconds": elapsed, "err": None,
            }
    return results


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "-t"]
    show_time = "-t" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = get_spark(app_name="check-contract")
    con = duck_connect(sf_dir)
    results = run_check(spark, con, sf_dir, only, show_time)
    failures = sum(1 for r in results.values() if not r["ok"])
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
