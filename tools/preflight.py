"""Testdata schema pre-flight.

Round 2 broke because the driver regenerated ``events.parquet`` with a
``timestamp[us]`` ``ts`` column (it was INT64 nanos in round 1) and the
repo never noticed until 18 queries, the bench, and two tests failed at
grade time.  This check reads every parquet footer the contract depends
on (pyarrow only -- no Spark startup) and fails loudly, naming the
drifted column and the type actually observed, so an environment change
costs one readable error instead of a round of evidence.

Usage: python tools/preflight.py [sf_dir ...]   (default: all three SFs)
"""

from __future__ import annotations

import os
import sys

import pyarrow.dataset as ds
import pyarrow.types as pat

DEFAULT_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# column -> predicate(type) -> ok; message names every accepted family.
def _is_ts_or_int64(t) -> bool:
    return pat.is_timestamp(t) or pat.is_int64(t)


EXPECTATIONS = {
    ("events", "ts"): (_is_ts_or_int64, "timestamp[*] or int64(nanos)"),
    ("events", "user_id"): (pat.is_integer, "integer"),
    ("events", "event_type"): (pat.is_string, "string"),
    ("events", "props"): (pat.is_string, "string (json)"),
    ("documents", "doc_id"): (pat.is_integer, "integer"),
    ("documents", "text"): (pat.is_string, "string"),
    ("embeddings", "vec_id"): (pat.is_integer, "integer"),
    ("embeddings", "label"): (pat.is_integer, "integer"),
    ("embeddings", "embedding"): (
        lambda t: (pat.is_list(t) or pat.is_fixed_size_list(t))
        and pat.is_floating(t.value_type),
        "list<floating>",
    ),
    ("orders", "o_orderdate"): (
        lambda t: pat.is_date(t) or pat.is_timestamp(t) or pat.is_string(t),
        "date/timestamp/string",
    ),
    ("lineitem", "l_extendedprice"): (
        lambda t: pat.is_decimal(t) or pat.is_floating(t),
        "decimal/floating",
    ),
}


def check_dir(sf_dir: str) -> list[str]:
    problems: list[str] = []
    for table in TABLES:
        path = os.path.join(sf_dir, f"{table}.parquet")
        if not os.path.exists(path):
            problems.append(f"{sf_dir}: missing table {table}.parquet")
            continue
        schema = ds.dataset(path, format="parquet").schema
        for (tbl, col), (pred, wanted) in EXPECTATIONS.items():
            if tbl != table:
                continue
            if col not in schema.names:
                problems.append(f"{sf_dir}/{table}: column {col} MISSING")
                continue
            typ = schema.field(col).type
            if not pred(typ):
                problems.append(
                    f"{sf_dir}/{table}.{col}: observed {typ}, expected {wanted}"
                )
    return problems


def main() -> int:
    dirs = sys.argv[1:] or [d for d in DEFAULT_DIRS if os.path.isdir(d)]
    all_problems: list[str] = []
    for sf_dir in dirs:
        probs = check_dir(sf_dir)
        all_problems.extend(probs)
        status = "DRIFTED" if probs else "ok"
        print(f"{status:8s} {sf_dir}")
    for p in all_problems:
        print(f"  !! {p}")
    if all_problems:
        print(f"{len(all_problems)} schema drift(s) -- fix contract helpers before running")
        return 1
    print("preflight clean: all testdata schemas match contract expectations")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
