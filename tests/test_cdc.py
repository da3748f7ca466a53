"""Snapshot diff (operators/cdc.py) and table checksums
(operators/sketches.py bucket_checksums)."""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_etl_pipeline_monthly_close_dataset_spark.operators.cdc import snapshot_diff
from finance_etl_pipeline_monthly_close_dataset_spark.operators.sketches import (
    bucket_checksums,
)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k bigint, price double, status string")


def test_snapshot_diff_classifies_all_change_types(spark):
    old = _snap(spark, [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C")])
    new = _snap(spark, [(2, 20.0, "B"), (3, 31.0, "C"), (4, 40.0, "D")])
    out = snapshot_diff(old, new, ["k"], ["price", "status"])
    got = {r["k"]: r["change_type"] for r in out.collect()}
    assert got == {1: "delete", 3: "update", 4: "insert"}
    upd = out.filter(F.col("k") == 3).first()
    assert upd["old_price"] == 30.0 and upd["new_price"] == 31.0


def test_snapshot_diff_null_transitions_are_updates(spark):
    # NULL -> value and value -> NULL must classify as update, and
    # NULL == NULL as unchanged (eqNullSafe struct comparison)
    old = _snap(spark, [(1, None, "A"), (2, 5.0, "B"), (3, None, "C")])
    new = _snap(spark, [(1, 1.0, "A"), (2, None, "B"), (3, None, "C")])
    out = snapshot_diff(old, new, ["k"], ["price", "status"])
    got = {r["k"]: r["change_type"] for r in out.collect()}
    assert got == {1: "update", 2: "update"}  # k=3 unchanged, excluded
    full = snapshot_diff(
        old, new, ["k"], ["price", "status"], include_unchanged=True
    )
    assert {r["k"]: r["change_type"] for r in full.collect()}[3] == "unchanged"


def test_bucket_checksums_order_and_partitioning_invariant(spark):
    df = spark.range(1000).select(
        F.col("id").alias("k"), F.concat(F.lit("row_"), F.col("id")).alias("s")
    )
    row_str = F.concat_ws("|", "k", "s")

    def sums(frame):
        return sorted(
            map(tuple, bucket_checksums(frame, row_str, F.col("k"), 8).collect())
        )

    base = sums(df)
    assert len(base) == 8 and sum(r[2] for r in base) == 1000
    # XOR checksum is order- and partitioning-independent
    assert sums(df.repartition(13).sortWithinPartitions(F.desc("k"))) == base
    # and any single-row change flips exactly one bucket's checksum
    tweaked = df.withColumn(
        "s", F.when(F.col("k") == 500, F.lit("CHANGED")).otherwise(F.col("s"))
    )
    diff = [a for a, b in zip(base, sums(tweaked)) if a != b]
    assert len(diff) == 1 and diff[0][0] == 500 % 8


def test_cli_diff_and_checksum_and_collocations(spark, tmp_path, capsys):
    from finance_etl_pipeline_monthly_close_dataset_spark import cli

    old_p, new_p = str(tmp_path / "old"), str(tmp_path / "new")
    _snap(spark, [(1, 10.0, "A"), (2, 20.0, "B")]).write.parquet(old_p)
    _snap(spark, [(2, 21.0, "B"), (3, 30.0, "C")]).write.parquet(new_p)

    out = str(tmp_path / "diff")
    rc = cli.main(["diff", "--old", old_p, "--new", new_p, "--keys", "k", "--out", out])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "insert: 1" in captured and "delete: 1" in captured and "update: 1" in captured
    back = {r["k"]: r["change_type"] for r in spark.read.parquet(out).collect()}
    assert back == {1: "delete", 2: "update", 3: "insert"}

    rc = cli.main(["checksum", "--in", old_p, "--key-col", "k", "--n-buckets", "2"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if "\t" in l]
    assert len(lines) == 2 and sum(int(l.split("\t")[2]) for l in lines) == 2

    docs = spark.createDataFrame(
        [(i, "alpha beta alpha beta gamma") for i in range(10)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    coll = str(tmp_path / "coll")
    rc = cli.main(["corpus", "collocations", "--in", src, "--out", coll,
                   "--min-count", "2", "--top-k", "5"])
    assert rc == 0
    rows = {r["bigram"]: r for r in spark.read.parquet(coll).collect()}
    assert "alpha beta" in rows and rows["alpha beta"]["c_ab"] == 20
