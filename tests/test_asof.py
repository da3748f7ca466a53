"""As-of join semantics: backward match, equal-ts visibility,
no-match nulls, tolerance."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from finance_etl_pipeline_monthly_close_dataset_spark.operators.asof import asof_join


def _ts(h, m=0):
    return dt.datetime(2025, 6, 1, h, m)


def _trades(spark):
    return spark.createDataFrame(
        [
            ("AAA", _ts(10, 0), 100.0),
            ("AAA", _ts(10, 30), 50.0),
            ("AAA", _ts(9, 0), 10.0),   # before any quote
            ("BBB", _ts(10, 15), 70.0),
        ],
        "sym string, ts timestamp, qty double",
    )


def _quotes(spark):
    return spark.createDataFrame(
        [
            ("AAA", _ts(9, 30), 10.0),
            ("AAA", _ts(10, 0), 11.0),   # equal-ts: visible to 10:00 trade
            ("AAA", _ts(10, 20), 12.0),
            ("BBB", _ts(8, 0), 99.0),
        ],
        "sym string, ts timestamp, px double",
    )


def test_backward_asof_basic(spark):
    out = asof_join(_trades(spark), _quotes(spark), on="sym")
    got = {(r["sym"], r["ts"]): r["px"] for r in out.collect()}
    assert got[("AAA", _ts(10, 0))] == 11.0   # equal ts wins
    assert got[("AAA", _ts(10, 30))] == 12.0  # latest prior
    assert got[("AAA", _ts(9, 0))] is None    # nothing before
    assert got[("BBB", _ts(10, 15))] == 99.0
    assert out.count() == 4  # all left rows survive


def test_asof_tolerance(spark):
    out = asof_join(
        _trades(spark), _quotes(spark), on="sym", tolerance_seconds=30 * 60
    )
    got = {(r["sym"], r["ts"]): r["px"] for r in out.collect()}
    assert got[("AAA", _ts(10, 30))] == 12.0   # 10 min old: within 30 min
    assert got[("BBB", _ts(10, 15))] is None   # 2h15m old: too stale


def test_asof_multiple_value_cols(spark):
    quotes = _quotes(spark).withColumn("venue", F.concat(F.lit("v_"), F.col("px").cast("int")))
    out = asof_join(_trades(spark), quotes, on="sym", value_cols=["px", "venue"])
    row = {(r["sym"], r["ts"]): r for r in out.collect()}[("AAA", _ts(10, 30))]
    assert row["px"] == 12.0 and row["venue"] == "v_12"


def test_asof_matches_duckdb_asof_join(spark):
    """Cross-engine check against DuckDB's native ASOF JOIN."""
    import duckdb

    trades = _trades(spark).toPandas()
    quotes = _quotes(spark).toPandas()
    con = duckdb.connect()
    con.register("trades", trades)
    con.register("quotes", quotes)
    want = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            """SELECT t.sym, t.ts, q.px
               FROM trades t ASOF LEFT JOIN quotes q
                 ON t.sym = q.sym AND t.ts >= q.ts"""
        ).fetchall()
    }
    got = {
        (r["sym"], r["ts"]): r["px"]
        for r in asof_join(_trades(spark), _quotes(spark), on="sym").collect()
    }
    assert got == want


def test_range_join_point_in_interval(spark):
    from finance_etl_pipeline_monthly_close_dataset_spark.operators.ranges import range_join

    points = spark.createDataFrame(
        [
            ("p1", _ts(10, 15)),
            ("p2", _ts(11, 30)),
            ("p3", _ts(9, 0)),   # outside every interval
            ("p4", _ts(10, 0)),  # boundary: start-inclusive
        ],
        "pid string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("i1", _ts(10, 0), _ts(11, 0)),
            ("i2", _ts(10, 30), _ts(12, 0)),  # overlaps i1: p2 in i2 only
        ],
        "iid string, start timestamp, end timestamp",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "ts", "start", "end").collect()
    )
    assert got == [("p1", "i1"), ("p2", "i2"), ("p4", "i1")]
    # bucket width far smaller than intervals must give the same answer
    got_small = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "ts", "start", "end", bucket_width_seconds=60
        ).collect()
    )
    assert got_small == got


def test_range_join_matches_naive_between(spark):
    import random

    rng = random.Random(7)
    points = spark.createDataFrame(
        [(i, _ts(9 + rng.randint(0, 5), rng.randint(0, 59))) for i in range(60)],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (j, _ts(9 + rng.randint(0, 4), rng.randint(0, 59)), rng.randint(10, 150))
            for j in range(25)
        ],
        "iid long, start timestamp, dur long",
    ).selectExpr("iid", "start", "start + make_interval(0,0,0,0,0,dur,0) as end")
    from finance_etl_pipeline_monthly_close_dataset_spark.operators.ranges import range_join

    fast = sorted(
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "ts", "start", "end", bucket_width_seconds=900).collect()
    )
    naive = sorted(
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals)
        .filter("ts >= start and ts <= end")
        .collect()
    )
    assert fast == naive


def test_asof_rejects_colliding_value_columns(spark):
    import pytest as _pytest

    trades = _trades(spark)  # has 'qty'
    quotes = _quotes(spark).withColumnRenamed("px", "qty")
    with _pytest.raises(ValueError, match="collide"):
        asof_join(trades, quotes, on="sym", value_cols=["qty"])


def test_asof_null_field_comes_from_matched_row_not_backfilled(spark):
    """When the MATCHED (latest) right row has a NULL value column, the
    output must carry that NULL -- not back-fill from an older right
    row (merge_asof / DuckDB ASOF JOIN semantics)."""
    left = spark.createDataFrame(
        [("k", _ts(11, 0))], "sym string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("k", _ts(9, 0), 1.0, 100.0),   # older row: both present
            ("k", _ts(10, 0), None, 200.0), # matched row: px NULL
        ],
        "sym string, ts timestamp, px double, sz double",
    )
    row = asof_join(left, right, on="sym").collect()[0]
    assert row["sz"] == 200.0
    assert row["px"] is None  # NOT 1.0 from the 9:00 row


def test_range_join_rejects_non_inner(spark):
    import pytest

    from finance_etl_pipeline_monthly_close_dataset_spark.operators.ranges import range_join

    df = spark.createDataFrame([( _ts(10),)], "ts timestamp")
    iv = spark.createDataFrame([(_ts(9), _ts(11))], "start timestamp, end timestamp")
    with pytest.raises(ValueError, match="inner"):
        range_join(df, iv, "ts", "start", "end", how="left")


def test_skew_joins_reject_right_outer(spark):
    import pytest

    from finance_etl_pipeline_monthly_close_dataset_spark.operators.skew import (
        broadcast_hot_keys_join,
        salted_join,
    )

    a = spark.createDataFrame([(1, "x")], "k int, v string")
    b = spark.createDataFrame([(1, "y")], "k int, w string")
    with pytest.raises(ValueError, match="left-oriented"):
        salted_join(a, b, on="k", how="right")
    with pytest.raises(ValueError, match="left-oriented"):
        broadcast_hot_keys_join(a, b, on="k", how="full")
