"""Unit tests for the DQ framework (SURVEY.md §2.7 Q1-Q17)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from finance_etl_pipeline_monthly_close_dataset_spark.plans.quality import (
    account_in_coa_exceptions,
    add_severity,
    build_dataset_specs,
    collect_exceptions,
    dq_overall_status,
    dq_summary_table,
    schema_shape_exceptions,
)

TS = dt.datetime(2025, 12, 10)

import pytest


@pytest.fixture(scope="module")
def specs(spark):
    # Column expressions need an active SparkContext -> built lazily
    return build_dataset_specs(("USD", "TZS", "EUR"), "USD")


def _sales(spark, rows):
    return spark.createDataFrame(
        rows,
        "date timestamp, entity string, invoice_id string, account_code string,"
        " currency string, amount double, description string",
    ).withColumn("_row_id", F.monotonically_increasing_id())


def test_row_level_checks_one_scan_collects_all(spark, specs):
    df = _sales(
        spark,
        [
            (TS, "TLM", "I1", "40000001", "XXX", -5.0, "bad ccy AND bad amount"),
            (TS, "TLM", "I2", "40000001", "USD", 10.0, "clean"),
            (None, "TLM", "I3", "40000001", "USD", 10.0, "null date"),
        ],
    )
    exc = collect_exceptions(df, specs["sales"]).collect()
    checks = sorted((r["column"], r["check"].split("(")[0]) for r in exc)
    assert checks == [
        ("amount", "greater_than"),
        ("currency", "isin"),
        ("date", "not_nullable"),
    ]


def test_duplicate_key_check(spark, specs):
    df = _sales(
        spark,
        [
            (TS, "TLM", "I1", "40000001", "USD", 5.0, "a"),
            (TS, "TLM", "I1", "40000001", "USD", 6.0, "b"),
        ],
    )
    exc = [r for r in collect_exceptions(df, specs["sales"]).collect() if "unique" in r["check"]]
    assert len(exc) == 1
    assert exc[0]["failure_case"] == "TLM|I1"


def test_payroll_identity(spark, specs):
    df = spark.createDataFrame(
        [
            ("2025-12", "TLM", "E1", "USD", 100.0, 20.0, 80.0),
            ("2025-12", "TLM", "E2", "USD", 100.0, 20.0, 75.0),
        ],
        "month string, entity string, employee_id string, currency string,"
        " gross double, deductions double, net double",
    )
    exc = collect_exceptions(df, specs["payroll"]).collect()
    assert len(exc) == 1 and "identity" in exc[0]["check"]


def test_schema_shape_strict(spark, specs):
    df = spark.createDataFrame([("x",)], "extra_col string")
    exc = schema_shape_exceptions(spark, df, specs["fx_rates"]).collect()
    kinds = {r["check"] for r in exc}
    assert "required_column_missing" in kinds and "column_not_in_schema" in kinds
    assert len(exc) == 5  # 4 missing + 1 extra


def test_coa_membership_anti_join(spark):
    df = _sales(spark, [(TS, "TLM", "I1", "99999999", "USD", 5.0, "")])
    dim = spark.createDataFrame([("40000001",)], "account_code string")
    exc = account_in_coa_exceptions(df, "sales", dim).collect()
    assert len(exc) == 1
    assert exc[0]["failure_case"] == "99999999"
    assert exc[0]["check"] == "account_in_coa"


def test_severity_rules(spark):
    rows = [
        ("sales", None, "currency", "isin([...])", "XXX", "Column", None, None),
        ("sales", None, "amount", "greater_than(0)", "-5", "Column", None, None),
        ("fx_rates", None, "rate", "greater_than(0)", "-1", "Column", None, None),
        ("sales", None, "description", "required_column_missing", "d", "DataFrameSchema", None, None),
        ("sales", None, "account_code", "account_in_coa", "999", "Column", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "dataset string, index long, column string, check string, failure_case string,"
        " schema_context string, check_number int, severity string",
    )
    sev = {(r["column"], r["check"]): r["severity"] for r in add_severity(df).collect()}
    assert sev[("currency", "isin([...])")] == "ERROR"  # key column
    assert sev[("amount", "greater_than(0)")] == "WARN"  # default
    assert sev[("rate", "greater_than(0)")] == "ERROR"  # fx_rates dataset
    assert sev[("description", "required_column_missing")] == "ERROR"  # 'required'
    assert sev[("account_code", "account_in_coa")] == "ERROR"


def _exc(spark, rows):
    return spark.createDataFrame(
        rows,
        "dataset string, index long, column string, check string, failure_case string,"
        " schema_context string, check_number int, severity string",
    )


def test_gate_modes(spark):
    warn_only = _exc(spark, [("sales", None, "amount", "gt", "-1", "Column", None, "WARN")])
    with_error = _exc(spark, [("sales", None, "currency", "isin", "XXX", "Column", None, "ERROR")])
    empty = _exc(spark, [])
    assert dq_overall_status(empty, "ERROR") == "PASS"
    assert dq_overall_status(warn_only, "ERROR") == "PASS"
    assert dq_overall_status(warn_only, "WARN") == "FAIL"
    assert dq_overall_status(with_error, "ERROR") == "FAIL"
    assert dq_overall_status(with_error, "NEVER") == "PASS"


def test_summary_zero_filled_scaffold(spark):
    exc = _exc(
        spark,
        [
            ("sales", None, "amount", "gt", "-1", "Column", None, "WARN"),
            ("fx_rates", None, "rate", "gt", "-1", "Column", None, "ERROR"),
        ],
    )
    rows = dq_summary_table(exc, fail_on="ERROR").collect()
    assert [r["dataset"] for r in rows] == [
        "sales", "expenses", "payroll", "inventory_movements", "fx_rates",
    ]
    by = {r["dataset"]: r for r in rows}
    assert by["sales"]["warn_count"] == 1 and by["sales"]["status"] == "PASS"
    assert by["fx_rates"]["error_count"] == 1 and by["fx_rates"]["status"] == "FAIL"
    assert by["payroll"]["issue_count"] == 0 and by["payroll"]["status"] == "PASS"


def test_dtype_coercion_check(spark, specs, tmp_path):
    """Unparseable values surface as coerce_dtype exceptions with the
    raw text as the failure case (pandera Q3 parity), severity ERROR
    (check name contains 'dtype')."""
    from finance_etl_pipeline_monthly_close_dataset_spark.schemas import SALES_SCHEMA
    from finance_etl_pipeline_monthly_close_dataset_spark.sources.readers import read_csv_typed

    p = tmp_path / "sales.csv"
    p.write_text(
        "date,entity,invoice_id,account_code,currency,amount,description\n"
        "2025-12-10,TLM,I1,40000001,USD,abc,bad amount\n"
        "not-a-date,TLM,I2,40000001,USD,5.0,bad date\n"
        "2025-12-11,TLM,I3,40000001,USD,7.5,clean\n"
        "2025-12-12,TLM,,40000001,USD,1.0,missing invoice\n"
    )
    df = read_csv_typed(spark, str(p), SALES_SCHEMA, with_row_id=True)
    exc = add_severity(collect_exceptions(df, specs["sales"])).collect()
    by_check = {(r["column"], r["check"].split("(")[0]): r for r in exc}
    amt = by_check[("amount", "coerce_dtype")]
    assert amt["failure_case"] == "abc"
    assert amt["severity"] == "ERROR"
    assert ("date", "coerce_dtype") in by_check
    # missing invoice_id is not_nullable, not a dtype failure
    assert ("invoice_id", "not_nullable") in by_check
    # typed values still parse for clean rows
    assert df.filter(F.col("amount") == 7.5).count() == 1


def test_coa_membership_fused_matches_anti_join(spark, specs):
    """r11: the pipeline evaluates Q12 as a fused row-level literal-set
    check (coa_membership_check) instead of a separate anti-join pass;
    the two forms must emit the SAME exception row-set -- including a
    NULL account_code, which a left-anti join keeps (null key never
    matches) and the fused predicate must keep via its isNull() arm."""
    from finance_etl_pipeline_monthly_close_dataset_spark.plans.quality import (
        coa_membership_check,
        collect_exceptions,
    )

    df = _sales(
        spark,
        [
            (TS, "TLM", "I1", "99999999", "USD", 5.0, ""),   # unknown code
            (TS, "TLM", "I2", "40000001", "USD", 5.0, ""),   # known code
            (TS, "TLM", "I3", None, "USD", 5.0, ""),          # NULL code
        ],
    )
    dim = spark.createDataFrame([("40000001",)], "account_code string")

    anti = {
        (r["index"], r["failure_case"])
        for r in account_in_coa_exceptions(df, "sales", dim).collect()
    }

    codes = [r[0] for r in dim.collect()]
    spec = specs["sales"]
    fused_spec = type(spec)(
        dataset=spec.dataset,
        columns=spec.columns,
        not_null=[],
        checks=[coa_membership_check(codes)],
        unique_keys=[],
    )
    fused = {
        (r["index"], r["failure_case"])
        for r in collect_exceptions(df, fused_spec).collect()
    }
    assert fused == anti and len(fused) == 2
    assert all(
        r["check"] == "account_in_coa" and r["column"] == "account_code"
        for r in collect_exceptions(df, fused_spec).collect()
    )
