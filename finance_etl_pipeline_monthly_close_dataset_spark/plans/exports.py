"""Flat BI dataset exporter (SURVEY.md §3.3).

Behavioral parity with ``/root/reference/scripts/export_bi_datasets.py``:
month-filtered fact (+ literal month column), KPI with margin %
columns in a stable order, DQ passthrough, one CSV per table plus a
``data_dictionary.txt`` describing the emitted schemas.

The margin ratio uses Spark division semantics: Revenue == 0 yields
null where pandas would produce ±inf (SURVEY.md §7.4 item 3).
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_parquet_or_empty
from ..sources.writers import write_csv_single_file
from .star import DATE_COL_CANDIDATES, filter_to_month, infer_month, pick_col

KPI_COLS = ["entity", "month", "Asset", "COGS", "Expense", "Revenue", "gross_profit", "operating_profit"]


def add_margin_cols(kpi: DataFrame) -> DataFrame:
    """gross/operating margin % of Revenue (reference lines 45-55)."""
    out = kpi
    if "Revenue" in out.columns:
        rev = F.col("Revenue").cast("double")
        if "gross_profit" in out.columns:
            out = out.withColumn("gross_margin_pct", F.col("gross_profit").cast("double") / rev * 100)
        if "operating_profit" in out.columns:
            out = out.withColumn(
                "operating_margin_pct", F.col("operating_profit").cast("double") / rev * 100
            )
    return out


def export_bi_datasets(
    spark: SparkSession,
    curated_dir: str | Path,
    month: str | None = None,
    out_dir: str | Path | None = None,
) -> Path:
    """Curated layer -> 5 flat CSVs + data dictionary (reference
    main(), lines 58-122)."""
    curated = Path(curated_dir)
    fact = read_parquet_or_empty(spark, str(curated / "fact_transactions.parquet"))
    dim_accounts = read_parquet_or_empty(spark, str(curated / "dim_accounts.parquet"))
    kpi = read_parquet_or_empty(spark, str(curated / "kpi_monthly.parquet"))

    if "month" in kpi.columns:
        kpi = kpi.withColumn("month", F.substring(F.col("month").cast("string"), 1, 7))

    month = month or infer_month(kpi)
    if not month:
        raise SystemExit("Could not infer month. Provide month=YYYY-MM.")
    out = Path(out_dir) if out_dir else Path("data") / "bi" / month
    os.makedirs(out, exist_ok=True)

    # DQ audit files pass through verbatim (strings: no numeric reformat)
    def _csv_or_empty(name: str) -> DataFrame:
        p = curated / name
        if p.exists():
            return spark.read.csv(str(p), header=True)
        return spark.createDataFrame([], "dataset string")

    dq_ex = _csv_or_empty("dq_exceptions.csv")
    dq_sum = _csv_or_empty("dq_summary.csv")

    date_col = pick_col(fact, DATE_COL_CANDIDATES)
    fact_m = filter_to_month(fact, date_col, month).withColumn("month", F.lit(month))
    if date_col:
        # committed goldens render the timestamp at date grain
        fact_m = fact_m.withColumn(date_col, F.to_date(F.col(date_col)))

    kpi_m = add_margin_cols(kpi)
    if "month" in kpi_m.columns:
        kpi_m = kpi_m.filter(F.col("month") == F.lit(month))
    keep = [c for c in KPI_COLS if c in kpi_m.columns] + [
        c for c in ("gross_margin_pct", "operating_margin_pct") if c in kpi_m.columns
    ]
    if keep:
        kpi_m = kpi_m.select(*keep)

    order_fact = [c for c in (date_col, "entity", "source", "document_id") if c]
    tables = {
        "fact_transactions": fact_m.orderBy(*order_fact) if order_fact else fact_m,
        # passthrough keeps the chart-of-accounts file order (the
        # reference writes the curated dim unsorted)
        "dim_accounts": dim_accounts,
        "kpi_monthly": kpi_m.orderBy("entity") if "entity" in kpi_m.columns else kpi_m,
        "dq_summary": dq_sum,
        "dq_exceptions": dq_ex,
    }
    for name, df in tables.items():
        write_csv_single_file(df, str(out / f"{name}.csv"))

    dd = [f"month={month}"]
    for name, df in tables.items():
        dd.append(f"{name}.csv columns={df.columns}")
    (out / "data_dictionary.txt").write_text("\n".join(dd), encoding="utf-8")
    return out
