"""End-to-end monthly-close orchestration (SURVEY.md §3.1).

Mirrors ``run_month`` at
``/root/reference/src/finance_etl/pipeline.py:50-191``:

read typed CSVs -> collect ALL DQ exceptions -> severity -> write
audit CSVs (ALWAYS, even when about to fail) -> gate -> month-window
filter -> FX prep -> fact build -> KPI pivot -> Parquet sinks.

Lazy-engine adaptation (SURVEY.md §7.4 item 7): the exceptions
DataFrame is the one forced materialization point mid-pipeline -- it
is cached before the gate decision, reused for the audit files, and
the pipeline then proceeds from the ORIGINAL inputs (validation is a
side-channel, not a transform -- Q17). Stages 6-9 stay one lazy plan
until the writes.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import Settings
from ..functions.datetime_fns import month_window
from ..schemas import (
    COA_SCHEMA,
    DQ_EXCEPTIONS_SCHEMA,
    EXPENSES_SCHEMA,
    FX_SCHEMA,
    INVENTORY_SCHEMA,
    PAYROLL_SCHEMA,
    SALES_SCHEMA,
)
from ..sources.readers import ROW_ID_COL, read_csv, read_csv_typed
from ..sources.writers import write_csv_single_file, write_parquet
from .quality import (
    add_severity,
    build_dataset_specs,
    collect_exceptions,
    dq_overall_status,
    dq_summary_table,
    schema_shape_exceptions,
)
from .transforms import build_dim_accounts, fx_to_base, kpi_monthly, to_fact_transactions


class DataQualityGateError(ValueError):
    """Raised when the DQ gate fails (reference pipeline.py:145-146)."""


# Q12 fusion guard (ADVICE r11): the chart of accounts is collected to
# the driver and inlined as a literal isin ONLY below this row count;
# over the cap the close falls back to the broadcast anti-join so an
# unexpectedly large chart can't bloat codegen or OOM the driver.
# Module-level so tests can monkeypatch it to force the fallback path.
COA_FUSION_CAP = 10_000


def run_month(
    spark: SparkSession,
    settings: Settings,
    month: str,
    raw_dir: str | Path,
    curated_dir: str | Path,
    reference_dir: str | Path,
    fail_on: str = "ERROR",
    lake_dir: str | Path | None = None,
) -> dict[str, Path]:
    """Run the monthly close. ``lake_dir``, if given, additionally
    upserts this month's fact rows into a month-partitioned parquet
    lake (``fact_transactions/month=YYYY-MM/``): with dynamic
    partition overwrite only the processed month's partition is
    replaced, and downstream month filters prune to one partition
    instead of scanning history."""
    fail_on = (fail_on or "ERROR").upper().strip()
    if fail_on not in {"ERROR", "WARN", "NEVER"}:
        raise ValueError("fail_on must be one of: ERROR, WARN, NEVER")

    # per-stage wall clock (r10): regressions in the close attribute to
    # a STAGE, not just the total -- surfaced via outputs["stage_seconds"]
    # and printed by tools/stress_pipeline.py
    import time as _time

    _stages: dict[str, float] = {}
    _t0 = _time.perf_counter()

    def _mark(stage: str) -> None:
        nonlocal _t0
        now = _time.perf_counter()
        _stages[stage] = round(now - _t0, 2)
        _t0 = now

    raw_dir, curated_dir, reference_dir = Path(raw_dir), Path(curated_dir), Path(reference_dir)
    os.makedirs(curated_dir, exist_ok=True)

    # -- reference + raw scans (typed, no inference) -------------------------
    coa = read_csv(spark, str(reference_dir / "chart_of_accounts.csv"), COA_SCHEMA)
    dim_accounts = build_dim_accounts(coa)

    sales = read_csv_typed(spark, str(raw_dir / "sales.csv"), SALES_SCHEMA, with_row_id=True)
    expenses = read_csv_typed(spark, str(raw_dir / "expenses.csv"), EXPENSES_SCHEMA, with_row_id=True)
    payroll = read_csv_typed(spark, str(raw_dir / "payroll.csv"), PAYROLL_SCHEMA, with_row_id=True)
    inventory = read_csv_typed(
        spark, str(raw_dir / "inventory_movements.csv"), INVENTORY_SCHEMA, with_row_id=True
    )
    fx_rates = read_csv_typed(spark, str(raw_dir / "fx_rates.csv"), FX_SCHEMA, with_row_id=True)

    frames = {
        "sales": sales,
        "expenses": expenses,
        "payroll": payroll,
        "inventory_movements": inventory,
        "fx_rates": fx_rates,
    }

    # -- DQ collection (pandera-lazy equivalent: ALL failures) ---------------
    # sales/expenses fan into TWO check families (row-level explode --
    # which since r11 includes the COA membership check as a fused
    # literal-set predicate, saving what used to be a third full pass
    # for the broadcast anti-join -- and the uniqueness group-by), so
    # their declared-column slices persist once here and both families
    # read the cache -- one CSV scan each. The other datasets go
    # straight to collect_exceptions, which persists internally only
    # when more than one family consumes the scan (measured at the 10M
    # stress: persisting the single-consumer payroll/inventory slices
    # too REGRESSED run_month ~50% -- a cache nobody reads twice is
    # pure write amplification).
    specs = build_dataset_specs(settings.allowed_currencies, settings.base_currency)
    from .quality import account_in_coa_exceptions, checked_slice, coa_membership_check

    # the chart of accounts is driver-sized (reference fixture, dozens
    # of rows): one tiny collect turns Q12 into a row-level literal
    # membership check instead of a per-dataset anti-join pass.  The
    # driver-sized assumption is ENFORCED, not assumed (ADVICE r11):
    # collect at most cap+1 rows; if the chart exceeds the cap, skip
    # the fusion and fall back to the broadcast anti-join form below --
    # an oversized literal isin would bloat codegen / OOM the driver.
    coa_rows = (
        dim_accounts.select(F.col("account_code").cast("string"))
        .limit(COA_FUSION_CAP + 1)
        .collect()
    )
    coa_fused = len(coa_rows) <= COA_FUSION_CAP
    if coa_fused:
        coa_check = coa_membership_check([r[0] for r in coa_rows])
        for name in ("sales", "expenses"):
            specs[name].checks.append(coa_check)

    slices = {
        name: checked_slice(frames[name], specs[name]).persist()
        for name in ("sales", "expenses")
    }
    exceptions = spark.createDataFrame([], DQ_EXCEPTIONS_SCHEMA)
    for name, df in frames.items():
        exceptions = exceptions.unionByName(schema_shape_exceptions(spark, df, specs[name]))
        checked = slices.get(name, df)
        exceptions = exceptions.unionByName(
            collect_exceptions(checked, specs[name], persist_intermediates=name not in slices)
        )
        if not coa_fused and name in ("sales", "expenses"):
            # over-cap chart of accounts: Q12 via the retained broadcast
            # anti-join (reads the persisted slice, so no extra CSV scan)
            exceptions = exceptions.unionByName(
                account_in_coa_exceptions(checked, name, dim_accounts)
            )

    dq_exceptions = add_severity(exceptions).cache()  # forced: the gate must decide
    # Materialize the cache with FULL parallelism before the
    # single-file (coalesce(1)) audit sinks and the gate's limit(1)
    # probes consume it: afterwards every serial section's cost tracks
    # the EXCEPTION count, not the input row count, and the count
    # doubles as the close-run dq_exception_rows metric. Measured at
    # the 10M-row stress month (PLANS.md): parallel count 10.6s + warm
    # single-file write 0.5s, vs 13.8s for a cold single-task write --
    # and a single-partition AGGREGATE over the cold plan (the shape a
    # future gate refactor could easily introduce) costs 118s vs 31s,
    # so the eager parallel materialization is the load-bearing habit.
    n_exceptions = dq_exceptions.count()
    _mark("dq_sweep")

    dq_exceptions_path = curated_dir / "dq_exceptions.csv"
    dq_summary_path = curated_dir / "dq_summary.csv"

    summary = dq_summary_table(dq_exceptions, fail_on=fail_on)
    overall = dq_overall_status(dq_exceptions, fail_on=fail_on)

    # audit trail is written BEFORE the gate can raise (pipeline.py:141-146)
    write_csv_single_file(dq_exceptions, str(dq_exceptions_path))
    write_csv_single_file(summary, str(dq_summary_path))
    _mark("dq_audit_write")

    if overall == "FAIL" and fail_on != "NEVER":
        raise DataQualityGateError(
            f"Data quality checks failed. See {dq_exceptions_path} and {dq_summary_path}"
        )

    # -- month window (half-open [start, next-month-start)) ------------------
    start_ts, end_ts = month_window(month)
    in_window = (F.col("date") >= F.lit(start_ts)) & (F.col("date") < F.lit(end_ts))

    # NOTE (r10, measured): deriving v_sales/v_exp from the persisted
    # check slices instead (cache-hit by lineage) was tried and did NOT
    # move the fact_write stage (11.4 s -> 11.6 s at 10M rows -- the
    # stage is FX-join + bround + parquet-encode bound, not CSV-parse
    # bound), so the Q17 adaptation stands: validation is a
    # side-channel and the pipeline proceeds from the ORIGINAL inputs.
    v_sales = sales.filter(in_window).drop(ROW_ID_COL)
    v_exp = expenses.filter(in_window).drop(ROW_ID_COL)
    v_inv = inventory.filter(in_window).drop(ROW_ID_COL)
    v_pay = payroll.filter(F.col("month") == F.lit(month)).drop(ROW_ID_COL)
    v_fx = fx_rates.drop(ROW_ID_COL)

    # -- fact + KPI (one lazy plan until the writes) --------------------------
    fx = fx_to_base(v_fx, settings.base_currency)
    fact = to_fact_transactions(v_sales, v_exp, v_pay, v_inv, fx, settings.base_currency)

    # close-run metrics ride the write action itself (Observation API):
    # row count, base-amount total, and source breadth cost no extra scan
    from pyspark.sql import Observation

    obs = Observation("fact_stats")
    fact = fact.observe(
        obs,
        F.count(F.lit(1)).alias("fact_rows"),
        F.sum(F.col("amount_base").cast("decimal(28,2)")).cast("double").alias("total_amount_base"),
        F.approx_count_distinct("source").alias("n_sources"),
    )
    out_fact = curated_dir / "fact_transactions.parquet"
    out_dim = curated_dir / "dim_accounts.parquet"
    out_kpi = curated_dir / "kpi_monthly.parquet"

    write_parquet(fact, str(out_fact))
    _mark("fact_write")

    # Build the KPI (and the lake partition copy) from the fact we
    # just WROTE, not from the fact's logical plan (r10): kpi_monthly
    # executes its input three more times (observed-types collect,
    # pivot aggregate, null-only-groups aggregate), and each execution
    # of the plan form would re-parse every raw CSV and redo the FX
    # join.  The written fact is columnar and already enriched, so
    # those passes become column-pruned parquet scans of exactly the 4
    # KPI columns.  Row-set identical by construction (parquet
    # round-trips doubles exactly); measured 41.8 s -> 35.2 s on the
    # 10M close, on top of the sort removal's 64.2 -> 41.8.
    fact_r = fact.sparkSession.read.parquet(str(out_fact))
    # kpi_monthly is eager up to its dimension-bounded pre-aggregate
    # (one column-pruned scan of the written fact; r11 -- previously
    # the types-collect, pivot and null-group passes each rescanned
    # it, which is what made this stage super-linear at 100M).  The
    # scan lands in "kpi_agg"; "kpi_dim_write" is then pivot-on-tiny
    # plus the two parquet sinks.
    kpi = kpi_monthly(fact_r, dim_accounts)
    _mark("kpi_agg")

    write_parquet(dim_accounts, str(out_dim))
    write_parquet(kpi, str(out_kpi))
    _mark("kpi_dim_write")

    if lake_dir is not None:
        lake_fact = Path(lake_dir) / "fact_transactions"
        write_parquet(
            fact_r.withColumn("month", F.date_format("date", "yyyy-MM")),
            str(lake_fact),
            partition_by=["month"],
        )
        _mark("lake_write")

    dq_exceptions.unpersist()
    # the check slices are released HERE, not right after the
    # exceptions count: unpersisting them mid-run forced the later
    # dq consumers back through uncached slice plans (measured +60%
    # on the 10M stress month)
    for s in slices.values():
        s.unpersist()

    outputs = {
        "dq_exceptions": dq_exceptions_path,
        "dq_summary": dq_summary_path,
        "fact": out_fact,
        "dim_accounts": out_dim,
        "kpi": out_kpi,
    }
    try:
        fact_metrics = dict(obs.get)
    except Exception:  # noqa: BLE001
        # zero-row month: with the fact build now a pure map pipeline
        # (no sort exchange, r10), empty-relation propagation can
        # collapse the whole write plan and leave the observation with
        # no metrics row (obs.get raises from the JVM).  Recompute from
        # the written parquet -- by definition a tiny (usually empty)
        # table in this branch, so the extra scan is degenerate.
        fact_metrics = (
            fact.sparkSession.read.parquet(str(out_fact))
            .agg(
                F.count(F.lit(1)).alias("fact_rows"),
                F.sum(F.col("amount_base").cast("decimal(28,2)"))
                .cast("double")
                .alias("total_amount_base"),
                F.approx_count_distinct("source").alias("n_sources"),
            )
            .first()
            .asDict()
        )
    outputs["metrics"] = {"dq_exception_rows": n_exceptions, **fact_metrics}
    outputs["stage_seconds"] = _stages
    return outputs


def kpi_from_lake(
    spark: SparkSession,
    lake_dir: str | Path,
    reference_dir: str | Path,
    months: list[str] | None = None,
) -> DataFrame:
    """All-months KPI table straight from the partitioned lake.

    The per-month closes build the lake; this reads it back (partition
    pruning when ``months`` is given), joins the chart of accounts and
    reuses the same pivot -- one call summarizes every closed month
    without re-running any close.
    """
    from ..sources.readers import read_parquet

    coa = read_csv(spark, str(Path(reference_dir) / "chart_of_accounts.csv"), COA_SCHEMA)
    dim_accounts = build_dim_accounts(coa)
    fact = read_parquet(spark, str(Path(lake_dir) / "fact_transactions"))
    if months:
        fact = fact.filter(F.col("month").isin(months))
    return kpi_monthly(fact.drop("month"), dim_accounts)
