"""End-to-end monthly-close orchestration (SURVEY.md §3.1).

Mirrors ``run_month`` at
``/root/reference/src/finance_etl/pipeline.py:50-191``:

read typed CSVs -> collect ALL DQ exceptions -> severity -> write
audit CSVs (ALWAYS, even when about to fail) -> gate -> month-window
filter -> FX prep -> fact build -> KPI pivot -> Parquet sinks.

Lazy-engine adaptation (SURVEY.md §7.4 item 7): the exceptions
DataFrame is the one forced materialization point mid-pipeline -- it
is cached before the gate decision, reused for the audit files, and
the pipeline then proceeds from the ORIGINAL typed inputs (validation
is a side-channel, not a transform -- Q17; since r12 the big inputs
flow through the persisted slice projections of those same typed
frames, so the one DQ parse also feeds the fact).  The fact write is
single-pass (r12): the missing-FX hard error rides the write's
Observation with scratch-dir + rename promotion instead of an eager
pre-pass.  Stages 6-9 stay one lazy plan until the writes.
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
from .transforms import (
    MissingFxRatesError,
    build_dim_accounts,
    fx_to_base,
    kpi_monthly,
    to_fact_transactions,
)


class DataQualityGateError(ValueError):
    """Raised when the DQ gate fails (reference pipeline.py:145-146)."""


def plan_has_month_partition_filter(plan: str) -> bool:
    """True iff the formatted plan's PartitionFilters entry ITSELF
    carries the month predicate.  'month' appearing anywhere in the
    plan text is weak -- it also shows up in PushedFilters and the
    output schema, so a reader that scans every partition could still
    pass the loose check (ADVICE r12).  Shared by the lake-pruning
    assertion in tools/stress_pipeline.py and the golden-scale e2e."""
    import re

    return bool(re.search(r"PartitionFilters: \[[^\]]*month", plan))


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
    raw_dir: str | Path | None,
    curated_dir: str | Path,
    reference_dir: str | Path,
    fail_on: str = "ERROR",
    lake_dir: str | Path | None = None,
    raw_lake_dir: str | Path | None = None,
) -> dict[str, Path]:
    """Run the monthly close. ``lake_dir``, if given, additionally
    upserts this month's fact rows into a month-partitioned parquet
    lake (``fact_transactions/month=YYYY-MM/``): with dynamic
    partition overwrite only the processed month's partition is
    replaced, and downstream month filters prune to one partition
    instead of scanning history.

    ``raw_lake_dir`` selects the LAKE-FED close (r13): the five raw
    datasets are read from the typed parquet lake that
    ``sources.raw_lake.ingest_raw_to_lake`` wrote (partition-pruned to
    this month) instead of being string-parsed from CSV.  Every stage
    downstream of the read -- all DQ families including coercion (the
    lake stores sparse ``_raw_`` shadows), gate, fact, KPI -- runs the
    IDENTICAL plan code, so the two modes are output-equal by
    construction (pinned by tests/test_raw_lake.py); what changes is
    the dq_sweep's floor, which was the CSV parse (PLANS.md r12)."""
    fail_on = (fail_on or "ERROR").upper().strip()
    if fail_on not in {"ERROR", "WARN", "NEVER"}:
        raise ValueError("fail_on must be one of: ERROR, WARN, NEVER")
    if raw_dir is None and raw_lake_dir is None:
        raise ValueError("one of raw_dir / raw_lake_dir is required")
    if raw_dir is not None and raw_lake_dir is not None:
        # ADVICE r13: silently preferring the lake here meant a user
        # pointing at fresh CSVs while an old lake path was still set
        # got stale-lake results with no signal -- refuse instead.
        raise ValueError(
            "ambiguous input source: both raw_dir and raw_lake_dir were "
            "provided; pass exactly one"
        )

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

    raw_dir = Path(raw_dir) if raw_dir is not None else None
    curated_dir, reference_dir = Path(curated_dir), Path(reference_dir)
    os.makedirs(curated_dir, exist_ok=True)

    # -- reference + raw scans (typed, no inference) -------------------------
    coa = read_csv(spark, str(reference_dir / "chart_of_accounts.csv"), COA_SCHEMA)
    dim_accounts = build_dim_accounts(coa)

    # Parse-once for the BIG inputs (r12, judge ask #1, MEASURED
    # design): sales+expenses are parsed once, persisted as the DQ
    # slices, and every later consumer -- both DQ families AND the
    # fact build -- reads the cache.  Three alternatives were measured
    # at the exclusive 100M stress before landing here (PLANS.md r12):
    #   * r11 shape (fact re-parses CSV + eager FX-check pass):
    #     98.2 s, fact_write 49.6 s;
    #   * lz4 parquet staging of the typed parse: fact_write fell to
    #     29.1 s but the 33 s stage write + slower cache-less DQ made
    #     the close 125.3 s -- a stage write costs more than the
    #     rescan it saves on this storage;
    #   * persisting ALL four datasets: cache residency past the
    #     driver heap, eviction churn, dq_sweep 31 -> 95 s;
    # so the shared materialization is the MEMORY_AND_DISK cache the
    # sales/expenses DQ slices already used, now ALSO feeding the
    # fact, with the fact write made single-pass (see below).
    if raw_lake_dir is not None:
        # lake-fed close: the parse was paid once at ingest; these are
        # partition-pruned columnar scans of the SAME typed+sparse-shadow
        # shape read_csv_typed produces, so everything below is
        # mode-agnostic
        from ..sources.raw_lake import read_raw_lake

        sales = read_raw_lake(spark, raw_lake_dir, "sales", month)
        expenses = read_raw_lake(spark, raw_lake_dir, "expenses", month)
        payroll = read_raw_lake(spark, raw_lake_dir, "payroll", month)
        inventory = read_raw_lake(spark, raw_lake_dir, "inventory_movements", month)
        fx_rates = read_raw_lake(spark, raw_lake_dir, "fx_rates", month)
    else:
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
    # sales/expenses fan into THREE consumers (the row-level explode --
    # which since r11 includes the COA membership check as a fused
    # literal-set predicate -- the uniqueness group-by, and since r12
    # the fact build), so their declared-column slices persist once
    # here and all consumers read the cache -- one CSV scan each.  The
    # other datasets go straight to collect_exceptions, which persists
    # internally only when more than one family consumes the scan.
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

    # Cache ONLY sales+expenses (80% of close rows), and ONLY in CSV
    # mode.  Extending the persist to payroll/inventory was measured at
    # the exclusive 100M stress: the extra residency pushes the storage
    # pool past the driver heap and the eviction churn blew dq_sweep up
    # 31 -> 95 s (PLANS.md r12).  The two small datasets re-parse once
    # for the fact instead -- 20% of the rows, linear cost, zero cache
    # pressure.
    # Lake mode skips the persist entirely (r13, measured at 100M): the
    # cache exists to avoid re-PARSING CSV text, but a lake consumer
    # re-reads column-pruned columnar pages -- the uniqueness group-by
    # touches 2-3 columns, the fact ~7 -- which costs less than
    # serializing 80M wide rows into the storage pool.
    lake_mode = raw_lake_dir is not None
    slices = {
        name: checked_slice(frames[name], specs[name])
        for name in ("sales", "expenses")
    }
    if not lake_mode:
        slices = {name: df.persist() for name, df in slices.items()}
    exceptions = spark.createDataFrame([], DQ_EXCEPTIONS_SCHEMA)
    for name, df in frames.items():
        exceptions = exceptions.unionByName(schema_shape_exceptions(spark, df, specs[name]))
        checked = slices.get(name, df)
        # lake mode reads the ingest-materialized uniqueness exceptions
        # (r14): the month partition is immutable, so its duplicate-key
        # set was computed once at ingest -- the close-side group-by
        # shuffle on the two biggest datasets' string keys disappears.
        # A pre-r14 lake returns None here and the group-by fallback
        # inside collect_exceptions runs as before.
        pre_unique = None
        if lake_mode and specs[name].unique_keys:
            from ..sources.raw_lake import read_lake_unique_exceptions

            pre_unique = read_lake_unique_exceptions(spark, raw_lake_dir, name, month)
        exceptions = exceptions.unionByName(
            collect_exceptions(
                checked,
                specs[name],
                persist_intermediates=(name not in slices) and not lake_mode,
                precomputed_unique=pre_unique,
            )
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
        for s in slices.values():
            s.unpersist()
        raise DataQualityGateError(
            f"Data quality checks failed. See {dq_exceptions_path} and {dq_summary_path}"
        )

    # -- month window (half-open [start, next-month-start)) ------------------
    start_ts, end_ts = month_window(month)
    in_window = (F.col("date") >= F.lit(start_ts)) & (F.col("date") < F.lit(end_ts))

    # The fact builds its BIG inputs from the persisted slices (r12):
    # the slices hold every column the normalizers project
    # (spec.columns covers them), so sales/expenses enter the fact from
    # the one CSV parse the DQ sweep already materialized, not a
    # re-parse.  r10 measured this swap as a no-op at 10M (fact was
    # FX+encode bound there), but at 100M the balance is parse-bound
    # (r11 decomposition) and the swap plus the single-pass write below
    # is what retires the re-parse.  payroll/inventory stay on their
    # original scans -- see the cache-sizing note above.  Q17's
    # adaptation is unchanged semantically: the slice projection is the
    # ORIGINAL typed input, validation stays a side-channel.
    v_sales = slices["sales"].filter(in_window).drop(ROW_ID_COL)
    v_exp = slices["expenses"].filter(in_window).drop(ROW_ID_COL)
    v_inv = inventory.filter(in_window).drop(ROW_ID_COL)
    v_pay = payroll.filter(F.col("month") == F.lit(month)).drop(ROW_ID_COL)
    v_fx = fx_rates.drop(ROW_ID_COL)

    # -- fact + KPI (one lazy plan until the writes) --------------------------
    # check_missing_rates=False: the eager in-plan missing-FX check is
    # a full extra pass over the inputs (on clean data its isNull
    # filter matches nothing, so the limit(20) never short-circuits and
    # every partition is scanned).  The close instead observes
    # sum(rate IS NULL) on the write action itself -- zero extra scans
    # -- writes to a scratch name, and only PROMOTES (rename) the fact
    # when the count is zero, so the reference's hard-error contract
    # ("no curated fact on missing FX") still holds exactly; the
    # offending (date, currency) pairs for the error message come from
    # a pruned scan of the scratch output, paid only in the error path.
    fx = fx_to_base(v_fx, settings.base_currency)
    fact = to_fact_transactions(
        v_sales, v_exp, v_pay, v_inv, fx, settings.base_currency, check_missing_rates=False
    )

    # close-run metrics ride the write action itself (Observation API):
    # row count, base-amount total, source breadth and the missing-FX
    # count cost no extra scan
    from pyspark.sql import Observation

    obs = Observation("fact_stats")
    fact = fact.observe(
        obs,
        F.count(F.lit(1)).alias("fact_rows"),
        F.sum(F.col("amount_base").cast("decimal(28,2)")).cast("double").alias("total_amount_base"),
        F.approx_count_distinct("source").alias("n_sources"),
        F.sum(F.col("rate").isNull().cast("long")).alias("_missing_fx_rows"),
    )
    out_fact = curated_dir / "fact_transactions.parquet"
    out_dim = curated_dir / "dim_accounts.parquet"
    out_kpi = curated_dir / "kpi_monthly.parquet"

    import shutil

    tmp_fact = str(out_fact) + "._building"
    promoted = False
    try:
        write_parquet(fact, tmp_fact)
        try:
            fact_metrics = dict(obs.get)
        except Exception:  # noqa: BLE001
            # zero-row month: with the fact build a pure map pipeline (no
            # exchange), empty-relation propagation can collapse the write
            # plan and leave the observation with no metrics row (obs.get
            # raises from the JVM).  Recompute from the written parquet --
            # by definition a tiny (usually empty) table here.
            fact_metrics = (
                spark.read.parquet(tmp_fact)
                .agg(
                    F.count(F.lit(1)).alias("fact_rows"),
                    F.sum(F.col("amount_base").cast("decimal(28,2)"))
                    .cast("double")
                    .alias("total_amount_base"),
                    F.approx_count_distinct("source").alias("n_sources"),
                    F.sum(F.col("rate").isNull().cast("long")).alias("_missing_fx_rows"),
                )
                .first()
                .asDict()
            )
        if fact_metrics.pop("_missing_fx_rows", 0):
            pairs = [
                (str(r["date_key"]), r["currency"])
                for r in spark.read.parquet(tmp_fact)
                .filter(F.col("rate").isNull())
                .select(F.to_date("date").alias("date_key"), "currency")
                .distinct()
                .limit(20)
                .collect()
            ]
            raise MissingFxRatesError(f"Missing FX rates for: {pairs}")
        if os.path.exists(out_fact):
            shutil.rmtree(out_fact)
        os.rename(tmp_fact, out_fact)
        promoted = True
    finally:
        # any non-promotion exit (missing FX, write failure, obs
        # fallback failure) must not leave the scratch dir on disk or
        # the slice caches persisted for the SparkSession lifetime
        if not promoted:
            shutil.rmtree(tmp_fact, ignore_errors=True)
            for s in slices.values():
                s.unpersist()
    _mark("fact_write")

    # the slice caches have no consumers past this point (KPI and the
    # lake copy read the WRITTEN fact, the DQ exceptions are already
    # cached + counted) -- release them now, before the cheap tail
    # stages, so the 100M close doesn't hold the cache and the written
    # fact at once
    for s in slices.values():
        s.unpersist()

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

    outputs = {
        "dq_exceptions": dq_exceptions_path,
        "dq_summary": dq_summary_path,
        "fact": out_fact,
        "dim_accounts": out_dim,
        "kpi": out_kpi,
    }
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
