"""Declarative data-quality framework (SURVEY.md §2.7 Q1-Q17).

The reference validates raw frames with pandera schemas and collects
ALL failures into a ``failure_cases`` table with severities and a
PASS/FAIL gate (``/root/reference/src/finance_etl/quality.py``). Here
the same checks are data -- a ``DatasetSpec`` per raw dataset -- and
compile to DataFrame plans that emit exception rows in the reference's
shape: ``(dataset, index, column, check, failure_case, schema_context,
check_number, severity)``.

Scale design: all row-level checks for a dataset evaluate in ONE scan.
Each check becomes a ``when(fail, struct(...))`` element of an array
that is filtered and exploded -- no per-check re-scan, no driver-side
row iteration. Key-uniqueness checks are a groupBy (one shuffle on a
small projection); COA membership is a broadcast left-anti join.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import DQ_EXCEPTIONS_SCHEMA
from ..sources.readers import RAW_PREFIX, ROW_ID_COL

DATASETS = ["sales", "expenses", "payroll", "inventory_movements", "fx_rates"]

EXCEPTION_COLUMNS = [
    "dataset",
    "index",
    "column",
    "check",
    "failure_case",
    "schema_context",
    "check_number",
    "severity",
]

# Columns whose failures are critical (reference quality.py:153-164).
ERROR_COLUMNS = {
    "account_code",
    "date",
    "invoice_id",
    "bill_id",
    "employee_id",
    "sku",
    "currency",
    "from_currency",
    "to_currency",
    "rate",
}


@dataclass(frozen=True)
class ColumnCheck:
    """A row-level check: rows where ``fail`` holds become exceptions."""

    column: str
    name: str
    fail: Column


@dataclass(frozen=True)
class DatasetSpec:
    """All declared checks for one raw dataset."""

    dataset: str
    columns: list[str]
    not_null: list[str]
    checks: list[ColumnCheck] = field(default_factory=list)
    unique_keys: list[tuple[str, ...]] = field(default_factory=list)


def _isin_check(column: str, allowed: list[str]) -> ColumnCheck:
    return ColumnCheck(
        column,
        f"isin({allowed})",
        F.col(column).isNotNull() & ~F.col(column).isin(allowed),
    )


def coa_membership_check(account_codes: list[str]) -> ColumnCheck:
    """Q12 fused into the row-level family (r11): account_code ∈ chart
    of accounts as a literal-set membership check evaluated in the SAME
    single scan as the other row-level checks, instead of a separate
    broadcast anti-join pass over the cached slice.  Valid because the
    chart of accounts is driver-sized by construction (reference
    chart_of_accounts.csv, dozens of rows), so the membership set is a
    literal -- the 100 TB story is unchanged (an isin literal is
    cheaper to ship than a broadcast table).  Emits rows identical to
    ``account_in_coa_exceptions``: NULL codes fail too (a left-anti
    join keeps null keys), hence the explicit isNull() arm."""
    return ColumnCheck(
        "account_code",
        "account_in_coa",
        F.col("account_code").isNull() | ~F.col("account_code").isin(account_codes),
    )


def build_dataset_specs(
    allowed_currencies: tuple[str, ...], base_currency: str
) -> dict[str, DatasetSpec]:
    """The check inventory -- mirrors the five pandera schemas at
    reference quality.py:16-95."""
    ccy = list(allowed_currencies)
    return {
        "sales": DatasetSpec(
            dataset="sales",
            columns=["date", "entity", "invoice_id", "account_code", "currency", "amount", "description"],
            not_null=["date", "entity", "invoice_id", "account_code", "currency", "amount"],
            checks=[
                _isin_check("currency", ccy),
                ColumnCheck("amount", "greater_than(0)", F.col("amount") <= 0),
            ],
            unique_keys=[("entity", "invoice_id")],
        ),
        "expenses": DatasetSpec(
            dataset="expenses",
            columns=["date", "entity", "bill_id", "account_code", "currency", "amount", "description"],
            not_null=["date", "entity", "bill_id", "account_code", "currency", "amount"],
            checks=[
                _isin_check("currency", ccy),
                ColumnCheck("amount", "greater_than(0)", F.col("amount") <= 0),
            ],
            unique_keys=[("entity", "bill_id")],
        ),
        "payroll": DatasetSpec(
            dataset="payroll",
            columns=["month", "entity", "employee_id", "currency", "gross", "deductions", "net"],
            not_null=["month", "entity", "employee_id", "currency", "gross", "deductions", "net"],
            checks=[
                _isin_check("currency", ccy),
                ColumnCheck("gross", "greater_than_or_equal_to(0)", F.col("gross") < 0),
                ColumnCheck("deductions", "greater_than_or_equal_to(0)", F.col("deductions") < 0),
                ColumnCheck("net", "greater_than_or_equal_to(0)", F.col("net") < 0),
                # payroll identity |gross - deductions - net| < 0.01
                # (reference quality.py:59-65, dataset-level there;
                # row-level here gives a better audit trail)
                ColumnCheck(
                    "net",
                    "payroll_identity(gross-deductions=net)",
                    F.abs(F.col("gross") - F.col("deductions") - F.col("net")) >= 0.01,
                ),
            ],
        ),
        "inventory_movements": DatasetSpec(
            dataset="inventory_movements",
            columns=["date", "entity", "sku", "movement_type", "qty", "unit_cost", "currency"],
            not_null=["date", "entity", "sku", "movement_type", "qty", "unit_cost", "currency"],
            checks=[
                _isin_check("currency", ccy),
                _isin_check("movement_type", ["receipt", "issue", "adjustment"]),
                ColumnCheck("qty", "not_equal_to(0)", F.col("qty") == 0),
                ColumnCheck("unit_cost", "greater_than_or_equal_to(0)", F.col("unit_cost") < 0),
            ],
        ),
        "fx_rates": DatasetSpec(
            dataset="fx_rates",
            columns=["date", "from_currency", "to_currency", "rate"],
            not_null=["date", "from_currency", "to_currency", "rate"],
            checks=[
                _isin_check("from_currency", ccy),
                _isin_check("to_currency", [base_currency]),
                ColumnCheck("rate", "greater_than(0)", F.col("rate") <= 0),
            ],
            unique_keys=[("date", "from_currency", "to_currency")],
        ),
    }


def checked_slice(df: DataFrame, spec: DatasetSpec) -> DataFrame:
    """The projection every check can run against: declared columns +
    their raw-text shadows + the row id. Checks may only reference
    declared columns, so callers that fan one dataset into several
    check families (row-level, uniqueness, COA membership) can build
    this once, persist it, and hand it to each -- the source is then
    scanned exactly once however many families consume it."""
    declared = set(spec.columns)
    proj = [
        c
        for c in df.columns
        if c == ROW_ID_COL
        or c in declared
        or (c.startswith(RAW_PREFIX) and c[len(RAW_PREFIX):] in declared)
    ]
    return df.select(*proj)


def _exception_struct(column: str, check: str, failure_case: Column) -> Column:
    return F.struct(
        F.lit(column).alias("column"),
        F.lit(check).alias("check"),
        failure_case.cast("string").alias("failure_case"),
    )


def unique_key_exceptions(
    df: DataFrame, dataset: str, keys: tuple[str, ...]
) -> DataFrame:
    """Composite-key duplicate exceptions (Q10): one exception row per
    key combination appearing more than once, in the reference's
    exception-record shape (quality.py:8-13,27,43 composite keys).
    Shared by the close-side check and the lake ingest's write-time
    materialization (r14) so the two paths cannot drift."""
    return (
        df.groupBy(*keys)
        .count()
        .filter(F.col("count") > 1)
        .select(
            F.lit(dataset).alias("dataset"),
            F.lit(None).cast("long").alias("index"),
            F.lit(None).cast("string").alias("column"),
            F.lit(f"unique_keys{list(keys)}").alias("check"),
            F.concat_ws("|", *[F.col(k).cast("string") for k in keys]).alias("failure_case"),
            F.lit("DataFrameSchema").alias("schema_context"),
            F.lit(None).cast("int").alias("check_number"),
            F.lit(None).cast("string").alias("severity"),
        )
    )


def collect_exceptions(
    df: DataFrame,
    spec: DatasetSpec,
    persist_intermediates: bool = True,
    precomputed_unique: DataFrame | None = None,
) -> DataFrame:
    """All row-level + key-uniqueness exceptions for one dataset.

    Row-level checks run in a single scan via an array of conditional
    structs per row, exploded to exception rows (equivalent of
    pandera's lazy=True collect-all semantics, quality.py:98-115).

    Single-scan guarantee: the row-level explode and each
    key-uniqueness group-by are separate consumers of the source, so a
    naive plan scans it once per consumer (the round-5 lint finding).
    When more than one consumer exists, the declared-column slice is
    projected once and persisted (MEMORY_AND_DISK); every branch then
    reads the cache and the source parquet is scanned exactly once.
    ``persist_intermediates=False`` opts out for callers that manage
    caching themselves (the cache lives until the session clears it --
    spark.catalog.clearCache() or an explicit unpersist by the owner
    of the returned plan's lifecycle).
    """
    n_consumers = (1 if (spec.not_null or spec.checks) else 0) + (
        0
        if precomputed_unique is not None
        else sum(1 for ks in spec.unique_keys if all(k in df.columns for k in ks))
    )
    df = checked_slice(df, spec)
    if persist_intermediates and n_consumers > 1:
        df = df.persist()
    idx = F.col(ROW_ID_COL) if ROW_ID_COL in df.columns else F.lit(None).cast("long")

    structs: list[Column] = []
    # r16 (guide SS1.2 per-task work): the explode below generates
    # n_checks struct slots for EVERY row, but on a clean corpus only
    # a handful of rows fail anything -- measured at the 10M close,
    # the generate+filter blowup (10 slots x 5M sales rows) cost ~4 s
    # per big dataset from a warm cache.  ``fail_conds`` collects the
    # RAW check predicates (cheap column compares, no struct/array
    # allocation, no string casts) so a pre-filter confines the
    # generate to rows with at least one failure.  Row-set identical:
    # a row reaches the exploded output iff some slot is non-null iff
    # some predicate holds; NULL predicate results drop the row in the
    # filter exactly as the all-null slot row was dropped after the
    # explode.  Not the r11 "compact first" trap: the filter references
    # the raw COLUMNS, not the computed struct array, so nothing is
    # evaluated twice (the array builds only above the filter).
    fail_conds: list[Column] = []
    for c in spec.not_null:
        if c in df.columns:
            raw = f"{RAW_PREFIX}{c}"
            if raw in df.columns:
                # coercion-aware scan: raw text present but typed null
                # = dtype failure (pandera coerce semantics, Q3); only
                # a truly absent value is a not_nullable failure
                structs.append(
                    F.when(
                        F.col(raw).isNotNull() & F.col(c).isNull(),
                        _exception_struct(c, f"coerce_dtype({df.schema[c].dataType.simpleString()})", F.col(raw)),
                    )
                )
                # typed-null conjunct: with DENSE shadows raw IS NULL
                # already implies typed null (the text was absent); the
                # r12 parse-once stage stores SPARSE shadows (raw text
                # kept only where the typed value is null), where raw
                # NULL alone is also true for every clean row -- the
                # conjunct makes the check correct for both layouts.
                structs.append(
                    F.when(
                        F.col(c).isNull() & F.col(raw).isNull(),
                        _exception_struct(c, "not_nullable", F.lit(None)),
                    )
                )
                # typed NULL covers both shadow-layout slots above
                fail_conds.append(F.col(c).isNull())
                continue
            structs.append(
                F.when(
                    F.col(c).isNull(),
                    _exception_struct(c, "not_nullable", F.lit(None)),
                )
            )
            fail_conds.append(F.col(c).isNull())
    for chk in spec.checks:
        if chk.column in df.columns:
            structs.append(F.when(chk.fail, _exception_struct(chk.column, chk.name, F.col(chk.column))))
            fail_conds.append(chk.fail)

    parts: list[DataFrame] = []
    if structs:
        # Shape note (r11, measured at the 50M/100M close): explode the
        # FIXED-WIDTH array and drop the per-element nulls AFTER the
        # generate.  The tempting "compact first" rewrite
        # (array_compact + size>0 before the explode) measured ~20%
        # SLOWER at 100M: array_compact desugars to an interpreted
        # lambda filter, and InferFiltersFromGenerate pushes a
        # size(...)>0 predicate below the projection that re-evaluates
        # the whole check array a second time per row.  This shape has
        # neither cost -- size(array(<n literals>)) constant-folds, so
        # no filter is inferred, the array is evaluated exactly once,
        # and the n_checks-per-row generate blowup is codegen'd and
        # filtered in the same stage.
        from functools import reduce as _reduce

        fail_any = _reduce(lambda a, b: a | b, fail_conds)
        exploded = (
            df.filter(fail_any)
            .select(idx.alias("index"), F.array(*structs).alias("_checks"))
            .select("index", F.explode("_checks").alias("_e"))
            # nulls (passing checks) are dropped by explode only for
            # empty arrays; filter the per-element nulls explicitly
            .filter(F.col("_e").isNotNull())
        )
        parts.append(
            exploded.select(
                F.lit(spec.dataset).alias("dataset"),
                F.col("index").cast("long").alias("index"),
                F.col("_e.column").alias("column"),
                F.col("_e.check").alias("check"),
                F.col("_e.failure_case").alias("failure_case"),
                F.lit("Column").alias("schema_context"),
                F.lit(None).cast("int").alias("check_number"),
                F.lit(None).cast("string").alias("severity"),
            )
        )

    if precomputed_unique is not None:
        # lake-fed close (r14): the uniqueness exceptions were
        # materialized at ingest (the month partition is immutable, so
        # its duplicate-key set is too); the 80M-row close-side
        # group-by shuffle is replaced by a tiny side-table read
        parts.append(precomputed_unique)
    else:
        for keys in spec.unique_keys:
            present = [k for k in keys if k in df.columns]
            if len(present) != len(keys):
                continue
            parts.append(unique_key_exceptions(df, spec.dataset, keys))

    spark = df.sparkSession
    out = parts[0] if parts else spark.createDataFrame([], DQ_EXCEPTIONS_SCHEMA)
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def schema_shape_exceptions(
    spark: SparkSession, df: DataFrame, spec: DatasetSpec
) -> DataFrame:
    """strict=True column-shape check (Q1): missing required columns
    and unexpected extras, evaluated driver-side against df.columns."""
    declared = set(spec.columns)
    actual = [c for c in df.columns if c != ROW_ID_COL and not c.startswith(RAW_PREFIX)]
    rows = []
    for c in spec.columns:
        if c not in actual:
            rows.append((spec.dataset, None, c, "required_column_missing", c, "DataFrameSchema", None, None))
    for c in actual:
        if c not in declared:
            rows.append((spec.dataset, None, c, "column_not_in_schema", c, "DataFrameSchema", None, None))
    return spark.createDataFrame(rows, DQ_EXCEPTIONS_SCHEMA)


def account_in_coa_exceptions(df: DataFrame, dataset: str, dim_accounts: DataFrame) -> DataFrame:
    """Rows whose account_code is not in the chart of accounts (Q12) --
    a broadcast left-anti join instead of the reference's driver-side
    set-membership scan (pipeline.py:30-47)."""
    if "account_code" not in df.columns:
        return df.sparkSession.createDataFrame([], DQ_EXCEPTIONS_SCHEMA)
    idx = F.col(ROW_ID_COL) if ROW_ID_COL in df.columns else F.lit(None).cast("long")
    bad = df.join(
        F.broadcast(dim_accounts.select(F.col("account_code").cast("string").alias("account_code"))),
        on="account_code",
        how="left_anti",
    )
    return bad.select(
        F.lit(dataset).alias("dataset"),
        idx.cast("long").alias("index"),
        F.lit("account_code").alias("column"),
        F.lit("account_in_coa").alias("check"),
        F.col("account_code").cast("string").alias("failure_case"),
        F.lit("Column").alias("schema_context"),
        F.lit(None).cast("int").alias("check_number"),
        F.lit(None).cast("string").alias("severity"),
    )


def add_severity(dq_exceptions: DataFrame) -> DataFrame:
    """Severity rules (Q14, reference quality.py:123-183): default WARN;
    ERROR for key columns, anything in fx_rates, required/dtype checks,
    and COA membership violations."""
    check_l = F.lower(F.coalesce(F.col("check"), F.lit("")))
    severity = (
        F.when(F.col("column").isin(list(ERROR_COLUMNS)), F.lit("ERROR"))
        .when(F.col("dataset") == "fx_rates", F.lit("ERROR"))
        .when(check_l.contains("required"), F.lit("ERROR"))
        .when(check_l.contains("dtype"), F.lit("ERROR"))
        .when(check_l.contains("account_in_coa"), F.lit("ERROR"))
        .otherwise(F.lit("WARN"))
    )
    return dq_exceptions.withColumn("severity", severity)


def dq_overall_status(dq_exceptions: DataFrame, fail_on: str = "ERROR") -> str:
    """PASS/FAIL gate (Q15, reference quality.py:186-202)."""
    fail_on = (fail_on or "ERROR").upper()
    if fail_on == "NEVER":
        return "PASS"
    has_any = dq_exceptions.limit(1).count() > 0
    if not has_any:
        return "PASS"
    if fail_on == "WARN":
        return "FAIL"
    has_error = dq_exceptions.filter(F.col("severity") == "ERROR").limit(1).count() > 0
    return "FAIL" if has_error else "PASS"


def dq_summary_table(dq_exceptions: DataFrame, fail_on: str = "ERROR") -> DataFrame:
    """Per-dataset summary with a zero-filled scaffold of all five
    datasets and a status column (Q16, reference quality.py:205-249)."""
    fail_on = (fail_on or "ERROR").upper()
    spark = dq_exceptions.sparkSession
    # scaffold preserves the reference's DATASETS ordering (sales first;
    # the reference smoke test asserts on row 0)
    base = spark.createDataFrame(
        [(d, i) for i, d in enumerate(DATASETS)], "dataset string, _ord int"
    )

    counts = (
        dq_exceptions.withColumn("severity", F.coalesce(F.col("severity"), F.lit("ERROR")))
        .groupBy("dataset")
        .pivot("severity", ["ERROR", "WARN"])
        .count()
        .withColumnRenamed("ERROR", "error_count")
        .withColumnRenamed("WARN", "warn_count")
    )

    out = (
        base.join(counts, on="dataset", how="left")
        .na.fill(0, ["error_count", "warn_count"])
        .withColumn("issue_count", F.col("error_count") + F.col("warn_count"))
    )
    if fail_on == "NEVER":
        status = F.lit("PASS")
    elif fail_on == "WARN":
        status = F.when(F.col("issue_count") > 0, "FAIL").otherwise("PASS")
    else:
        status = F.when(F.col("error_count") > 0, "FAIL").otherwise("PASS")
    return (
        out.withColumn("status", status)
        .orderBy("_ord")
        .select("dataset", "error_count", "warn_count", "issue_count", "status")
    )
