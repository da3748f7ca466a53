"""Seeded synthetic raw-data generator.

Behaviorally equivalent to
``/root/reference/src/finance_etl/sample_data.py:9-96`` -- same
numpy seed discipline, same draw ORDER, same distributions -- so
seed=42 produces byte-identical raw CSVs and therefore the committed
golden outputs at ``/root/reference/data/bi/2025-12/`` remain valid
correctness anchors for the Spark engine.

Data generation is driver-side plain Python/numpy on purpose: it
writes the *raw CSV inputs* (hundreds of rows per month); it is a test
fixture, not an engine code path.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd


def generate_synthetic_raw(out_dir: Path | str, month: str = "2025-12", seed: int = 42) -> None:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    np.random.seed(seed)

    entities = ["TLM", "UPE"]
    currencies = ["USD", "TZS", "EUR"]

    start = pd.to_datetime(f"{month}-01")
    end = (start + pd.offsets.MonthBegin(1)) - pd.Timedelta(days=1)
    dates = pd.date_range(start, end, freq="D")

    fx_rows: list[list[object]] = []
    for d in dates:
        fx_rows.append([d.date(), "USD", "USD", 1.0])
        fx_rows.append([d.date(), "EUR", "USD", float(np.random.uniform(1.05, 1.15))])
        fx_rows.append([d.date(), "TZS", "USD", float(np.random.uniform(0.00038, 0.00045))])
    pd.DataFrame(fx_rows, columns=["date", "from_currency", "to_currency", "rate"]).to_csv(
        out_dir / "fx_rates.csv", index=False
    )

    sales_rows: list[list[object]] = []
    for entity in entities:
        n = int(np.random.randint(20, 40))
        for i in range(n):
            d = np.random.choice(dates)
            ccy = np.random.choice(currencies, p=[0.5, 0.4, 0.1])
            amt = float(np.random.uniform(200, 5000))
            account_code = np.random.choice(["40000001", "40000002"], p=[0.7, 0.3])
            sales_rows.append(
                [d, entity, f"INV-{entity}-{i:04d}", str(account_code), ccy, amt, "Synthetic sale"]
            )
    pd.DataFrame(
        sales_rows,
        columns=["date", "entity", "invoice_id", "account_code", "currency", "amount", "description"],
    ).to_csv(out_dir / "sales.csv", index=False)

    exp_rows: list[list[object]] = []
    expense_accounts = ["62000001", "63000001", "64000001"]
    for entity in entities:
        n = int(np.random.randint(25, 55))
        for i in range(n):
            d = np.random.choice(dates)
            ccy = np.random.choice(currencies, p=[0.5, 0.4, 0.1])
            amt = float(np.random.uniform(50, 2500))
            account_code = np.random.choice(expense_accounts)
            exp_rows.append(
                [d, entity, f"BILL-{entity}-{i:04d}", str(account_code), ccy, amt, "Synthetic expense"]
            )
    pd.DataFrame(
        exp_rows,
        columns=["date", "entity", "bill_id", "account_code", "currency", "amount", "description"],
    ).to_csv(out_dir / "expenses.csv", index=False)

    pr_rows: list[list[object]] = []
    for entity in entities:
        for i in range(10):
            ccy = np.random.choice(["USD", "TZS"], p=[0.4, 0.6])
            gross = float(np.random.uniform(300, 1500))
            deductions = float(np.random.uniform(0, 150))
            net = float(round(gross - deductions, 2))
            pr_rows.append([month, entity, f"EMP-{entity}-{i:03d}", ccy, gross, deductions, net])
    pd.DataFrame(
        pr_rows,
        columns=["month", "entity", "employee_id", "currency", "gross", "deductions", "net"],
    ).to_csv(out_dir / "payroll.csv", index=False)

    inv_rows: list[list[object]] = []
    skus = ["HONEY-DRUM", "WAX-BLOCK", "GIN-750ML"]
    for entity in entities:
        n = int(np.random.randint(20, 40))
        for _ in range(n):
            d = np.random.choice(dates)
            sku = np.random.choice(skus)
            move = np.random.choice(["receipt", "issue", "adjustment"], p=[0.45, 0.45, 0.10])
            qty = float(np.random.uniform(1, 50))
            unit_cost = float(np.random.uniform(2, 80))
            ccy = np.random.choice(currencies, p=[0.5, 0.4, 0.1])
            inv_rows.append([d, entity, sku, move, qty, unit_cost, ccy])
    pd.DataFrame(
        inv_rows,
        columns=["date", "entity", "sku", "movement_type", "qty", "unit_cost", "currency"],
    ).to_csv(out_dir / "inventory_movements.csv", index=False)


def write_chart_of_accounts(out_dir: Path | str) -> None:
    """The 12-account chart of accounts (reference
    ``data/reference/chart_of_accounts.csv``)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rows = [
        ("40000001", "Sales - Export", "Revenue"),
        ("40000002", "Sales - Local", "Revenue"),
        ("50000001", "COGS - Inventory", "COGS"),
        ("61000001", "Salaries & Wages", "Expense"),
        ("61000002", "Payroll Taxes", "Expense"),
        ("62000001", "Rent", "Expense"),
        ("63000001", "Travel & Subsistence", "Expense"),
        ("64000001", "Bank Charges", "Expense"),
        ("10000001", "Cash at Bank", "Asset"),
        ("11000001", "Accounts Receivable", "Asset"),
        ("20000001", "Accounts Payable", "Liability"),
        ("21000001", "VAT Payable", "Liability"),
    ]
    pd.DataFrame(rows, columns=["account_code", "account_name", "account_type"]).to_csv(
        Path(out_dir) / "chart_of_accounts.csv", index=False
    )
