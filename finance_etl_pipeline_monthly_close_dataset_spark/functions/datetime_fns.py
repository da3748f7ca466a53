"""Date/time scalar functions (SURVEY.md §2.6 F1-F8).

All JVM-side Catalyst expressions -- no Python UDFs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F


def month_window(month: str) -> tuple[dt.datetime, dt.datetime]:
    """``[start, end)`` timestamps for a ``YYYY-MM`` month string.

    Reference: ``_month_window`` at
    ``/root/reference/src/finance_etl/pipeline.py:23-27``.
    Computed driver-side (it parameterizes filters, it is not data).
    """
    start = dt.datetime.strptime(month + "-01", "%Y-%m-%d")
    end = (start.replace(day=28) + dt.timedelta(days=4)).replace(day=1)
    return start, end


def month_str(col: Column) -> Column:
    """Timestamp/date -> ``YYYY-MM`` string (reference
    ``dt.to_period('M').astype(str)``, ``transform.py:115``)."""
    return F.date_format(col, "yyyy-MM")


def month_end_date(month_col: Column) -> Column:
    """``YYYY-MM`` string -> last calendar day of that month as a date
    (reference dates payroll to month end, ``transform.py:70``)."""
    return F.last_day(F.to_date(F.concat(month_col, F.lit("-01"))))


def month_key(col: Column) -> Column:
    """Date -> int ``YYYYMM`` surrogate key
    (reference ``export_powerbi_star_schema.py:42-48``)."""
    return F.date_format(col, "yyyyMM").cast("int")
