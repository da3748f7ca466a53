"""Money arithmetic helpers (SURVEY.md §2.6 F13, §7.4 item 1)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_round(col: Column, scale: int = 2) -> Column:
    """Round money to ``scale`` decimals with HALF_EVEN (banker's)
    rounding via ``bround``.

    The reference rounds with numpy/pandas ``.round()``
    (``/root/reference/src/finance_etl/transform.py:44,83,126-127``),
    which is HALF_EVEN; Spark's ``round`` is HALF_UP and would diverge
    on exact .xx5 midpoints.
    """
    return F.bround(col, scale)
