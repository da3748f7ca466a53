"""PySpark-native finance monthly-close ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo Chezhira/Finance-ETL-Pipeline-Monthly-Close-Dataset
(pandas + pandera, surveyed in /root/repo/SURVEY.md): typed CSV
ingestion, declarative data-quality checks with severities and a
PASS/FAIL gate, month-window filtering, FX conversion to a base
currency, a unified fact_transactions table, monthly KPI pivots, a
Kimball star schema, and flat BI exports -- plus large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing, event-stream windowing) the reference
does not have.

Everything is expressed with the PySpark DataFrame API so Catalyst /
Tungsten / AQE pick physical strategies; there are no row-at-a-time
Python UDFs in any hot path.
"""

from __future__ import annotations

__version__ = "0.1.0"
