"""Export sinks (SNK5 CSV, SNK6 JSON) — reference app/api/v2/export.py.

The reference streams ``pd.json_normalize``-flattened payloads as CSV
or a JSON list, newest first, capped. Engine form: flatten via
``from_json`` + star-select, order+limit (TakeOrderedAndProject), then
a distributed ``write.csv``/``write.json`` — or ``toPandas`` at the
API edge for small responses (the caps are ≤50 000 rows, driver-safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXPORT_MAX_ROWS = 50_000  # reference export.py:16,38


def export_recent(df: DataFrame, order_col: str, tie_col: str, limit: int) -> DataFrame:
    """Newest-first capped selection shared by both exports
    (reference export.py:24-26,46-48)."""
    limit = min(limit, EXPORT_MAX_ROWS)
    return df.orderBy(F.col(order_col).desc(), F.col(tie_col).desc()).limit(limit)


def export_csv(df: DataFrame, path: str, order_col: str, tie_col: str, limit: int) -> None:
    """SNK5: CSV with header (reference export.py:35-62)."""
    export_recent(df, order_col, tie_col, limit).write.mode("overwrite").option(
        "header", True
    ).csv(path)


def export_json(df: DataFrame, path: str, order_col: str, tie_col: str, limit: int) -> None:
    """SNK6: newline-delimited JSON (reference export.py:13-31)."""
    export_recent(df, order_col, tie_col, limit).write.mode("overwrite").json(path)
