"""Local replica of the driver's Spark-vs-DuckDB compare.

Mirrors the documented contract: row count + schema (name-sorted
columns) + order-insensitive value comparison. Cell values are
canonicalized (floats rounded, timestamps to ISO, nested to repr) so
benign representation differences don't mask real mismatches.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import numpy as np
import pandas as pd


def _canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return f"{round(v, 6):.6f}"
    if isinstance(v, (np.floating,)):
        return _canon(float(v))
    if isinstance(v, Decimal):
        return _canon(float(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime)):
        if pd.isna(v):
            return "∅"
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if v is pd.NaT:
        return "∅"
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon(row[c]) for c in cols)
        for row in pdf.to_dict(orient="records")
    ]
    return sorted(rows)


def assert_frames_match(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    srows = canonical_rows(spark_pdf)
    drows = canonical_rows(duck_pdf)
    if srows != drows:
        diffs = [
            (s, d) for s, d in zip(srows, drows) if s != d
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark vs duck):\n"
            + "\n".join(f"  {s}\n  {d}\n" for s, d in diffs)
        )
