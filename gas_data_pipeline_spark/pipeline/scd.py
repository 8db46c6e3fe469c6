"""Slowly-changing-dimension (type 2) history building.

The reference keeps only the latest row per key (its upsert path,
``app/db/repository.py`` upsert semantics); a lakehouse additionally
wants the full version history — every value a key has held, with
validity intervals — so facts can join to the dimension *as of* the
fact's own time. ``scd2_intervals`` builds that history from a change
log in one pass.

Scale shape: everything is per-key window work over (key, ts) — one
shuffle on the key, then two ordered passes within each partition
(change detection + interval numbering). No joins, no driver state; at
100 TB the cost is the single exchange every per-key operator pays,
and AQE handles key skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_intervals(
    changes: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse a per-key change log into SCD2 validity intervals.

    Consecutive rows with the same ``attr_col`` value merge into one
    interval; a value change closes the open interval (``valid_to`` =
    next interval's ``valid_from``) and opens a new one. The latest
    interval per key has ``valid_to`` NULL and ``is_current`` true.
    ``n_changes`` counts the change-log rows the interval absorbed.

    Deterministic: ordering is (ts, tiebreak) so replays produce
    byte-identical history — the property that makes the build
    idempotent and therefore safe to re-run over a corrected log.
    """
    order: list[Column] = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(attr_col)).over(w)
    # Two projections: a window function can't nest inside another
    # window aggregate in one expression.
    flagged = changes.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col),
        *([F.col(tiebreak_col)] if tiebreak_col is not None else []),
    ).withColumn("_chg", (prev.isNull() | (prev != F.col(attr_col))).cast("bigint"))
    numbered = flagged.withColumn(
        "_interval_no",
        F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    intervals = numbered.groupBy(key_col, "_interval_no").agg(
        F.first(F.col(attr_col)).alias(attr_col),
        F.min(F.col(ts_col)).alias("valid_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_changes"),
    )
    w2 = Window.partitionBy(key_col).orderBy("_interval_no")
    return intervals.select(
        F.col(key_col),
        F.col(attr_col),
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
        "n_changes",
    )
