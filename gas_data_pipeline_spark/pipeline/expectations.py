"""Rule-driven data-quality expectations (SURVEY §2.2 F6/F7 made
first-class).

The reference validates row-by-row in Python during transform
(app/ingestion/transformer.py:78-95 — reject non-castable floats,
null keys) and silently drops offenders. A 100-TB pipeline needs the
same checks as ONE set-based pass with an audit trail: which rules
fired, how often, and a quarantine of the offending rows (never
silent deletion — the zero-loss principle of the bronze layer applied
to validation).

Design: every rule is a named boolean Column; one projection stamps
``violated_rules`` (the array of failed rule names) on every row, so
the valid/quarantine split and the per-rule metrics all derive from a
single narrow pass — no per-rule scans, no shuffle except the tiny
metrics aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VIOLATIONS_COL = "violated_rules"


def stamp_expectations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Add ``violated_rules array<string>`` listing every rule whose
    predicate is NOT satisfied for the row. A null predicate result
    counts as a violation (SQL three-valued logic would otherwise let
    null-laden rows pass every check). Narrow: one projection."""
    if not rules:
        raise ValueError("need at least one expectation rule")
    flags = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
                for name, pred in rules.items()
            ]
        )
    )
    return df.withColumn(VIOLATIONS_COL, flags)


def split_valid(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantine): rows passing every rule vs rows with at
    least one violation — quarantine keeps all columns plus the
    ``violated_rules`` audit array, nothing is dropped."""
    stamped = stamp_expectations(df, rules)
    valid = stamped.filter(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    quarantine = stamped.filter(F.size(VIOLATIONS_COL) > 0)
    return valid, quarantine


def expectation_metrics(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Per-rule audit: (rule, n_violations, n_rows, violation_rate).
    One narrow stamping pass + one tiny aggregate — the per-rule
    counters come from conditional sums over the same stamped column,
    not one scan per rule."""
    stamped = stamp_expectations(df, rules)
    aggs = [
        F.sum(
            F.array_contains(F.col(VIOLATIONS_COL), name).cast("bigint")
        ).alias(name)
        for name in rules
    ]
    wide = stamped.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col(name).alias("n_violations"),
                )
                for name in rules
            ]
        )
    ).alias("kv")
    return wide.select("__n", pairs).select(
        F.col("kv.rule").alias("rule"),
        F.col("kv.n_violations").alias("n_violations"),
        F.col("__n").alias("n_rows"),
        F.round(F.col("kv.n_violations") / F.col("__n"), 6).alias(
            "violation_rate"
        ),
    )
