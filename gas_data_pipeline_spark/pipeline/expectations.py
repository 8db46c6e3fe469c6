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


def referential_integrity_audit(
    edges: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Cross-table FK health: for each edge ``(name, child, fk_col,
    parent, pk_col)`` report how many child rows reference a missing
    parent. The single-table rules above can't see this — it is the
    join-level analogue of the null/range expectations, and at corpus
    scale it's how silent upstream deletes and partial loads surface.

    Returns one row per edge: ``edge, n_child, n_null_fk, n_orphans,
    orphan_rate`` (null FKs are counted separately, NOT as orphans —
    an optional relationship is not a broken one).

    Scale shape: per edge, the child's FK column (alone — nothing
    wider rides the shuffle) left-joins the parent's distinct PK and
    collapses into a one-row aggregate; the edges' one-row results
    union. Parent key sets broadcast under AQE when they fit; the
    audit never materializes row-level output."""
    if not edges:
        raise ValueError("referential_integrity_audit needs at least one edge")
    parts = []
    for name, child, fk, parent, pk in edges:
        p = parent.select(F.col(pk).alias("_pk")).distinct()
        j = child.select(F.col(fk).alias("_fk")).join(
            p, F.col("_fk") == F.col("_pk"), "left"
        )
        agg = j.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_child"),
            F.sum(F.col("_fk").isNull().cast("int"))
            .cast("bigint")
            .alias("n_null_fk"),
            F.sum((F.col("_fk").isNotNull() & F.col("_pk").isNull()).cast("int"))
            .cast("bigint")
            .alias("n_orphans"),
        )
        parts.append(agg.select(F.lit(name).alias("edge"), "*"))
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out.withColumn(
        "orphan_rate", F.round(F.col("n_orphans") / F.col("n_child"), 6)
    )
