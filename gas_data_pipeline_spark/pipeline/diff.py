"""Snapshot diff: derive row-level change data (CDC) from two table
versions.

The reference only ever *applies* changes (upsert, delete-reload —
app/load/loader.py); it has no way to answer "what changed between
yesterday's table and today's?". Deriving the change set is the
inverse lakehouse primitive: it turns any pair of full snapshots into
the insert/update/delete feed that SCD2 tracking
(:mod:`gas_data_pipeline_spark.pipeline.scd`) and incremental
downstream consumers need when the upstream can't emit CDC itself.

Design: one full-outer join on the business key, column-wise
null-safe comparison for the update test (no row hashing — hashing
would hide WHICH columns moved and couple the result to a hash
implementation). Only changed rows survive; unchanged rows — the
overwhelming majority between adjacent snapshots — are filtered
before anything wide happens.

Scale shape: the join is the whole cost. Both sides shuffle on the
key once — or not at all when the snapshots are written bucketed on
the key (:mod:`gas_data_pipeline_spark.pipeline.bucketing` makes the
join zipper co-located buckets). The comparison projection is narrow
and codegen'd; output size is the churn rate, not the table size.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change rows between ``old`` and ``new`` snapshots.

    Returns one row per changed key: the key columns,
    ``change_type`` (``insert`` / ``delete`` / ``update``), and
    ``n_changed_cols`` (how many compared columns differ; 0 for
    inserts and deletes, where the whole row appeared or vanished).
    Unchanged keys are absent. ``compare_cols`` defaults to every
    non-key column present in BOTH snapshots, so schema drift (a
    column added in ``new``) never false-positives every row.
    """
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c not in keys and c in old.columns
        ]
    # Presence markers live outside the `_o_{col}` / `_n_{col}`
    # namespace so a data column named "present" can't collide; a key
    # column shadowing a marker is the one remaining (pathological)
    # clash, rejected loudly.
    o_mark, n_mark = "__diff_old_present", "__diff_new_present"
    if o_mark in keys or n_mark in keys:
        raise ValueError(f"key columns may not be named {o_mark}/{n_mark}")
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(True).alias(o_mark),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(True).alias(n_mark),
    )
    j = o.join(n, keys, "full_outer")
    diffs = [
        (~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))).cast("int")
        for c in compare_cols
    ]
    n_changed = reduce(lambda a, b: a + b, diffs) if diffs else F.lit(0)
    change_type = (
        F.when(F.col(o_mark).isNull(), F.lit("insert"))
        .when(F.col(n_mark).isNull(), F.lit("delete"))
        .when(n_changed > 0, F.lit("update"))
    )
    return (
        j.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            F.when(
                F.col("change_type") == "update", n_changed
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("n_changed_cols"),
        )
    )


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    cols: list[str],
) -> DataFrame:
    """Signed row-level deltas between snapshots — the retract/add feed
    incremental aggregate maintenance consumes: every changed key emits
    a ``sign = -1`` row carrying its OLD ``cols`` (if it existed) and a
    ``sign = +1`` row carrying its NEW ``cols`` (if it still does);
    unchanged keys emit nothing. Inserts are a bare +1, deletes a bare
    -1, updates the pair — which also makes group-attribute changes
    correct for free (the -1 lands in the old group, the +1 in the
    new one; a keyed "delta = new - old" formulation would silently
    credit the wrong group).

    Single pass over the same full-outer key join as
    :func:`snapshot_diff`: the two signed rows are built as a filtered
    struct array and exploded, so the join output is scanned once (two
    branch filters would re-execute the join per branch). Output size
    is at most 2x the churn, never the table.
    """
    o_mark, n_mark = "__delta_old_present", "__delta_new_present"
    if o_mark in keys or n_mark in keys:
        raise ValueError(f"key columns may not be named {o_mark}/{n_mark}")
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in cols],
        F.lit(True).alias(o_mark),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in cols],
        F.lit(True).alias(n_mark),
    )
    j = o.join(n, keys, "full_outer")
    changed = (
        F.col(o_mark).isNull()
        | F.col(n_mark).isNull()
        | reduce(
            lambda a, b: a | b,
            [
                ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
                for c in cols
            ],
            F.lit(False),
        )
    )
    retract = F.when(
        F.col(o_mark).isNotNull() & changed,
        F.struct(
            F.lit(-1).alias("sign"),
            *[F.col(f"_o_{c}").alias(c) for c in cols],
        ),
    )
    addition = F.when(
        F.col(n_mark).isNotNull() & changed,
        F.struct(
            F.lit(1).alias("sign"),
            *[F.col(f"_n_{c}").alias(c) for c in cols],
        ),
    )
    rows = F.filter(F.array(retract, addition), lambda x: x.isNotNull())
    return (
        j.select(*keys, F.explode(rows).alias("__d"))
        .select(*keys, F.col("__d.sign").alias("sign"), *[F.col(f"__d.{c}").alias(c) for c in cols])
    )


def apply_delta_to_rollup(
    rollup: DataFrame,
    deltas: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
    sign_col: str = "sign",
) -> DataFrame:
    """Incremental view maintenance for count/sum rollups: fold a
    signed delta feed (:func:`snapshot_delta`) into a persisted
    ``GROUP BY group_cols`` aggregate WITHOUT rescanning the fact
    table — the refresh cost is the churn, not the 100 TB.

    ``rollup`` holds ``group_cols``, ``count_col`` (count(*)) and one
    pre-summed column per ``sum_cols`` entry; ``deltas`` carries the
    same value columns at row grain plus ``sign_col``. The delta feed
    aggregates per group first (map-side combinable, churn-sized),
    then one full-outer join merges it: counts add sign, sums add
    sign*value (a null value contributes nothing to the sum but still
    moves the count — exactly count(*)/sum() semantics), and groups
    whose count reaches zero vanish, matching what a recompute would
    produce. Keep the summed columns decimal for bit-exact maintenance;
    float sums drift from a recompute by association order.

    Only count/sum (and ratios derived from them, e.g. avg) are
    maintainable under deletes; min/max need a recompute of the
    touched groups — out of scope here by design.
    """
    d = deltas.groupBy(*group_cols).agg(
        F.sum(F.col(sign_col)).cast("bigint").alias("__row_delta"),
        *[
            F.sum(F.col(sign_col) * F.col(c)).alias(f"__d_{c}")
            for c in sum_cols
        ],
    )
    j = rollup.join(d, group_cols, "full_outer")
    zero = F.lit(0)
    merged_count = (
        F.coalesce(F.col(count_col), zero.cast("bigint"))
        + F.coalesce(F.col("__row_delta"), zero.cast("bigint"))
    ).alias(count_col)
    sum_types = {
        f.name: f.dataType.simpleString()
        for f in rollup.schema.fields
        if f.name in sum_cols
    }
    merged_sums = [
        (
            F.coalesce(F.col(c), zero.cast(sum_types[c]))
            + F.coalesce(F.col(f"__d_{c}"), zero.cast(sum_types[c]))
        ).alias(c)
        for c in sum_cols
    ]
    return (
        j.select(*group_cols, merged_count, *merged_sums)
        .filter(F.col(count_col) > 0)
    )
