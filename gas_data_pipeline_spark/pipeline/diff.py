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
