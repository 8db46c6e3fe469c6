"""Dimension maintenance: insert-if-absent and delete-reload (SNK3/SNK4).

The reference's ``ON CONFLICT DO NOTHING`` catalog upserts
(series_autoregister.py:55-56) and the GIE delete-reload
(gie/service.py:12-77) become set-based anti-join writes.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def insert_if_absent(
    spark: SparkSession, incoming: DataFrame, path: str, keys: list[str]
) -> DataFrame:
    """SNK3: append only the rows whose key is not already present
    (one left-anti join — never row-at-a-time probes). Returns the rows
    that were inserted.

    The existing-keys side is NOT hint-broadcast: dimension key sets
    are usually tiny and AQE broadcasts them automatically under the
    session's autoBroadcastJoinThreshold, but a forced hint would OOM
    the driver if series cardinality ever exploded — let the runtime
    pick shuffle join in that regime.
    """
    incoming = incoming.dropDuplicates(keys)
    if os.path.exists(path):
        existing_keys = spark.read.parquet(path).select(*keys)
        new_rows = incoming.join(existing_keys, keys, "left_anti")
    else:
        new_rows = incoming
    new_rows.write.mode("append").parquet(path)
    return new_rows


def _swap_dirs(staging: str, path: str) -> None:
    """Promote ``staging`` over ``path`` by rename (no second data
    write). Not atomic on plain FS — single-writer assumption, same as
    the reference scheduler's ``max_instances=1``; on an object store /
    HDFS deployment this is the commit-protocol's job."""
    old = path + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old, ignore_errors=True)


def delete_reload(
    spark: SparkSession,
    replacement: DataFrame,
    path: str,
    predicate,
    partition_col: str | None = None,
) -> None:
    """SNK4: the GIE delete-then-reload — drop every existing row
    matching ``predicate`` (a Column), then append ``replacement``.

    Two regimes:

    - ``partition_col`` given (the 100-TB path): the table is laid out
      ``partitionBy(partition_col)`` and only the partitions that
      contain predicate matches or replacement rows are rewritten,
      via dynamic partition overwrite — exactly one data-write pass
      over the affected partitions, untouched partitions' files are
      never read-for-write or replaced. The partition-value collect is
      bounded by partition count, not rows (same shape as
      silver.upsert_observations). Affected partitions whose result is
      empty (pure deletion, nothing reloaded) are dropped by directory
      remove, since dynamic overwrite only replaces partitions it
      writes.
    - unpartitioned (small dims): survivors ∪ replacement staged to a
      sibling directory and promoted by RENAME — one data write, no
      re-read-re-write cycle.
    """
    if not os.path.exists(path):
        w = replacement.write.mode("overwrite")
        if partition_col:
            w = w.partitionBy(partition_col)
        w.parquet(path)
        return

    existing = spark.read.parquet(path)
    pred = F.coalesce(predicate, F.lit(False))

    if partition_col:
        affected = {
            r[0]
            for r in existing.filter(pred)
            .select(partition_col)
            .distinct()
            .collect()
        } | {
            r[0]
            for r in replacement.select(partition_col).distinct().collect()
        }
        survivors = existing.filter(
            F.col(partition_col).isin(list(affected))
        ).filter(~pred)
        out = survivors.unionByName(replacement, allowMissingColumns=True)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Redistribute on the partition key before partitionBy so file
        # count tracks partitions, not tasks x partitions (see
        # silver.upsert_observations).
        (
            out.repartition(F.col(partition_col))
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )
        # Dynamic overwrite replaces only partitions present in `out`:
        # a fully-deleted partition (no survivors, no replacement rows)
        # must be dropped explicitly.
        remaining = {
            r[0] for r in out.select(partition_col).distinct().collect()
        }
        for val in affected - remaining:
            shutil.rmtree(
                os.path.join(path, f"{partition_col}={val}"),
                ignore_errors=True,
            )
        return

    survivors = existing.filter(~pred)
    out = survivors.unionByName(replacement, allowMissingColumns=True)
    staging = path + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    out.write.mode("overwrite").parquet(staging)
    _swap_dirs(staging, path)
