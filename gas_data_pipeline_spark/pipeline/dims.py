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
    that were inserted."""
    incoming = incoming.dropDuplicates(keys)
    if os.path.exists(path):
        existing_keys = spark.read.parquet(path).select(*keys)
        new_rows = incoming.join(F.broadcast(existing_keys), keys, "left_anti")
    else:
        new_rows = incoming
    new_rows.write.mode("append").parquet(path)
    return new_rows


def delete_reload(
    spark: SparkSession,
    replacement: DataFrame,
    path: str,
    predicate,
) -> None:
    """SNK4: the GIE delete-then-reload — drop every existing row
    matching ``predicate`` (a Column), then append ``replacement``.
    Expressed as survivors ∪ replacement with a full rewrite; on a
    partitioned table the predicate should align with partitions so
    only those rewrite (replaceWhere semantics)."""
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        survivors = existing.filter(~F.coalesce(predicate, F.lit(False)))
        out = survivors.unionByName(replacement, allowMissingColumns=True)
    else:
        out = replacement
    # Write-temp-then-swap is not atomic on plain FS; single-writer
    # assumption (reference scheduler max_instances=1). Stage to a
    # sibling dir then rename for crash consistency.
    tmp = path + ".staging"
    out.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(path)
    shutil.rmtree(tmp, ignore_errors=True)
