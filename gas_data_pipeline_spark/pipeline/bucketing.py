"""Bucketed table layout: shuffle-free co-located joins.

The reference's hottest join is fact⋈dim on `series_id`
(reference app/db/queries.py:14-16) where the dim broadcasts. The
fact⋈fact case — observations joined to observations, e.g. silver
upsert reconciliation or dedup against the existing table — has no
small side, and at 100 TB the shuffle of BOTH sides dominates the job.
Bucketing pre-partitions the stored table by the join key into a fixed
number of hash buckets; two tables bucketed the same way join with NO
exchange at read time (Spark matches `HashPartitioning` from the scan
to the join's requirement), and a `sortBy` within buckets removes the
sort too.

Pay the shuffle once at write time, skip it on every subsequent join —
the same economics as the Z-order pass in operators/layout.py: layout
work amortized across reads.

Bucketed tables require the session catalog (`saveAsTable`; plain
`parquet(path)` writes drop bucket metadata). Spark's in-memory /
derby catalog handles this in local mode; a real deployment uses the
metastore it already has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
) -> None:
    """Persist `df` hash-bucketed on `keys` (optionally sorted within
    each bucket) so future joins/aggregations on `keys` read
    pre-partitioned data instead of shuffling."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *keys)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. With equal
    bucket counts the plan contains no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), keys, how)
