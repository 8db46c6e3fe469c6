"""Silver layer: typed long-format observation store with upsert (SNK2).

The reference upserts ``(series_id, observation_time)`` via
``INSERT ... ON CONFLICT DO UPDATE`` (app/ingestion/loader.py:7-35)
after an in-batch last-write-wins dedup (loader.py:13-18). Without a
transactional MERGE (no Delta in this container) the engine gets the
same idempotent semantics from:

1. window dedup inside the incoming batch (explicit, deterministic
   tie-break — SURVEY §7 #3);
2. union with the *affected date partitions only* of the existing
   table, re-dedup (new rows win on ties via a batch_priority column);
3. dynamic partition overwrite of exactly those partitions.

At 100 TB step 2 never touches unaffected partitions, and the shuffle
is keyed on the same (series, time) the MERGE would need — no extra
cost vs Delta MERGE; only atomicity is weaker (single-writer assumed,
like the reference's ``max_instances=1`` scheduler).

Schema evolution is NOT a contract of this plain layer: a batch that
adds a column rewrites only its affected partitions, and a root-level
``spark.read.parquet`` anchors its schema on one file's footer — the
added column is visible only if a new-schema file anchors the scan.
Use :mod:`gas_data_pipeline_spark.pipeline.versioned`, which declares
the evolved schema as manifest metadata, when columns can drift.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

KEYS = ("series_id", "observation_time")
PARTITION_COL = "obs_date"


def dedup_last_write_wins(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """A5: keep the newest row per (series_id, observation_time);
    ties broken by ``order_cols`` descending (deterministic, unlike the
    reference's dict-insertion order)."""
    w = Window.partitionBy(*KEYS).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_observations(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    order_cols: list[str] | None = None,
) -> None:
    """SNK2: idempotent upsert of an observation batch into ``path``.

    ``batch`` columns: series_id, observation_time, value,
    quality_flag, ingestion_time (+ optional raw_payload).
    ``order_cols``: descending tie-break for last-write-wins; include a
    unique column (e.g. event id) after ingestion_time to make ties
    deterministic.
    """
    order_cols = order_cols or ["ingestion_time"]
    batch = batch.withColumn(PARTITION_COL, F.to_date("observation_time")).withColumn(
        "__prio", F.lit(1)
    )

    cached = None
    if os.path.exists(path):
        # The batch is consumed twice on the merge path (the
        # affected-partition discovery collect, then the merge union) —
        # cache it so the melt/window lineage upstream isn't replayed.
        cached = batch.persist()
        # Only the partitions the batch touches participate in the
        # merge. Discovery runs on the raw batch: dedup never changes
        # the date set, so the in-batch dedup folds into the merge
        # window below — ONE (series, time)-keyed shuffle settles
        # in-batch ties AND batch-vs-existing priority in the same
        # row_number (it was two full window shuffles through r9).
        affected = [r[0] for r in batch.select(PARTITION_COL).distinct().collect()]
        existing = (
            spark.read.parquet(path)
            .filter(F.col(PARTITION_COL).isin(affected))
            .withColumn("__prio", F.lit(0))
        )
        merged = batch.unionByName(existing, allowMissingColumns=True)
    else:
        merged = batch

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    # ONE shuffle settles dedup AND write shape. obs_date is a function
    # of observation_time, so hash-partitioning by obs_date clusters
    # every (series, time) group into one task — which satisfies the
    # dedup window's ClusteredDistribution when the window adds
    # obs_date to its partition keys (same groups: date is determined
    # by time). The window then plans with NO second exchange, and the
    # write inherits the date clustering partitionBy needs:
    # files-per-partition stays independent of task count (without the
    # date hash, tasks x dates small files at cluster scale). New
    # batch wins over existing on key collision (__prio desc), then
    # the caller's tie-break — within and across sides. A huge single
    # gas-day serializes through one task here exactly as the
    # write-side repartition already forced through r9; cap file size
    # with spark.sql.files.maxRecordsPerFile when that bites.
    w = Window.partitionBy(PARTITION_COL, *KEYS).orderBy(
        *[F.col(c).desc() for c in ("__prio", *order_cols)]
    )
    (
        merged.repartition(F.col(PARTITION_COL))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__prio")
        .write.mode("overwrite")
        .partitionBy(PARTITION_COL)
        .parquet(path)
    )
    if cached is not None:
        cached.unpersist()


def read_observations(
    spark: SparkSession,
    path: str,
    series_id: str | None = None,
    start=None,
    end=None,
) -> DataFrame:
    """The client read path (reference app/client/gas_client.py:31-38):
    optional key equality + time range, time-ordered. Date-partition
    pruning stands in for the composite-PK index."""
    df = spark.read.parquet(path)
    if series_id is not None:
        df = df.filter(F.col("series_id") == series_id)
    if start is not None:
        df = df.filter(F.col("observation_time") >= start)
    if end is not None:
        df = df.filter(F.col("observation_time") <= end)
    return df.orderBy("observation_time")
