"""Bronze layer: append-only zero-loss raw event store (SNK1).

Mirrors the reference's ``raw_events`` JSONB landing zone
(app/db/models.py:65-74, app/ingestion/raw_ingestor.py:23-54): every
source row is preserved verbatim as a JSON payload plus lineage
columns. Spark-first: the payload is ``to_json(struct(*))`` (NaN→null
is native), the table is Parquet partitioned by ``dataset_id`` and
ingest date — at 100 TB partition pruning replaces the reference's
B-tree/GIN indexes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BRONZE_PARTITIONS = ("dataset_id", "ingest_date")


def to_bronze(df: DataFrame, dataset_id: str, source: str) -> DataFrame:
    """Wrap a source batch in the bronze envelope (no write)."""
    return df.select(
        F.expr("uuid()").alias("event_id"),
        F.lit(dataset_id).alias("dataset_id"),
        F.lit(source).alias("source"),
        F.current_timestamp().alias("ingested_at"),
        F.to_json(F.struct(*df.columns)).alias("raw_payload"),
    ).withColumn("ingest_date", F.to_date("ingested_at"))


def bronze_append(df: DataFrame, dataset_id: str, source: str, path: str) -> None:
    """SNK1: land a batch in the bronze store, append-only."""
    (
        to_bronze(df, dataset_id, source)
        .write.mode("append")
        .partitionBy(*BRONZE_PARTITIONS)
        .parquet(path)
    )


def read_bronze(
    spark: SparkSession, path: str, dataset_id: str | None = None
) -> DataFrame:
    """Scan the bronze store; the dataset filter prunes partitions."""
    df = spark.read.parquet(path)
    if dataset_id is not None:
        df = df.filter(F.col("dataset_id") == dataset_id)
    return df
