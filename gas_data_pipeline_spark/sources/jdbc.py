"""JDBC source/sink (SURVEY §2.1 SRC7 — the external-DB edge).

The reference's query layer reads Postgres via SQL strings
(app/api/v2/queries.py:3-26, app/client/gas_client.py:31-49). The
engine's PRIMARY read path is the parquet lakehouse (catalog.py); this
module is the seam for TRUE external databases — reference data still
living in an operational Postgres, or a JDBC sink feeding a legacy
consumer.

Scale rules encoded here:

- **Parallel reads need a partition spec.** A bare ``spark.read.jdbc``
  is ONE task holding one connection — fine for dims, a non-starter
  for facts. ``partition_column/num_partitions`` turn the scan into
  ``num_partitions`` range-predicate queries executed concurrently.
- **Push the query down.** ``query=`` (or a filter on the returned
  DataFrame — Catalyst pushes compiled predicates into the remote
  WHERE clause) makes the database do selection/projection; never ship
  a table to filter it Spark-side.
- **fetchsize** defaults are driver-dependent and usually tiny
  (Postgres: 0 = all rows buffered!); 10k rows/round-trip is a sane
  production default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    **options: str,
) -> DataFrame:
    """SRC7: scan an external table over JDBC.

    With ``partition_column`` (+ bounds + ``num_partitions``) the read
    fans out into parallel range queries — the bounds need not be
    exact min/max (rows outside still land in the edge partitions),
    they only shape the split points.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column needs lower_bound, upper_bound and num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    driver: str | None = None,
    mode: str = "append",
    batchsize: int = 10_000,
    **options: str,
) -> None:
    """JDBC sink: batched inserts, one connection per task — size the
    DataFrame's partitioning to what the database can absorb (a
    ``coalesce(8)`` beats 1000 executors opening 1000 connections)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
