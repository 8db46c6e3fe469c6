"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship DATA_QUERY (SURVEY §3.1) at
sf0.001. ``queries()`` / ``oracle_sql()`` expose the full operator
suite registered in :mod:`gas_data_pipeline_spark.registry` — one
entry per implemented operator from SURVEY.md §2, each with a DuckDB
oracle when SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from gas_data_pipeline_spark.catalog import table
    from gas_data_pipeline_spark.plans.flagship import data_query

    sf_dir = "/root/testdata/sf0.001"
    return data_query(
        spark,
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "customer"),
        mktsegment="BUILDING",
        start_date="1996-01-01",
        min_price=10_000.0,
        limit=1000,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from gas_data_pipeline_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only)."""
    from gas_data_pipeline_spark.registry import all_oracles

    return all_oracles()
