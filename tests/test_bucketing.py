"""Bucketed-table co-location (pipeline/bucketing.py): joins on the
bucket key must plan without any Exchange — the pay-the-shuffle-once
layout that makes fact-to-fact joins viable at 100 TB."""

from __future__ import annotations

import pytest

from gas_data_pipeline_spark.catalog import table
from gas_data_pipeline_spark.pipeline.bucketing import bucketed_join, write_bucketed
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = table(spark, SF_SMALL, "orders")
    lineitem = table(spark, SF_SMALL, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], 4, sort_by=["o_orderkey"])
    write_bucketed(lineitem, "b_lineitem", ["o_orderkey"], 4, sort_by=["o_orderkey"])
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # Keep the optimizer honest: no broadcast fallback for this check.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = bucketed_join(spark, left, right, ["o_orderkey"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # (A local per-bucket sort may remain: Spark only elides it when
        # each bucket is exactly one file. The exchange elision is the
        # scale property — sorts are local, shuffles are not.)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    bucketed_n = bucketed_join(spark, left, right, ["o_orderkey"]).count()
    plain_n = (
        table(spark, SF_SMALL, "orders")
        .join(
            table(spark, SF_SMALL, "lineitem").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        )
        .count()
    )
    assert bucketed_n == plain_n


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    left, _ = bucketed_tables
    from pyspark.sql import functions as F

    agg = spark.table(left).groupBy("o_orderkey").agg(F.sum("o_totalprice"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
