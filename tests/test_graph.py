"""Semantic tests for operators/graph.pagerank: mass conservation on
dangling-free graphs, hand-checkable fixpoints, and hub dominance —
the properties the unrolled-SQL oracle can't explain by itself."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gas_data_pipeline_spark.operators.graph import pagerank


def _ranks(spark, pairs, iters=5, damping=0.85):
    e = spark.createDataFrame(pairs, "src bigint, dst bigint")
    pdf = pagerank(e, iters=iters, damping=damping).toPandas()
    return dict(zip(pdf.node, pdf["rank"]))


def test_two_node_cycle_is_fixpoint(spark):
    """A 2-cycle is already the stationary distribution: each node
    keeps rank exactly 1.0 through every round ((1-d) + d*1/1)."""
    r = _ranks(spark, [(1, 2), (2, 1)], iters=7)
    assert r[1] == pytest.approx(1.0, abs=1e-12)
    assert r[2] == pytest.approx(1.0, abs=1e-12)


def test_mass_conserved_without_dangling_nodes(spark):
    """With every node having out-degree >= 1, total scaled rank is
    invariant at |V| each round (sum of contributions equals sum of
    ranks), so after any number of rounds sum(rank) == |V|."""
    pairs = [(i, (i * 3 + 1) % 11) for i in range(11)] + [(i, (i + 1) % 11) for i in range(11)]
    pairs = [(a, b) for a, b in pairs if a != b]
    r = _ranks(spark, pairs, iters=6)
    assert sum(r.values()) == pytest.approx(len(r), rel=1e-9)


def test_star_hub_outranks_leaves(spark):
    """Bidirectional star: the hub collects every leaf's full rank
    and must dominate; leaves stay symmetric (equal ranks)."""
    leaves = list(range(1, 9))
    pairs = [(0, v) for v in leaves] + [(v, 0) for v in leaves]
    r = _ranks(spark, pairs)
    leaf_ranks = {round(r[v], 9) for v in leaves}
    assert len(leaf_ranks) == 1
    assert r[0] > max(r[v] for v in leaves) * 2


def test_dangling_node_contributes_nothing(spark):
    """A node with in-edges but no out-edges absorbs rank but leaks
    its own (the documented simplification): source keeps only the
    teleport floor (1-d) after round 1 onward."""
    r = _ranks(spark, [(1, 2)], iters=5, damping=0.85)
    assert r[1] == pytest.approx(0.15, abs=1e-12)
    # node 2 receives the geometric tail of node 1's decaying rank
    assert r[2] > r[1]


def test_hub_salting_preserves_ranks_exactly(spark):
    """Salted and unsalted PageRank must agree to float noise: the
    per-edge contribution rank/odeg is unchanged by salting and the
    dst-side sum is associative, so splitting a hub's edges across
    salt buckets only reorders the summation."""
    # hub 0 -> 200 leaves, plus a back-edge ring among the leaves so
    # the graph has structure beyond the star.
    pairs = [(0, v) for v in range(1, 201)] + [
        (v, v % 200 + 1) for v in range(1, 201)
    ] + [(5, 0), (17, 0)]
    e = spark.createDataFrame(pairs, "src bigint, dst bigint")
    plain = {
        r.node: r["rank"] for r in pagerank(e, iters=4).collect()
    }
    salted = {
        r.node: r["rank"]
        for r in pagerank(
            e, iters=4, hub_degree_threshold=50, hub_salts=8
        ).collect()
    }
    assert set(plain) == set(salted)
    for node, rank in plain.items():
        assert salted[node] == pytest.approx(rank, rel=1e-12)


def test_hub_salting_bounds_max_task_input(spark):
    """The property salting buys: after the (src, salt) co-partition,
    no single partition holds the whole hub's edge list. With an
    801-edge hub and 8 salts over 8 partitions, the max partition is
    bounded well below the hub degree (vs. the unsalted layout where
    one partition necessarily holds all 801)."""
    from pyspark.sql import functions as F

    pairs = [(0, v) for v in range(1, 802)]
    e = spark.createDataFrame(pairs, "src bigint, dst bigint")

    def max_partition_rows(df):
        sizes = (
            df.groupBy(F.spark_partition_id().alias("p"))
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        return sizes

    unsalted = e.repartition(8, "src")
    assert max_partition_rows(unsalted) == 801  # all hub edges in one task
    salt = F.pmod(F.xxhash64("dst"), F.lit(8)).cast("int")
    salted = e.withColumn("__salt", salt).repartition(8, "src", "__salt")
    # The join key is now (src, salt): no single key group carries more
    # than ~1/8 of the hub (the per-task bound once partitions >= keys);
    # with only 8 partitions several salt keys can share a partition, so
    # the partition bound is looser but still far below the full hub.
    max_group = (
        salted.groupBy("src", "__salt").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_group <= 2 * (801 // 8 + 1)
    assert max_partition_rows(salted) <= 801 // 2


def test_hub_salting_rejects_bad_salt_count(spark):
    e = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError):
        pagerank(e, hub_degree_threshold=10, hub_salts=1)


def test_entity_resolution_survivorship_invariants(spark):
    """Every cluster elects exactly one canonical; the canonical is a
    member of its own cluster with the minimum (price, key); cluster
    ids are the min member key; singletons self-label. Checked on the
    registered composition at test SF."""
    import pyspark.sql.functions as F

    from gas_data_pipeline_spark.registry import all_queries
    from tests.conftest import SF_DIR

    out = all_queries()["entity_resolution_e2e"](spark, SF_DIR).toPandas()
    grouped = out.groupby("cluster_id")
    for cid, g in grouped:
        assert g["is_canonical"].sum() == 1, cid
        canon = g["canonical_partkey"].unique()
        assert len(canon) == 1 and canon[0] in set(g["p_partkey"]), cid
        assert cid == g["p_partkey"].min(), cid
        assert (g["cluster_size"] == len(g)).all(), cid
    # Part table cardinality is preserved: resolution labels, never drops.
    n_parts = len(out)
    from gas_data_pipeline_spark.catalog import table

    assert n_parts == table(spark, SF_DIR, "part").count()
