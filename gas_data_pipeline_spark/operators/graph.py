"""Iterative graph analytics over edge DataFrames: fixed-iteration
PageRank (connected components lives in operators/dedup.py, where the
dedup pipeline consumes it).

Reference parity note: the reference has no graph engine — these are
engine extensions in the same spirit as the dedup clustering family,
serving corpus-curation jobs (entity/domain importance ranking for
sampling weights, link-graph quality priors) that a 100 TB training-
data pipeline runs next to dedup.

Scale design: each PageRank round is one equi-join (edges ⋈ ranks on
the source node) plus one sum-aggregate (on the destination node) —
the standard shuffle-friendly formulation. Edges are materialized and
co-partitioned on the join key ONCE before the loop so every round
reuses the same partitioning; ranks are checkpointed per round so
iteration i does not replay 1..i-1. No driver-side state beyond the
loop counter; convergence work is O(iters x |E|/parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list -> (node,
    rank), in the N-scaled formulation: ranks start at 1.0 and step to

        rank'(v) = (1 - d) + d * sum_{(u,v) in E} rank(u) / out_deg(u)

    (multiply by 1/N to recover the probability-normalized variant;
    the scaled form keeps values O(1), which also keeps the float
    error of the final round() far from rounding boundaries). Fixed
    iteration count — not a convergence test — so the result is a
    deterministic function of the graph, reproducible in plain SQL by
    unrolling the same number of rounds; nodes with no out-edges
    contribute nothing (standard leaked-mass simplification, same on
    both sides of the oracle).

    Scale shape: ``iters`` rounds of join-on-src + aggregate-on-dst.
    Edges and the out-degree table are checkpointed and co-partitioned
    on ``src`` once; each round shuffles only the (node, rank) pairs —
    |V|-sized, not |E|-sized. ``localCheckpoint`` truncates lineage so
    round i's plan is one join deep. For web-scale graphs swap the
    hash partitioning for range-partitioned ids so hub nodes spread
    (or pre-split hubs the way the salting helpers do); the loop body
    is unchanged. ``checkpoint=False`` skips the per-round
    ``localCheckpoint`` (keeping the loop's logical plan inspectable
    for plan-shape tests); production always checkpoints — an
    un-truncated ``iters``-deep lineage re-executes every prior round
    per action.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
    )
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    sc = edges.sparkSession.sparkContext
    n_edges = e.count()
    loop_parts = max(1, min(sc.defaultParallelism, n_edges // 100_000 + 1))
    # Attach each edge's source out-degree ONCE before the loop (a
    # window keyed on the join key adds no extra shuffle beyond the
    # co-partitioning repartition) — the loop body is then a single
    # join + aggregate per round, not a 3-way join. The contribution
    # stays rank/odeg, the oracle's exact expression.
    e = (
        e.repartition(loop_parts, "src")
        .withColumn(
            "odeg", F.count(F.lit(1)).over(Window.partitionBy("src"))
        )
    )
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(loop_parts, "node")
    )
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iters):
        contrib = (
            e.join(ranks.select(F.col("node").alias("src"), "rank"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("odeg")).alias("contrib"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
