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
    hub_degree_threshold: int | None = None,
    hub_salts: int = 16,
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
    round i's plan is one join deep. ``checkpoint=False`` skips the
    per-round ``localCheckpoint`` (keeping the loop's logical plan
    inspectable for plan-shape tests); production always checkpoints —
    an un-truncated ``iters``-deep lineage re-executes every prior
    round per action.

    Hub skew: with plain hash-partitioning on ``src``, a web-scale hub
    (out-degree in the hundreds of millions) lands ALL its edges in
    one task of the per-round join. Setting ``hub_degree_threshold``
    pre-splits such hubs: edges whose source out-degree exceeds the
    threshold get a deterministic salt (``xxhash64(dst) mod
    hub_salts``) folded into the join key, and each round replicates
    ONLY the hub nodes' rank rows across the ``hub_salts`` sub-keys
    (non-hubs keep salt 0, one rank row). Contributions are
    rank/out_deg per edge and summing is associative, so the salted
    plan's answer is bit-identical to the unsalted one while the max
    task input drops from out_deg(hub) to out_deg(hub)/hub_salts. The
    hub set is computed once pre-loop and broadcast (it is tiny by
    definition — keys above a count threshold).
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
    salted = hub_degree_threshold is not None
    if salted and hub_salts < 2:
        raise ValueError("hub_salts must be >= 2 when salting is enabled")
    # repartition first so the odeg window reuses the co-partitioning
    # exchange instead of adding its own.
    e = e.repartition(loop_parts, "src").withColumn(
        "odeg", F.count(F.lit(1)).over(Window.partitionBy("src"))
    )
    if salted:
        e = e.withColumn(
            "__salt",
            F.when(
                F.col("odeg") > hub_degree_threshold,
                F.pmod(F.xxhash64("dst"), F.lit(hub_salts)),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        ).repartition(loop_parts, "src", "__salt")
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
    if salted:
        hubs = (
            e.filter(F.col("odeg") > hub_degree_threshold)
            .select(F.col("src").alias("node"))
            .distinct()
            .withColumn("__is_hub", F.lit(True))
        )
        if checkpoint:
            hubs = hubs.localCheckpoint(eager=True)

    # Loop state is the CONTRIBUTION table, not the rank table
    # (optimization r14, guide §2.4 — remove shuffles outright): a
    # node's rank is a pure function of its incoming contribution,
    # rank(u) = (1-d) + d * coalesce(contrib(u), 0) (round 1: every
    # rank is the 1.0 seed), so the per-round "materialize ranks for
    # ALL nodes" join against `nodes` is computable INSIDE the next
    # round's edge join instead of as its own join + exchange. One
    # round = one left equi-join (edges ⋈ contrib on src) + one
    # dst-sum — half the joins of the rank-state formulation (round 1
    # is a pure aggregate, no join at all). The rank expression is
    # evaluated identically, per source row, before the division by
    # odeg, so per-edge contributions are bit-identical to the
    # rank-state loop; only the dst-side summation order can differ,
    # which the callers' round(_, 6) grain absorbs (values are O(1) by
    # the N-scaled formulation). Nodes with no in-edges never appear
    # in contrib and fall out of the final left join at (1-d), exactly
    # as before.
    def _rank_of_src(c):
        return F.lit(1.0 - damping) + F.lit(damping) * F.coalesce(
            c, F.lit(0.0)
        )

    contrib = None
    for i in range(iters):
        if i == 0:
            # Every rank is the 1.0 seed: contributions need no join.
            joined = e.withColumn("rank", F.lit(1.0))
        else:
            cs = contrib.withColumnRenamed("node", "src")
            if salted:
                # Replicate ONLY hub contribution rows across the salt
                # range so the salted edge partitions each find their
                # (src, salt) match; non-hub rows ship once with salt 0.
                cs = (
                    cs.join(
                        F.broadcast(hubs.withColumnRenamed("node", "src")),
                        "src",
                        "left",
                    )
                    .select(
                        "src",
                        "contrib",
                        F.explode(
                            F.when(
                                F.col("__is_hub"),
                                F.sequence(F.lit(0), F.lit(hub_salts - 1)),
                            ).otherwise(F.array(F.lit(0)))
                        ).alias("__salt"),
                    )
                )
                join_keys = ["src", "__salt"]
            else:
                join_keys = ["src"]
            # LEFT join: a source absent from contrib (no in-edges)
            # still contributes at the teleport floor (1-d).
            joined = e.join(cs, join_keys, "left").withColumn(
                "rank", _rank_of_src(F.col("contrib"))
            )
        contrib = (
            joined.groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("odeg")).alias("contrib"))
            .withColumnRenamed("dst", "node")
        )
        if checkpoint:
            contrib = contrib.localCheckpoint(eager=True)
    if contrib is None:  # iters == 0: every node keeps the 1.0 seed
        return nodes.withColumn("rank", F.lit(1.0))
    return nodes.join(contrib, "node", "left").select(
        "node", _rank_of_src(F.col("contrib")).alias("rank")
    )
