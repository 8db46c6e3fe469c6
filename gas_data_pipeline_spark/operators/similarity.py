"""Vector similarity operators (SURVEY §2.11 X2): brute-force cosine
top-k as the exact baseline, random-hyperplane LSH bucketing as the
scale path.

Scale design: the brute-force path broadcasts the (small) query set so
the corpus never shuffles; dot products are JVM-side ``zip_with`` +
``aggregate`` folds in double precision (deterministic, matching a
sequential-fold oracle bit-for-bit). The LSH path replaces the
corpus×queries product with an equi-join on bucket signature —
candidates drop by ~2^bits, recall tunable via multi-probe (flip one
sign bit per probe).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double, sequential fold (bit-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact brute-force top-k neighbors per query vector.

    Returns (query_id, neighbor_id, rank, cos_sim). The query side is
    broadcast; ranking is a per-query window (top-k per partition key,
    not a global sort)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """X1 embedding-cosine near-dup: all pairs (a<b) above threshold.
    Exact O(N²) formulation — the correctness baseline the LSH path is
    tested against; at scale use rp_lsh_bucket first."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _projection_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (seeded — identical across
    driver restarts, so bucket assignments are reproducible)."""
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_planes, dim)).astype(float).tolist()


def rp_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit signature of ``n_planes``
    projections. Cosine-similar vectors collide with probability
    (1 - θ/π)^bits. Adds a ``bucket`` bigint column (narrow op)."""
    planes = _projection_planes(dim, n_planes, seed)
    sig = F.lit(0).cast("bigint")
    for p in planes:
        proj = dot(F.col(vec_col), F.array(*[F.lit(x) for x in p]))
        sig = sig * 2 + F.when(proj >= 0, 1).otherwise(0)
    return df.withColumn("bucket", sig)


def rp_lsh_tables(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_tables: int,
    n_planes: int,
    seed: int = 42,
) -> DataFrame:
    """Multi-table random-hyperplane LSH: ``n_tables`` independent
    sign-bit signatures of ``n_planes`` hyperplanes each. Each row fans
    out to ``n_tables`` (table, bucket) keys via ``explode`` — candidate
    recall is the union over tables: 1-(1-p^planes)^tables, the classic
    recall/cost dial (more tables → recall, more planes → selectivity).
    Narrow op (fan-out is linear, no shuffle)."""
    sigs = []
    for t in range(n_tables):
        planes = _projection_planes(dim, n_planes, seed + 1000 * t)
        sig = F.lit(0).cast("bigint")
        for p in planes:
            proj = dot(F.col(vec_col), F.array(*[F.lit(x) for x in p]))
            sig = sig * 2 + F.when(proj >= 0, 1).otherwise(0)
        sigs.append(
            F.struct(F.lit(t).alias("table"), sig.alias("bucket"))
        )
    return df.withColumn("tb", F.explode(F.array(*sigs))).select(
        "*", "tb.table", "tb.bucket"
    ).drop("tb")


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    n_tables: int = 8,
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates are rows sharing any (table,
    bucket) key with the query — an equi-join replaces the cross
    product, probing ~n_tables/2^n_planes of the corpus. Recall < 1 by
    design; tested against cosine_topk ground truth
    (tests/test_northstar.py)."""
    cb = rp_lsh_tables(corpus, vec_col, dim, n_tables, n_planes).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "table", "bucket"
    )
    qb = rp_lsh_tables(queries, vec_col, dim, n_tables, n_planes).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "table", "bucket"
    )
    pairs = (
        cb.join(F.broadcast(qb), ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "q_vec", "neighbor_id", "c_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
