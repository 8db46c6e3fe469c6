"""Vector similarity operators (SURVEY §2.11 X2): brute-force cosine
top-k as the exact baseline, random-hyperplane LSH bucketing as the
scale path.

Scale design — block-partitioned GEMM, the distributed dense-similarity
formulation:

- Vectors are packed into per-block matrix rows (``applyInPandas``:
  one row per block carrying ids + a flattened float64 matrix). A
  cross join of blocks (P² rows for near-dup, P rows vs one packed
  query block for top-k) moves each block ~2P times — versus the naive
  pair cross join that duplicates every vector once per PAIR (~N times).
  For 2M pairs of 64-dim vectors that's ~16 MB of Arrow traffic
  instead of ~2 GB.
- Each block pair scores with ONE `A @ B.T` — BLAS-rate, ~1000x the
  interpreted per-element HOF fold.
- Top-k emits only k rows per (query, corpus-block) map-side — the
  shuffle into the final per-query window is O(P·Q·k), never O(N·Q).
- Block count is the memory dial: pick P so a block matrix fits an
  executor's Arrow batch comfortably. At 100 TB brute-force all-pairs
  is not a thing regardless — LSH prunes first and these exact kernels
  verify candidates / score within buckets.

The expression-only ``dot``/``cosine`` remain for callers that need
bit-deterministic sequential folds (values agree to ~1e-12; the
driver compare rounds to 1e-6).

All pandas UDF / applyInPandas closures are factory-scoped and
self-contained so cloudpickle ships them by value — executors never
import this package.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd  # module-level: pandas_udf resolves string type hints here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_log = logging.getLogger(__name__)

BLOCK_SCHEMA = "block int, ids array<bigint>, mat array<double>, dim int"


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


def cosine_pairs_pandas() -> "Column":
    """Arrow-vectorized cosine over two array columns — for pair sets
    that are ALREADY pruned (e.g. LSH candidates), where per-pair
    vector duplication is affordable."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        va = np.stack(a.to_numpy()).astype(np.float64)
        vb = np.stack(b.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", va, vb)
        den = np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
        return pd.Series(num / den)

    return cos


def pack_blocks(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_blocks: int,
) -> DataFrame:
    """Pack (id, vector) rows into ``n_blocks`` matrix rows:
    ``(block, ids, row-major float64 mat, dim)``. Rows are sorted by id
    within a block so packing is deterministic. Block assignment hashes
    the id — stable and uniform; one shuffle on the block key."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("__id")
        mat = np.stack(pdf["__vec"].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                "block": [int(pdf["__block"].iloc[0])],
                "ids": [pdf["__id"].tolist()],
                "mat": [mat.ravel().tolist()],
                "dim": [mat.shape[1]],
            }
        )

    packed = df.select(
        F.col(id_col).cast("bigint").alias("__id"),
        F.col(vec_col).alias("__vec"),
        # pmod, not abs(hash)%n: abs(INT_MIN) throws under ANSI mode.
        F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks)).alias("__block"),
    )
    return packed.groupBy("__block").applyInPandas(pack, schema=BLOCK_SCHEMA)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_blocks: int = 16,
) -> DataFrame:
    """Exact brute-force top-k neighbors per query vector.

    Returns (query_id, neighbor_id, rank, cos_sim). The query set packs
    into ONE block row broadcast against corpus blocks; each pair
    scores with a single GEMM and emits only the per-block top-k, so
    the final window sees O(blocks · queries · k) rows."""
    cb = pack_blocks(corpus, id_col, vec_col, n_blocks)
    qb = pack_blocks(queries, id_col, vec_col, 1).select(
        F.col("ids").alias("q_ids"),
        F.col("mat").alias("q_mat"),
        F.col("dim").alias("q_dim"),
    )
    paired = cb.crossJoin(F.broadcast(qb))

    def score(batches):
        import numpy as np

        for pdf in batches:
            out = {"query_id": [], "neighbor_id": [], "cos_sim": []}
            for row in pdf.itertuples():
                dim = int(row.dim)
                A = np.asarray(row.mat, dtype=np.float64).reshape(-1, dim)
                Q = np.asarray(row.q_mat, dtype=np.float64).reshape(-1, dim)
                a_ids = np.asarray(row.ids, dtype=np.int64)
                q_ids = np.asarray(row.q_ids, dtype=np.int64)
                A = A / np.linalg.norm(A, axis=1, keepdims=True)
                Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
                S = Q @ A.T  # (queries, block_rows)
                S = np.where(q_ids[:, None] == a_ids[None, :], -np.inf, S)
                top = min(k, S.shape[1])
                # argpartition: O(n) per query for the block top-k.
                idx = np.argpartition(-S, top - 1, axis=1)[:, :top]
                for qi in range(S.shape[0]):
                    cols = idx[qi]
                    cols = cols[np.isfinite(S[qi, cols])]
                    out["query_id"].extend([q_ids[qi]] * len(cols))
                    out["neighbor_id"].extend(a_ids[cols].tolist())
                    out["cos_sim"].extend(S[qi, cols].tolist())
            yield pd.DataFrame(out)

    scored = paired.mapInPandas(
        score, schema="query_id bigint, neighbor_id bigint, cos_sim double"
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
    n_blocks: int = 8,
) -> DataFrame:
    """X1 embedding-cosine near-dup: all pairs (a<b) above threshold.

    Exact O(N²) *comparisons* — but via block-pair GEMM: P·(P+1)/2
    block pairs, one matrix multiply each, emitting only qualifying
    pairs. The correctness baseline the LSH path is tested against; at
    scale run LSH first and this kernel only within buckets."""
    blocks = pack_blocks(df, id_col, vec_col, n_blocks)
    a = blocks.select(
        F.col("block").alias("block_a"),
        F.col("ids").alias("ids_a"),
        F.col("mat").alias("mat_a"),
        "dim",
    )
    b = blocks.select(
        F.col("block").alias("block_b"),
        F.col("ids").alias("ids_b"),
        F.col("mat").alias("mat_b"),
        F.col("dim").alias("dim_b"),
    )
    # One task per block pair (see jaccard_pairs_bitset_gemm): AQE
    # coalesces the tiny-byte join output onto 1-2 tasks, serializing
    # the per-pair GEMMs; round-robin restores the fan-out.
    paired = a.join(b, F.col("block_a") <= F.col("block_b")).repartition(
        n_blocks * (n_blocks + 1) // 2
    )

    def score(batches):
        import numpy as np

        for pdf in batches:
            out = {"id_a": [], "id_b": [], "cos_sim": []}
            for row in pdf.itertuples():
                dim = int(row.dim)
                A = np.asarray(row.mat_a, dtype=np.float64).reshape(-1, dim)
                B = np.asarray(row.mat_b, dtype=np.float64).reshape(-1, dim)
                ia = np.asarray(row.ids_a, dtype=np.int64)
                ib = np.asarray(row.ids_b, dtype=np.int64)
                A = A / np.linalg.norm(A, axis=1, keepdims=True)
                B = B / np.linalg.norm(B, axis=1, keepdims=True)
                S = A @ B.T
                keep = S >= threshold
                if row.block_a == row.block_b:
                    # Diagonal block: both sides are the same set —
                    # dedup the unordered pair by id order here.
                    keep &= ia[:, None] < ib[None, :]
                r, c = np.nonzero(keep)
                left, right = ia[r], ib[c]
                # Off-diagonal pairs appear once (each unordered block
                # pair joins once) but in arbitrary id order —
                # canonicalize to id_a < id_b on emission.
                lo = np.minimum(left, right)
                hi = np.maximum(left, right)
                out["id_a"].extend(lo.tolist())
                out["id_b"].extend(hi.tolist())
                out["cos_sim"].extend(S[r, c].tolist())
            yield pd.DataFrame(out)

    return paired.mapInPandas(
        score, schema="id_a bigint, id_b bigint, cos_sim double"
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


def rp_lsh_table_buckets(
    dim: int,
    n_tables: int,
    n_planes: int,
    seed: int = 42,
):
    """Arrow-vectorized multi-table LSH signatures: vector in,
    ``array<bigint>`` of ``n_tables`` bucket ids out. All
    n_tables·n_planes projections happen in ONE GEMM per Arrow batch
    (vs n_tables·n_planes interpreted dot-product folds per row).
    Factory-scoped; ships by value."""
    from pyspark.sql.functions import pandas_udf

    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables * n_planes, dim))
    weights = (1 << np.arange(n_planes - 1, -1, -1, dtype=np.int64))

    @pandas_udf("array<bigint>")
    def buckets(vec: pd.Series) -> pd.Series:
        import numpy as np

        V = np.stack(vec.to_numpy()).astype(np.float64)  # (rows, dim)
        signs = (V @ planes.T) >= 0  # (rows, tables*planes)
        bits = signs.reshape(len(V), n_tables, n_planes).astype(np.int64)
        codes = (bits * weights).sum(axis=2)  # (rows, tables)
        return pd.Series(list(codes))

    return buckets


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
    out to ``n_tables`` (table, bucket) keys via ``posexplode`` —
    candidate recall is the union over tables: 1-(1-p^planes)^tables,
    the classic recall/cost dial (more tables → recall, more planes →
    selectivity). Narrow op (fan-out is linear, no shuffle)."""
    bucketer = rp_lsh_table_buckets(dim, n_tables, n_planes, seed)
    return df.select(
        "*", F.posexplode(bucketer(F.col(vec_col))).alias("table", "bucket")
    )


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
    # No forced broadcast of the probe side: AQE broadcasts it when
    # small and falls back to a (skew-splittable) shuffle join when the
    # query set is corpus-sized — no driver/executor memory ceiling.
    pairs = (
        cb.join(qb, ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "q_vec", "neighbor_id", "c_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = cosine_pairs_pandas()
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cos(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def sign_bucket(vec: Column, sign_bits: int) -> Column:
    """Deterministic LSH bucket: the sign pattern of the first
    ``sign_bits`` coordinates, as a BIGINT. Plain SQL on the stored
    floats — the portable (exact-oracle-able) twin of the
    engine-seeded random hyperplanes in ``rp_lsh_tables``."""
    bucket = F.lit(0)
    for i in range(sign_bits):
        bucket = bucket + F.when(vec[i] > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket.cast("bigint")


def cosine_topk_signed(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    sign_bits: int = 4,
) -> DataFrame:
    """Approximate top-k with a DETERMINISTIC sign-signature
    partitioner (the ANN counterpart of ``semantic_bucket_near_dup``):
    candidates are corpus rows sharing the query's bucket, scored with
    the exact sequential-fold cosine, per-query window top-k. Because
    the bucket function is plain SQL on the stored floats, the whole
    query replays in DuckDB — the exact-oracled member of the LSH ANN
    family (``cosine_topk_lsh`` keeps the better multi-table geometry
    but its engine-derived planes are rows-only checkable).

    Scale shape: one equi-join on bucket replaces the cross product
    (expected candidates N/2^sign_bits per query for centered data —
    raise ``sign_bits`` with corpus size); the query side stays
    AQE-broadcastable, the corpus never shuffles beyond the join.
    Misses neighbors across a sign boundary, as any single-bucket
    scheme does; recall vs the exact top-k is pinned in
    tests/test_northstar.py."""
    v = F.col(vec_col).cast("array<double>")
    dotf = lambda x, y: F.aggregate(  # noqa: E731 — oracle-ordered fold
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, z: acc + z
    )
    base = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        v.alias("cv"),
        sign_bucket(v, sign_bits).alias("bucket"),
    ).withColumn("cn", F.sqrt(dotf(F.col("cv"), F.col("cv"))))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        v.alias("qv"),
        sign_bucket(v, sign_bits).alias("q_bucket"),
    ).withColumn("qn", F.sqrt(dotf(F.col("qv"), F.col("qv"))))
    scored = (
        base.join(
            q,
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .withColumn(
            "cos_sim",
            dotf(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
        )
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def _kmeans_centroids(
    sample: np.ndarray, n_clusters: int, n_iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Seeded Lloyd k-means on a driver-side training sample
    (normalized vectors → spherical k-means). IVF practice: train on a
    bounded sample, assign the full corpus distributed — the sample is
    the only data that ever reaches the driver."""
    rng = np.random.default_rng(seed)
    X = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    C = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                C[c] = m / (np.linalg.norm(m) or 1.0)
    return C


# Above this many training vectors, Lloyd's loop moves off the driver:
# the numpy path materializes train_sample * dim float64 on one node
# (1e5 x 64 ≈ 50 MB — fine; 1e7 would not be), so bigger regimes train
# with pyspark.ml KMeans and only the k centroid vectors come back.
DRIVER_TRAIN_BOUND = 100_000


def _train_matrix(
    corpus: DataFrame, id_col: str, vec_col: str, train_sample: int
) -> np.ndarray:
    """Driver-regime training sample: the first ``train_sample`` rows
    by id (TakeOrderedAndProject — bounded collect), as a float64
    matrix. The standard FAISS-style train-on-a-sample regime."""
    pdf = (
        corpus.select(vec_col)
        .orderBy(F.col(id_col))
        .limit(train_sample)
        .toPandas()
    )
    return np.stack(pdf[vec_col].to_numpy()).astype(np.float64)


def _distributed_training_rows(
    corpus: DataFrame, id_col: str, vec_col: str, train_sample: int
) -> DataFrame:
    """Cluster-side training set of ~``train_sample`` rows: one ml
    Vector column ``__feat``, L2-normalized (spherical regime), chosen
    by a deterministic hash stride so the draw is seed-stable and no
    vector ever reaches the driver."""
    from pyspark.ml.feature import Normalizer
    from pyspark.ml.functions import array_to_vector

    n = corpus.count()
    rows = corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"))
    stride = max(1, n // max(1, train_sample))
    if stride > 1:
        rows = rows.filter(
            F.pmod(F.xxhash64(F.col("__id")), F.lit(stride)) == 0
        )
    vecs = rows.select(
        array_to_vector(F.col("__vec").cast("array<double>")).alias("__mlvec")
    )
    return Normalizer(inputCol="__mlvec", outputCol="__feat", p=2.0).transform(
        vecs
    )


def _kmeans_centroids_distributed(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int,
    train_sample: int,
    seed: int = 42,
    n_iters: int = 10,
    train: DataFrame | None = None,
) -> np.ndarray:
    """Large-regime centroid training: ``pyspark.ml.clustering.KMeans``
    (k-means|| init, seeded) over the hash-strided normalized training
    set. Only the (k, dim) centroid matrix returns to the driver;
    centroids re-normalize to the unit sphere so assignment stays the
    same max-dot-product the numpy path uses. ``train`` lets a caller
    that also trains PQ codebooks (IVF+PQ) pass ONE shared — ideally
    cached — training frame instead of re-deriving it."""
    from pyspark.ml.clustering import KMeans

    own = train is None
    if own:
        # Cache: k-means|| init + n_iters Lloyd steps each re-read the
        # training rows; uncached that is a corpus re-scan per pass.
        train = _distributed_training_rows(
            corpus, id_col, vec_col, train_sample
        ).cache()
    try:
        model = KMeans(
            k=n_clusters, seed=seed, maxIter=n_iters, featuresCol="__feat"
        ).fit(train)
    finally:
        if own:
            train.unpersist()
    C = np.stack([np.asarray(c, dtype=np.float64) for c in model.clusterCenters()])
    return C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)


def _pq_codebooks_distributed(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    n_codes: int,
    train_sample: int,
    seed: int = 42,
    n_iters: int = 15,
    train: DataFrame | None = None,
) -> np.ndarray:
    """Large-regime PQ codebooks: one distributed L2 KMeans per
    subspace over slices of the (full-vector-)normalized training set —
    the same objective as ``train_pq_codebooks``, with the Lloyd loop
    on the cluster. The training set is cached once and re-sliced m
    times; only m*(n_codes, dim/m) codebook floats reach the driver.
    ``train``: optional shared training frame, as in
    ``_kmeans_centroids_distributed``."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    if train is None:
        train = _distributed_training_rows(corpus, id_col, vec_col, train_sample)
    train = train.select(vector_to_array(F.col("__feat")).alias("__arr"))
    train = train.cache()
    try:
        d = train.select(F.size("__arr").alias("d")).first()["d"]
        assert d % m == 0, f"dim {d} not divisible into {m} subvectors"
        dsub = d // m
        books = np.empty((m, n_codes, dsub))
        for j in range(m):
            sub = train.select(
                array_to_vector(
                    F.slice(F.col("__arr"), j * dsub + 1, dsub)
                ).alias("__f")
            )
            model = KMeans(
                k=n_codes, seed=seed + j, maxIter=n_iters, featuresCol="__f"
            ).fit(sub)
            C = np.stack(
                [np.asarray(c, dtype=np.float64) for c in model.clusterCenters()]
            )
            books[j, : len(C)] = C
            if len(C) < n_codes:  # degenerate tiny train set: pad
                books[j, len(C) :] = C[0]
        return books
    finally:
        train.unpersist()


def ivf_centroids_for(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int,
    train_sample: int,
    seed: int = 42,
    driver_train_bound: int = DRIVER_TRAIN_BOUND,
) -> np.ndarray:
    """Route IVF centroid training by regime (VERDICT r3 #6): numpy
    Lloyd on a bounded driver sample below ``driver_train_bound``,
    distributed ml KMeans above it. Path choice is logged."""
    if train_sample <= driver_train_bound:
        _log.info(
            "IVF centroids: driver numpy path (train_sample=%d <= bound=%d)",
            train_sample,
            driver_train_bound,
        )
        return _kmeans_centroids(
            _train_matrix(corpus, id_col, vec_col, train_sample),
            n_clusters,
            seed=seed,
        )
    _log.info(
        "IVF centroids: distributed ml.KMeans path (train_sample=%d > bound=%d)",
        train_sample,
        driver_train_bound,
    )
    return _kmeans_centroids_distributed(
        corpus, id_col, vec_col, n_clusters, train_sample, seed=seed
    )


def pq_codebooks_for(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    n_codes: int,
    train_sample: int,
    seed: int = 42,
    driver_train_bound: int = DRIVER_TRAIN_BOUND,
) -> np.ndarray:
    """Route PQ codebook training by regime — see ivf_centroids_for."""
    if train_sample <= driver_train_bound:
        _log.info(
            "PQ codebooks: driver numpy path (train_sample=%d <= bound=%d)",
            train_sample,
            driver_train_bound,
        )
        return train_pq_codebooks(
            _train_matrix(corpus, id_col, vec_col, train_sample),
            m=m,
            n_codes=n_codes,
            seed=seed,
        )
    _log.info(
        "PQ codebooks: distributed ml.KMeans path (train_sample=%d > bound=%d)",
        train_sample,
        driver_train_bound,
    )
    return _pq_codebooks_distributed(
        corpus, id_col, vec_col, m, n_codes, train_sample, seed=seed
    )


def ivf_assign_udf(centroids: np.ndarray, n_probe: int = 1):
    """Arrow-vectorized IVF cluster assignment: vector in,
    array<int> of the ``n_probe`` nearest centroid ids out (one GEMM
    per batch). Factory-scoped; ships by value with the centroid
    matrix embedded — executors never import this package."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("array<int>")
    def probe(vec: pd.Series) -> pd.Series:
        import numpy as np

        V = np.stack(vec.to_numpy()).astype(np.float64)
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = V @ C.T
        top = np.argsort(-S, axis=1)[:, :n_probe]
        return pd.Series([row.tolist() for row in top])

    return probe


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    train_sample: int = 4096,
    seed: int = 42,
    driver_train_bound: int = DRIVER_TRAIN_BOUND,
) -> DataFrame:
    """X2 IVF (inverted-file) ANN: corpus rows are bucketed by nearest
    k-means centroid; each query probes its ``n_probe`` nearest
    centroids' lists — an equi-join on cluster id replaces the cross
    product, scanning ~n_probe/n_clusters of the corpus. The
    complementary scale path to LSH (data-adapted partitions vs
    oblivious hyperplanes); recall vs the exact top-k asserted in
    tests/test_northstar.py. Training routes by regime: driver numpy
    below ``driver_train_bound``, distributed ml.KMeans above.
    """
    centroids = ivf_centroids_for(
        corpus,
        id_col,
        vec_col,
        n_clusters,
        train_sample,
        seed=seed,
        driver_train_bound=driver_train_bound,
    )

    assign1 = ivf_assign_udf(centroids, n_probe=1)
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cluster"),
    )
    probe_n = ivf_assign_udf(centroids, n_probe=n_probe)
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probe_n(F.col(vec_col))).alias("cluster"),
    )
    # AQE picks broadcast for bounded probe sets; no forced hint (see
    # cosine_topk_lsh note).
    pairs = cb.join(qb, "cluster").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = cosine_pairs_pandas()
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cos(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def probe_cells(
    queries: DataFrame,
    centers: list[dict],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    n_probe: int = 4,
    driver_probe_bound: int = 1024,
    quantum: float = 1e6,
) -> DataFrame:
    """Route each query to its ``n_probe`` nearest coarse-quantizer
    cells (fixed-point argmin, ties to the smaller center id — the
    array_sort struct convention). Threshold-gated like the dedup
    union-find: a query batch within ``driver_probe_bound`` rows is
    collected once and probed driver-side with the numpy fixed-point
    kernel (``selection._fp_halfup`` — bit-identical to the
    expression path, pinned in tests), skipping a whole Spark job; a
    larger query table takes the distributed expression path. The
    caller's ``quantum`` threads through BOTH paths (ADVICE r9: a
    hardcoded 1e6 here would quantize probes and corpus differently
    under a non-default quantum), and the driver-path schema carries
    the input's own id type rather than assuming bigint. Returns
    (query_id, qv, center_id) rows — one per probed cell."""
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    from gas_data_pipeline_spark.operators.selection import (
        _fp_halfup,
        center_cands_sql,
    )

    qpts = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    qrows = qpts.limit(driver_probe_bound + 1).collect()
    if len(qrows) <= driver_probe_bound:
        import numpy as np

        cmat = np.array([c["vec"] for c in centers], dtype="float64")
        cids = [int(c["id"]) for c in centers]
        probe_rows = []
        for r in qrows:
            qv = list(r["qv"])
            d = np.asarray(qv, dtype="float64") - cmat
            sq = _fp_halfup(d * d * quantum).sum(axis=1)
            order = sorted(range(len(cids)), key=lambda i: (sq[i], cids[i]))
            for i in order[:n_probe]:
                probe_rows.append((r["query_id"], qv, cids[i]))
        return queries.sparkSession.createDataFrame(
            probe_rows,
            StructType(
                [
                    StructField("query_id", qpts.schema["query_id"].dataType),
                    StructField("qv", ArrayType(DoubleType())),
                    StructField("center_id", LongType()),
                ]
            ),
        )
    probe_structs = F.expr(center_cands_sql("qv", centers, quantum))
    return qpts.select(
        "query_id",
        "qv",
        F.explode(
            F.transform(
                F.slice(F.array_sort(probe_structs), 1, n_probe),
                lambda s: s["center_id"],
            )
        ).alias("center_id"),
    )


def build_ivf_kcenter_index(
    corpus: DataFrame,
    centers: list[dict],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF inverted lists: every corpus vector routed to its
    nearest k-center cell (zero-shuffle scan, fixed-point argmin) with
    the vector riding along for exact rescoring. This is the INDEX —
    build it once, search it many times (FAISS's build/search split);
    at 100 TB it would persist as cell-partitioned parquet, here
    callers localCheckpoint it per session. Single-file test inputs
    spread across cores first (`selection.spread_small_scan`)."""
    from gas_data_pipeline_spark.operators.selection import (
        assign_to_centers,
        spread_small_scan,
    )

    pts = spread_small_scan(
        corpus.select(
            F.col(id_col).alias("pid"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
                "v"
            ),
        )
    )
    return assign_to_centers(pts, centers, payload_cols=("v",))


def cosine_topk_ivf_kcenter(
    corpus: DataFrame,
    queries: DataFrame,
    centers: list[dict],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 4,
    driver_probe_bound: int = 1024,
    index: DataFrame | None = None,
) -> DataFrame:
    """X2 IVF ANN with a DETERMINISTIC coarse quantizer: the inverted
    lists come from a greedy k-center codebook (``centers`` as built by
    ``operators/selection.kcenter_greedy`` — same Voronoi routing role
    as IVF's k-means, but exactly replayable in SQL), so the WHOLE
    index pipeline — train, assign, probe, candidate join, exact
    rescoring — is value-oracle-able, the ``dedup_semantic_buckets``
    device applied to the IVF family (the k-means path stays in
    ``cosine_topk_ivf`` / ``cosine_topk_ivfpq``).

    Scale shape identical to the k-means IVF: corpus assignment is a
    zero-shuffle scan against the broadcast center structs
    (fixed-point argmin — engine-exact ties), each query explodes to
    its ``n_probe`` nearest cells by the same fixed-point distance,
    and a cells-keyed equi-join with the broadcast probe set replaces
    the cross product (~n_probe/n_clusters of the corpus scanned per
    query). Candidate cosine is the sequential-fold :func:`cosine` —
    bit-deterministic, matching DuckDB's ``list_dot_product``.

    Query routing is threshold-gated like the dedup union-find: a
    query set within ``driver_probe_bound`` rows (the common ANN
    shape — queries are a bounded batch, the corpus is the big side)
    is collected once and probed driver-side with the numpy
    fixed-point kernel (``selection._fp_halfup`` — bit-identical to
    the expression path, pinned in tests/test_northstar.py), skipping
    a whole Spark job; a larger query table takes the distributed
    expression path. Both paths produce identical probe sets.

    Pass ``index`` (a :func:`build_ivf_kcenter_index` result) to skip
    re-assigning the corpus: the inverted lists are the INDEX, built
    once and amortized across query batches — every production ANN
    system's build-vs-search split."""
    assigned = (
        index
        if index is not None
        else build_ivf_kcenter_index(corpus, centers, id_col, vec_col)
    )
    qprobe = probe_cells(
        queries,
        centers,
        id_col,
        vec_col,
        n_probe=n_probe,
        driver_probe_bound=driver_probe_bound,
    )
    pairs = assigned.join(F.broadcast(qprobe), "center_id").filter(
        F.col("pid") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        F.col("pid").alias("neighbor_id"),
        cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def pq_kcenter_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    m: int = 8,
    n_codes: int = 8,
    quantum: float = 1e6,
) -> list[list[list[float]]]:
    """DETERMINISTIC product-quantization codebooks: per subspace, a
    greedy k-center codebook over the L2-NORMALIZED subvectors — the
    ``dedup_semantic_buckets`` / ``cosine_topk_ivf_kcenter`` device
    applied to PQ, so the codebooks (and therefore the codes and every
    ADC score) are exactly replayable as SQL (the k-means trainer
    stays in :func:`train_pq_codebooks` for the throughput path).

    Distributed shape: all ``m`` subspaces train SIMULTANEOUSLY — per
    round ONE job computes every subspace's farthest point (an
    m-expression aggregate of (mind, -pid, subvec) structs, max
    ignoring already-chosen rows via when()), so the whole training is
    ``n_codes - 1`` scan+aggregate passes regardless of m; the
    returned books are m x n_codes x (dim/m) Python floats — a model,
    not data. Selection ties break (mind DESC, pid ASC), the oracle's
    ORDER BY mind DESC, vec_id."""
    from gas_data_pipeline_spark.functions.exprs import bind
    from gas_data_pipeline_spark.operators.selection import sq_dist_fp

    dim = len(corpus.select(vec_col).first()[0])
    assert dim % m == 0, f"dim {dim} not divisible into {m} subvectors"
    dsub = dim // m

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nv = bind(v, lambda vv: F.transform(vv, lambda x: x / F.sqrt(dot(vv, vv))))
    pts = corpus.select(F.col(id_col).alias("pid"), nv.alias("nv"))

    def sub(j: int) -> Column:
        return F.slice(F.col("nv"), j * dsub + 1, dsub)

    seed = pts.orderBy("pid").limit(1).collect()[0]
    seed_nv = [float(x) for x in seed["nv"]]
    books: list[list[list[float]]] = [
        [seed_nv[j * dsub : (j + 1) * dsub]] for j in range(m)
    ]
    chosen: list[list] = [[seed["pid"]] for _ in range(m)]
    state = pts.select(
        "pid",
        "nv",
        *[
            sq_dist_fp(sub(j), books[j][0], quantum).alias(f"mind_{j}")
            for j in range(m)
        ],
    )
    for step in range(1, n_codes):
        far = state.select(
            *[
                F.max(
                    F.when(
                        ~F.col("pid").isin(chosen[j]),
                        F.struct(
                            F.col(f"mind_{j}").alias("mind"),
                            (-F.col("pid")).alias("negpid"),
                            sub(j).alias("sv"),
                        ),
                    )
                ).alias(f"far_{j}")
                for j in range(m)
            ]
        ).collect()[0]
        for j in range(m):
            fj = far[f"far_{j}"]
            if fj is None:  # fewer distinct points than codes
                continue
            chosen[j].append(-fj["negpid"])
            books[j].append([float(x) for x in fj["sv"]])
        state = state.select(
            "pid",
            "nv",
            *[
                F.least(
                    F.col(f"mind_{j}"),
                    sq_dist_fp(sub(j), books[j][-1], quantum),
                ).alias(f"mind_{j}")
                for j in range(m)
            ],
        )
        if step % 4 == 0:
            state = state.localCheckpoint(eager=False)
    return books


def pq_kcenter_codebooks_sampled(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    m: int = 8,
    n_codes: int = 8,
    quantum: float = 1e6,
    sample_n: int | None = None,
    seed: str | None = None,
) -> list[list[list[float]]]:
    """:func:`pq_kcenter_codebooks` trained on the bounded
    deterministic sample (``operators/selection.kcenter_train_sample``
    device — the sample_n smallest md5(seed:id) draws): ONE Spark job
    collects the L2-normalized sample (normalization computed IN
    SPARK, the sequential fold both engines share), then every
    subspace's greedy k-center runs driver-side in numpy with the
    identical fixed-point arithmetic and tie-breaks. Replaces the
    n_codes-1 sequential full-corpus scan+aggregate rounds — at
    100 TB, codebook training must not scale with the corpus; the
    bounded sample makes it constant-cost and still exactly
    replayable as a per-subspace recursive CTE over the same sample.
    When the corpus has ≤ sample_n rows the result is identical to
    the full trainer (pinned in tests/test_northstar.py)."""
    from gas_data_pipeline_spark.functions.exprs import bind
    from gas_data_pipeline_spark.operators.selection import (
        KC_SAMPLE_N,
        KC_SAMPLE_SEED,
        kcenter_greedy_local,
    )

    sample_n = KC_SAMPLE_N if sample_n is None else sample_n
    seed = KC_SAMPLE_SEED if seed is None else seed
    if not (1 <= sample_n <= 1_000_000):
        # same bounded-collect guard as kcenter_train_sample
        raise ValueError(f"training sample must be 1..1e6 rows, got {sample_n=}")
    dim = len(corpus.select(vec_col).first()[0])
    assert dim % m == 0, f"dim {dim} not divisible into {m} subvectors"
    dsub = dim // m

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nv = bind(v, lambda vv: F.transform(vv, lambda x: x / F.sqrt(dot(vv, vv))))
    key = F.md5(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    )
    rows = (
        corpus.select(
            F.col(id_col).alias("pid"), nv.alias("nv"), key.alias("__draw")
        )
        .orderBy("__draw")
        .limit(sample_n)
        .select("pid", "nv")
        .collect()
    )
    sample = [(r["pid"], list(r["nv"])) for r in rows]
    books: list[list[list[float]]] = []
    for j in range(m):
        sub_sample = [
            (pid, vec[j * dsub : (j + 1) * dsub]) for pid, vec in sample
        ]
        centers = kcenter_greedy_local(sub_sample, k=n_codes, quantum=quantum)
        books.append([c["vec"] for c in centers])
    return books


def _pq_codes_sql(
    books: list[list[list[float]]], quantum: float = 1e6
) -> str:
    """The m-subspace PQ encoder as ONE generated SQL expression over
    a normalized-vector column named ``nv``: per subspace, fixed-point
    argmin over the codeword literals (ties to the earlier-selected
    code — selection order, both engines)."""
    from gas_data_pipeline_spark.operators.selection import sq_dist_fp_sql

    m = len(books)
    dsub = len(books[0][0])

    def code_sql(j: int) -> str:
        sub = f"slice(nv, {j * dsub + 1}, {dsub})"
        cands = "array(" + ",".join(
            f"named_struct('sq_fp', {sq_dist_fp_sql(sub, cw, quantum)}, "
            f"'code', {c})"
            for c, cw in enumerate(books[j])
        ) + ")"
        return f"element_at(array_sort({cands}), 1).code"

    return "array(" + ",".join(code_sql(j) for j in range(m)) + ")"


def build_pq_codes(
    corpus: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantum: float = 1e6,
) -> DataFrame:
    """The PQ compressed store: every corpus vector encoded as its m
    per-subspace fixed-point-argmin code ids (ties to the
    earlier-selected code — selection order, both engines). This is
    the 100 TB compression pass — 64 floats become m bytes — and like
    the IVF inverted lists it is an INDEX: build once, search many
    times; callers localCheckpoint it per session (at scale it
    persists as parquet). Encoders are generated SQL (one parse per
    subspace, :func:`_pq_codes_sql`); single-file test inputs spread
    across cores first."""
    from gas_data_pipeline_spark.functions.exprs import bind
    from gas_data_pipeline_spark.operators.selection import (
        spread_small_scan,
    )

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nv = bind(v, lambda vv: F.transform(vv, lambda x: x / F.sqrt(dot(vv, vv))))
    return spread_small_scan(
        corpus.select(F.col(id_col).alias("neighbor_id"), nv.alias("nv"))
    ).select("neighbor_id", F.expr(_pq_codes_sql(books, quantum)).alias("codes"))


def cosine_topk_pq_kcenter(
    corpus: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    quantum: float = 1e6,
    codes: DataFrame | None = None,
    rescore: int | None = None,
) -> DataFrame:
    """X2 PQ ANN with asymmetric distance over DETERMINISTIC codebooks
    (:func:`pq_kcenter_codebooks`) — fully native expressions, fully
    value-oracle-able: corpus rows encode per subspace by fixed-point
    argmin over the codeword literals (ties to the earlier-selected
    code), each (query, row) ADC score is the integer sum of the m
    per-subspace quantized dot products ``round(<q_sub, codeword>
    * 1e6)``, and ranking orders by that integer (quantized PQ scores
    collide OFTEN — integer ties break by neighbor_id identically in
    both engines, where a float rank could not be trusted).

    Scale shape: encoding is a zero-shuffle scan against codeword
    literals (the 100 TB compression pass); scoring joins the
    broadcast query set against the encoded scan — the classic PQ
    full-scan, composable with IVF pruning; the window sees only
    corpus x queries candidate rows. Both the per-subspace encoders
    and the ADC terms are generated SQL (`selection.dlit` /
    `sq_dist_fp_sql`), so plan construction costs m parses instead
    of O(m x n_codes x dsub) py4j calls, and the test-scale
    single-file corpus scan spreads across cores
    (`selection.spread_small_scan`). Pass ``codes`` (a
    :func:`build_pq_codes` result) to skip re-encoding the corpus —
    the compressed store is the index, amortized across query
    batches.

    ``rescore`` (VERDICT r13 #6) adds the standard PQ refinement
    stage: ADC ranks a BOUNDED candidate pool (``rescore`` rows per
    query), then only those rows are re-scored with the EXACT
    fixed-point cosine against their full vectors and re-ranked. The
    pool is |Q|·rescore rows — broadcast back over ONE more corpus
    scan (no second cross product) — so the coarse quantizer's weak
    raw recall lifts toward the exact scan's answer on everything
    the ADC pool catches, at a bounded, corpus-size-independent
    extra cost. The score column becomes ``cos_sim`` (it IS the
    exact cosine then), matching the IVF family's output shape."""
    from gas_data_pipeline_spark.functions.exprs import bind
    from gas_data_pipeline_spark.operators.selection import dlit

    m = len(books)
    dsub = len(books[0][0])

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nv = bind(v, lambda vv: F.transform(vv, lambda x: x / F.sqrt(dot(vv, vv))))

    def sub_sql(col: str, j: int) -> str:
        return f"slice({col}, {j * dsub + 1}, {dsub})"

    encoded = (
        codes
        if codes is not None
        else build_pq_codes(corpus, books, id_col, vec_col, quantum)
    )
    qdf = queries.select(
        F.col(id_col).alias("query_id"), nv.alias("qv")
    )

    def adc_sql(j: int) -> str:
        # codeword picked at runtime by the row's j-th code id.
        book_lit = "array(" + ",".join(
            "array(" + ",".join(dlit(x) for x in cw) + ")"
            for cw in books[j]
        ) + ")"
        cw = f"element_at({book_lit}, element_at(codes, {j + 1}) + 1)"
        d = (
            f"aggregate(zip_with({sub_sql('qv', j)}, {cw}, "
            f"(a, b) -> a * b), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        return f"CAST(round({d} * {dlit(quantum)}, 0) AS BIGINT)"

    s_fp = F.expr(" + ".join(adc_sql(j) for j in range(m)))
    pairs = encoded.crossJoin(F.broadcast(qdf)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.select("query_id", "neighbor_id", s_fp.alias("s_fp"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("s_fp").desc(), F.col("neighbor_id")
    )
    if rescore is None:
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                "rank",
                F.round(F.col("s_fp") / F.lit(quantum), 6).alias("approx_cos"),
            )
        )
    # Refinement: the ADC pool (top ``rescore`` per query) joins its
    # FULL vectors back in — candidates are |Q|·rescore rows, so they
    # broadcast into one corpus scan; the exact cosine is the same
    # sequential-fold fixed point the IVF family uses (bit-identical
    # to DuckDB's list_dot_product, so the stage value-oracles).
    cands = (
        scored.withColumn("adc_rank", F.row_number().over(w))
        .filter(F.col("adc_rank") <= rescore)
        .select("query_id", "neighbor_id")
    )
    corp_nv = corpus.select(F.col(id_col).alias("neighbor_id"), nv.alias("nv"))
    refined = corp_nv.join(
        F.broadcast(cands.join(qdf, "query_id")), "neighbor_id"
    ).select(
        "query_id",
        "neighbor_id",
        F.round(dot(F.col("qv"), F.col("nv")) * F.lit(quantum), 0)
        .cast("bigint")
        .alias("e_fp"),
    )
    w_ex = Window.partitionBy("query_id").orderBy(
        F.col("e_fp").desc(), F.col("neighbor_id")
    )
    return (
        refined.withColumn("rank", F.row_number().over(w_ex).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("e_fp") / F.lit(quantum), 6).alias("cos_sim"),
        )
    )


def build_ivfpq_kcenter_index(
    corpus: DataFrame,
    centers: list[dict],
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantum: float = 1e6,
) -> DataFrame:
    """The composed IVF+PQ index, the FAISS production layout: PQ
    codes stored INSIDE the inverted lists — (neighbor_id, center_id,
    codes). Cell routing and code encoding are BOTH row-wise
    functions of the vector, so the index is ONE zero-shuffle scan —
    never a corpus×corpus join of separately-built parts (at 100 TB
    this persists as cell-partitioned parquet of m-byte codes; the
    raw vectors never need to be read at search time)."""
    from gas_data_pipeline_spark.functions.exprs import bind
    from gas_data_pipeline_spark.operators.selection import (
        center_cands_sql,
        spread_small_scan,
    )

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nv = bind(v, lambda vv: F.transform(vv, lambda x: x / F.sqrt(dot(vv, vv))))
    pts = spread_small_scan(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), v.alias("v"), nv.alias("nv")
        )
    )
    best = F.element_at(
        F.array_sort(F.expr(center_cands_sql("v", centers, quantum))), 1
    )
    return pts.select(
        "neighbor_id",
        best["center_id"].alias("center_id"),
        F.expr(_pq_codes_sql(books, quantum)).alias("codes"),
    )


def cosine_topk_ivfpq_kcenter(
    corpus: DataFrame,
    queries: DataFrame,
    centers: list[dict],
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 4,
    quantum: float = 1e6,
    driver_probe_bound: int = 1024,
    index: DataFrame | None = None,
    rescore: int | None = None,
) -> DataFrame:
    """X2 composed IVF+PQ with DETERMINISTIC k-center quantizers at
    BOTH levels — the production FAISS shape (IVF prunes which
    inverted lists a query scans; PQ makes scanning a list cost m
    integer table lookups per row), now fully VALUE-ORACLE-ABLE: the
    coarse router is the raw-vector k-center codebook `ann_ivf` uses,
    the fine quantizer the normalized-subvector codebooks `ann_pq`
    uses, candidates come from the cells-keyed equi-join, and each
    candidate's ADC score is the integer sum of m quantized subspace
    dot products — quantized scores collide often, and integer ties
    break by neighbor_id identically in both engines. (The k-means
    throughput variant stays in :func:`cosine_topk_ivfpq`.)

    Scale shape: probe (bounded driver batch or distributed argmin)
    -> broadcast probe set ⋈ the code-carrying inverted lists
    (~n_probe/n_cells of the compressed corpus per query) -> ADC
    expressions against the broadcast query subvectors -> per-query
    top-k window over candidate rows only.

    ``rescore`` applies the same exact-refinement stage as
    :func:`cosine_topk_pq_kcenter`: the ADC ranking keeps a bounded
    ``rescore``-candidate pool per query, whose FULL vectors are
    fetched in one broadcast-candidates corpus scan and re-scored
    with exact fixed-point cosine — FAISS's refine step on top of
    IVF+PQ. Output column becomes ``cos_sim`` (the score IS exact)."""
    from gas_data_pipeline_spark.functions.exprs import bind
    from gas_data_pipeline_spark.operators.selection import dlit

    m = len(books)
    dsub = len(books[0][0])
    idx = (
        index
        if index is not None
        else build_ivfpq_kcenter_index(
            corpus, centers, books, id_col, vec_col, quantum
        )
    )
    qprobe = probe_cells(
        queries,
        centers,
        id_col,
        vec_col,
        n_probe=n_probe,
        driver_probe_bound=driver_probe_bound,
        quantum=quantum,
    ).select("query_id", "center_id")
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nv = bind(v, lambda vv: F.transform(vv, lambda x: x / F.sqrt(dot(vv, vv))))
    qdf = queries.select(F.col(id_col).alias("query_id"), nv.alias("qv"))

    def adc_sql(j: int) -> str:
        book_lit = "array(" + ",".join(
            "array(" + ",".join(dlit(x) for x in cw) + ")"
            for cw in books[j]
        ) + ")"
        cw = f"element_at({book_lit}, element_at(codes, {j + 1}) + 1)"
        d = (
            f"aggregate(zip_with(slice(qv, {j * dsub + 1}, {dsub}), {cw}, "
            f"(a, b) -> a * b), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        return f"CAST(round({d} * {dlit(quantum)}, 0) AS BIGINT)"

    cand = idx.join(F.broadcast(qprobe), "center_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.join(F.broadcast(qdf), "query_id").select(
        "query_id",
        "neighbor_id",
        F.expr(" + ".join(adc_sql(j) for j in range(m))).alias("s_fp"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("s_fp").desc(), F.col("neighbor_id")
    )
    if rescore is None:
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                "rank",
                F.round(F.col("s_fp") / F.lit(quantum), 6).alias("approx_cos"),
            )
        )
    cands = (
        scored.withColumn("adc_rank", F.row_number().over(w))
        .filter(F.col("adc_rank") <= rescore)
        .select("query_id", "neighbor_id")
    )
    corp_nv = corpus.select(F.col(id_col).alias("neighbor_id"), nv.alias("nv"))
    refined = corp_nv.join(
        F.broadcast(cands.join(qdf, "query_id")), "neighbor_id"
    ).select(
        "query_id",
        "neighbor_id",
        F.round(dot(F.col("qv"), F.col("nv")) * F.lit(quantum), 0)
        .cast("bigint")
        .alias("e_fp"),
    )
    w_ex = Window.partitionBy("query_id").orderBy(
        F.col("e_fp").desc(), F.col("neighbor_id")
    )
    return (
        refined.withColumn("rank", F.row_number().over(w_ex).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("e_fp") / F.lit(quantum), 6).alias("cos_sim"),
        )
    )


def train_pq_codebooks(
    sample: np.ndarray, m: int = 8, n_codes: int = 32, n_iters: int = 15, seed: int = 42
) -> np.ndarray:
    """Product-quantization codebooks: split the (normalized) vector
    space into ``m`` orthogonal subspaces and run seeded L2 k-means in
    each. Returns (m, n_codes, dim/m). Like IVF centroids, the training
    sample is a bounded stats object — the only vectors that ever
    reach the driver."""
    d = sample.shape[1]
    assert d % m == 0, f"dim {d} not divisible into {m} subvectors"
    dsub = d // m
    X = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_codes, dsub))
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[rng.choice(len(S), size=min(n_codes, len(S)), replace=False)]
        for _ in range(n_iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(C)):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[j, : len(C)] = C
        if len(C) < n_codes:  # degenerate tiny sample: pad with repeats
            books[j, len(C):] = C[0]
    return books


def pq_encode_udf(codebooks: np.ndarray):
    """Arrow-vectorized PQ encoder: vector in, array<int> of ``m``
    code ids out (argmin L2 per subspace over the normalized vector).
    At 100 TB this is the compression pass — 64 float32 dims become 8
    bytes — and it runs once, distributed, with the codebooks shipped
    by value in the closure."""
    from pyspark.sql.functions import pandas_udf

    B = np.asarray(codebooks, dtype=np.float64)

    @pandas_udf("array<int>")
    def encode(vec: pd.Series) -> pd.Series:
        import numpy as np

        m, n_codes, dsub = B.shape
        V = np.stack(vec.to_numpy()).astype(np.float64)
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        codes = np.empty((len(V), m), dtype=np.int64)
        for j in range(m):
            S = V[:, j * dsub : (j + 1) * dsub]
            # ||s - c||^2 = ||s||^2 - 2 s.c + ||c||^2 -> argmin over c
            d2 = (S**2).sum(1, keepdims=True) - 2 * (S @ B[j].T) + (B[j] ** 2).sum(1)
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.Series([row.tolist() for row in codes])

    return encode


def cosine_topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    m: int = 8,
    n_codes: int = 32,
    train_sample: int = 4096,
    seed: int = 42,
    n_blocks: int = 16,
    n_query_blocks: int = 1,
    driver_train_bound: int = DRIVER_TRAIN_BOUND,
) -> DataFrame:
    """X2 product-quantization ANN with asymmetric distance (ADC):
    corpus vectors are stored only as ``m`` byte-sized code ids; each
    query precomputes an (m x n_codes) lookup table of subspace dot
    products, and a corpus row's approximate cosine is m table lookups
    — no float vectors are ever read at scan time. This is the
    compressed-storage scale path (IVF prunes WHAT you scan; PQ
    shrinks what a scan COSTS — 32x smaller vectors, cache-resident
    tables), composable with IVF in a real deployment.

    Scale shape: codebook training is a bounded driver-side sample —
    the ONLY vectors that ever reach the driver. Corpus encoding is
    one distributed Arrow pass. Both sides then block-pack (corpus
    codes into ``n_blocks`` code-matrix rows, queries into
    ``n_query_blocks`` vector-matrix rows via ``pack_blocks``) and
    every (code-block x query-block) pair scores in one mapInPandas
    task: the ADC tables for the block's queries are built inside the
    closure from the codebooks (shipped by value, a few KB) — a
    (block_queries x m x n_codes) einsum — and all lookups happen as
    one fancy-indexed sum. Each pair emits at most queries x k rows
    map-side, then a global per-query top-k window. Neither side is
    ever driver-materialized, so the query set can be corpus-sized:
    raise ``n_query_blocks`` so one block's (ids + float64 matrix +
    ADC tables) fits an Arrow batch.

    Scores are approximate (quantized); tests assert recall against
    the exact scan plus rank monotonicity, not score equality.
    """
    books = pq_codebooks_for(
        corpus,
        id_col,
        vec_col,
        m,
        n_codes,
        train_sample,
        seed=seed,
        driver_train_bound=driver_train_bound,
    )

    encode = pq_encode_udf(books)
    codes = corpus.select(
        F.col(id_col).cast("bigint").alias("neighbor_id"),
        encode(F.col(vec_col)).alias("codes"),
    )

    def pack_codes(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("neighbor_id")
        C = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
        return pd.DataFrame(
            {
                "block": [int(pdf["__block"].iloc[0])],
                "ids": [pdf["neighbor_id"].tolist()],
                "codes": [C.ravel().tolist()],
            }
        )

    code_blocks = (
        codes.withColumn(
            "__block", F.pmod(F.hash("neighbor_id"), F.lit(n_blocks))
        )
        .groupBy("__block")
        .applyInPandas(
            pack_codes, schema="block int, ids array<bigint>, codes array<int>"
        )
    )
    qb = pack_blocks(queries, id_col, vec_col, n_query_blocks).select(
        F.col("ids").alias("q_ids"),
        F.col("mat").alias("q_mat"),
        F.col("dim").alias("q_dim"),
    )
    paired = code_blocks.crossJoin(qb)

    out_schema = "query_id bigint, neighbor_id bigint, approx_cos double"
    topk = int(k)
    B = books  # (m, n_codes, dim/m) — ships by value in the closure

    def score(batches):
        import numpy as np
        import pandas as pd

        mm, _, dsub = B.shape
        for pdf in batches:
            out = {"query_id": [], "neighbor_id": [], "approx_cos": []}
            for row in pdf.itertuples():
                C = np.asarray(row.codes, dtype=np.int64).reshape(-1, mm)
                nid = np.asarray(row.ids, dtype=np.int64)
                Q = np.asarray(row.q_mat, dtype=np.float64).reshape(
                    -1, int(row.q_dim)
                )
                Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
                q_ids = np.asarray(row.q_ids, dtype=np.int64)
                # Per-block ADC tables: T[q, j, c] = <q_sub_j, codeword_jc>
                T = np.einsum("qjd,jcd->qjc", Q.reshape(len(Q), mm, dsub), B)
                # S[q, b] = Σ_j T[q, j, C[b, j]] — all m lookups fancy-indexed.
                S = T[:, np.arange(mm), C].sum(axis=2)  # (n_q, block_rows)
                S = np.where(q_ids[:, None] == nid[None, :], -np.inf, S)
                take = min(topk, S.shape[1])
                idx = np.argpartition(-S, take - 1, axis=1)[:, :take]
                for qi in range(len(q_ids)):
                    cols = idx[qi]
                    cols = cols[np.isfinite(S[qi, cols])]
                    out["query_id"].extend([q_ids[qi]] * len(cols))
                    out["neighbor_id"].extend(nid[cols].tolist())
                    out["approx_cos"].extend(S[qi, cols].tolist())
            yield pd.DataFrame(out)

    scored = paired.mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("approx_cos", 6).alias("approx_cos"))
    )


def cosine_topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    m: int = 16,
    n_codes: int = 32,
    train_sample: int = 4096,
    seed: int = 42,
    driver_train_bound: int = DRIVER_TRAIN_BOUND,
) -> DataFrame:
    """X2 composite IVF+PQ (the FAISS-style production index): IVF
    prunes WHICH inverted lists a query scans (~n_probe/n_clusters of
    the corpus), PQ shrinks what scanning a list COSTS (m table
    lookups per row over byte codes). Both training passes share one
    bounded driver-side sample; the corpus is encoded once,
    distributed; candidate generation is the cluster equi-join; ADC
    scoring is an Arrow-vectorized pass over the joined pairs.

    Approximate on both axes (pruning misses + quantization noise):
    the test contract is recall vs the exact scan, not score equality.

    Scale shape: the only driver-side data is the bounded training
    sample. Query vectors ride the cluster equi-join (no forced
    broadcast — AQE picks broadcast when the probe set is small and a
    skew-split shuffle join when it is corpus-sized), and the ADC
    tables are built INSIDE the scoring UDF per Arrow batch: the
    batch's queries are factorized to uniques, one einsum against the
    by-value codebooks builds their (m x n_codes) tables, and every
    pair scores with m fancy-indexed lookups. No query-set size ever
    touches driver memory.
    """
    if train_sample <= driver_train_bound:
        # Small regime: both training passes share ONE bounded driver
        # sample (a single TakeOrderedAndProject job).
        _log.info(
            "IVF+PQ training: driver numpy path (train_sample=%d <= bound=%d)",
            train_sample,
            driver_train_bound,
        )
        sample = _train_matrix(corpus, id_col, vec_col, train_sample)
        centroids = _kmeans_centroids(sample, n_clusters, seed=seed)
        books = train_pq_codebooks(sample, m=m, n_codes=n_codes, seed=seed)
    else:
        _log.info(
            "IVF+PQ training: distributed ml.KMeans path "
            "(train_sample=%d > bound=%d)",
            train_sample,
            driver_train_bound,
        )
        # Both trainers consume ONE cached training frame: the corpus
        # count + hash-stride filter + normalize run once, and the
        # KMeans iterations (centroids + m subspace fits) all read the
        # cached rows instead of re-scanning the corpus.
        shared = _distributed_training_rows(
            corpus, id_col, vec_col, train_sample
        ).cache()
        try:
            centroids = _kmeans_centroids_distributed(
                corpus, id_col, vec_col, n_clusters, train_sample,
                seed=seed, train=shared,
            )
            books = _pq_codebooks_distributed(
                corpus, id_col, vec_col, m, n_codes, train_sample,
                seed=seed, train=shared,
            )
        finally:
            shared.unpersist()

    assign1 = ivf_assign_udf(centroids, n_probe=1)
    encode = pq_encode_udf(books)
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        encode(F.col(vec_col)).alias("codes"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cluster"),
    )

    probe_n = ivf_assign_udf(centroids, n_probe=n_probe)
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probe_n(F.col(vec_col))).alias("cluster"),
    )
    pairs = cb.join(qb, "cluster").filter(
        F.col("neighbor_id") != F.col("query_id")
    )

    from pyspark.sql.functions import pandas_udf

    B = books  # (m, n_codes, dim/m) — ships by value in the closure

    @pandas_udf("double")
    def adc(codes: pd.Series, qid: pd.Series, qvec: pd.Series) -> pd.Series:
        import numpy as np

        mm, _, dsub = B.shape
        C = np.stack(codes.to_numpy()).astype(np.int64)  # (batch, m)
        q = qid.to_numpy()
        # One ADC table per UNIQUE query in the batch (each query joins
        # ~|cluster| corpus rows, so uniques << batch rows).
        uniq, first, inv = np.unique(q, return_index=True, return_inverse=True)
        Qu = np.stack(qvec.iloc[first].to_numpy()).astype(np.float64)
        Qu = Qu / np.linalg.norm(Qu, axis=1, keepdims=True)
        T = np.einsum("qjd,jcd->qjc", Qu.reshape(len(Qu), mm, dsub), B)
        # Gather each row's ADC table, then its m code lookups.
        s = np.take_along_axis(
            T[inv], C[:, :, None], axis=2
        )[:, :, 0].sum(axis=1)
        return pd.Series(s)

    scored = pairs.select(
        "query_id",
        "neighbor_id",
        adc(F.col("codes"), F.col("query_id"), F.col("q_vec")).alias("approx_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", F.round("approx_cos", 6).alias("approx_cos")
        )
    )


def semantic_bucket_near_dup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sign_bits: int = 4,
    threshold: float = 0.4,
) -> DataFrame:
    """SemDeDup-style semantic dedup with a DETERMINISTIC partitioner:
    bucket = the sign pattern of the first ``sign_bits`` embedding
    coordinates, near-dup pairs searched only within a bucket.

    The random-hyperplane LSH variant (``cosine_topk_lsh``) has better
    bucket geometry but engine-derived projections make it rows-only
    checkable; sign-signature bucketing is the portable twin — the
    bucket function is plain SQL on the stored floats, so the whole
    query has an exact DuckDB oracle. Same scale shape as LSH: an
    equi-join on bucket replaces the all-pairs cross product (expected
    candidate count N²/2^bits for centered data), and the per-pair
    cosine is a codegen'd zip_with/aggregate fold — no Python, no
    shuffle beyond the one bucket join.

    Misses pairs that straddle a sign boundary (any single-bucket
    scheme does); production composes multiple rotated sign tables
    exactly like multi-table LSH. Returns (bucket, id_a, id_b,
    cos_sim) with id_a < id_b.
    """
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0)
    for i in range(sign_bits):
        bucket = bucket + F.when(v[i] > 0, F.lit(1 << i)).otherwise(F.lit(0))
    dot = lambda x, y: F.aggregate(  # noqa: E731 — sequential fold, oracle-ordered
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, z: acc + z
    )
    # Per-ROW norm, folded once per vector — the per-pair expression is
    # then a single dot fold, not three (sqrt of the same sequential
    # fold the oracle computes, so values are identical).
    base = df.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        bucket.cast("bigint").alias("bucket"),
    ).withColumn("nv", F.sqrt(dot(F.col("v"), F.col("v"))))
    a = base.select(
        "bucket",
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("nv").alias("na"),
    )
    b = base.select(
        F.col("bucket").alias("bucket_b"),
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nv").alias("nb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("bucket") == F.col("bucket_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .withColumn(
            "cos_sim",
            dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
        )
        .filter(F.col("cos_sim") >= F.lit(threshold))
    )
    return pairs.select("bucket", "id_a", "id_b", "cos_sim")
