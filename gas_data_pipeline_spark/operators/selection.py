"""Data-selection operators for training-corpus construction
(SURVEY §2.11 extensions, round 7): hashed importance weighting in
the style of DSIR (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling"), a Count-Min-Sketch mergeable
frequency summary (Cormode & Muthukrishnan 2005), and a broadcast
linear quality model — the model-based filtering stage of
C4/RefinedWeb-style pipelines.

Design rules shared with ``operators/curation.py``:

- Pure native Column expressions in every per-row path; the hashed
  n-gram feature map is embedded as a map literal (bounded by the
  bucket count, never by the corpus), so the scoring pass is a
  single scan with ZERO shuffles.
- Deterministic and portable: every hash derives from md5 of
  (salt, value) — DuckDB reproduces each bucket id, each draw, and
  each sketch cell bit-for-bit, so all of it is value-oracle-able.
- Shuffle discipline: fitting the importance model is ONE
  map-side-combinable aggregate to ``n_buckets`` rows; a CMS build
  is ONE aggregate to ``depth x width`` rows per group; sketch
  merge is an aggregate over sketch rows (never a rescan of facts).

Scale notes (100 TB): the only data-sized exchange in this module is
the map-side-combined fit/build aggregate, whose reduce side is
bucket- or sketch-sized (128 / 256 rows), not corpus-sized. Scoring,
estimation, and model application are embarrassingly parallel
scan-project stages that inherit the input's partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gas_data_pipeline_spark.functions.exprs import bind

# 2^52: md5-prefix 13 hex chars = 52 bits, exact in a double — the
# same portable-uniform construction as operators/curation.py.
_TWO_52 = float(1 << 52)


def portable_bucket(value: Column, salt: str, n_buckets: int) -> Column:
    """Deterministic hash bucket in [0, n_buckets): the first 8 hex
    chars of md5(salt ':' value) read as a 32-bit integer, mod K.
    DuckDB twin::

        CAST(concat('0x', substring(md5('<salt>:' || v), 1, 8))
             AS BIGINT) % K

    md5 (unlike Spark's xxhash64 / DuckDB's hash) is the one hash
    both engines evaluate identically, which is what makes every
    bucketed operator here value-oracle-able."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), value.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % n_buckets
    )


# ---------------------------------------------------------------------------
# DSIR-style hashed importance weighting
# ---------------------------------------------------------------------------


def dsir_fit_log_ratios(
    docs: DataFrame,
    words: Column,
    is_target: Column,
    *,
    salt: str = "dsir-v1",
    n_buckets: int = 128,
    alpha: float = 0.5,
) -> DataFrame:
    """Fit the hashed-unigram importance model: bucket every word of
    every document, count bucket mass under the target slice vs the
    rest, and return ``n_buckets`` rows of Laplace-smoothed
    log-probability ratios ``lr = log p_target(b) - log p_raw(b)``.

    One corpus scan, one map-side-combinable aggregate whose reduce
    side is ``n_buckets`` rows — at 100 TB the shuffle payload is
    partitions x buckets partial counts, never token-sized. ``lr`` is
    quantized to 9 decimals so the per-document sums downstream are
    sums of identical addends in Spark and the DuckDB oracle
    (association order then perturbs at ~1e-13, far inside the
    6-decimal compare)."""
    exploded = docs.select(
        F.explode(words).alias("word"), is_target.alias("is_target")
    )
    grams = exploded.select(
        portable_bucket(F.col("word"), salt, n_buckets).alias("bucket"),
        "is_target",
    )
    fit = grams.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("t_cnt"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1)).alias("r_cnt"),
    )
    totals = fit.agg(
        F.sum("t_cnt").alias("t_tot"), F.sum("r_cnt").alias("r_tot")
    )
    ak = alpha * n_buckets
    return fit.crossJoin(F.broadcast(totals)).select(
        "bucket",
        "t_cnt",
        "r_cnt",
        F.round(
            F.log((F.col("t_cnt") + alpha) / (F.col("t_tot") + ak))
            - F.log((F.col("r_cnt") + alpha) / (F.col("r_tot") + ak)),
            9,
        ).alias("lr"),
    )


def dsir_log_ratio_map(ratios: DataFrame) -> Column:
    """Collect the fitted ratio table into a ``map<bigint,bigint>``
    literal of FIXED-POINT log-ratios (lr x 1e9 as integers). The
    collect is bounded by construction (``n_buckets`` rows — a model,
    not data), mirroring the codebook embeds in
    ``operators/similarity.py``: the model rides the task closure to
    every executor and the scoring join disappears entirely.

    Fixed-point matters for the oracle contract: per-document weights
    are sums of these addends, and integer sums are exact and
    association-order-independent — a float fold can land a document
    exactly on a round-half boundary in one engine and off it in the
    other (observed once in 5000 docs at sf0.1)."""
    rows = ratios.select("bucket", "lr").collect()
    pairs: list[Column] = []
    for r in rows:
        pairs.append(F.lit(int(r["bucket"])))
        pairs.append(F.lit(int(round(float(r["lr"]) * 1e9))))
    return F.create_map(*pairs)


def dsir_score(
    docs: DataFrame,
    words: Column,
    ratio_map: Column,
    *,
    salt: str = "dsir-v1",
    n_buckets: int = 128,
) -> DataFrame:
    """Score every document with its summed hashed log-importance
    weight — a ZERO-shuffle scan-project pass: the fold runs JVM-side
    over the word array (``F.aggregate``), the model is a map
    literal, and the output stays one row per input row, so the plan
    inherits the scan's partitioning untouched. The word array is
    let-bound and the (n_words, logw) pair expands through
    ``F.inline`` — a Generate node projections cannot collapse into,
    so the split runs exactly once per row."""
    scored = bind(
        words,
        lambda ws: F.struct(
            F.size(ws).cast("bigint").alias("n_words"),
            F.round(
                F.aggregate(
                    ws,
                    F.lit(0).cast("bigint"),
                    lambda acc, w: acc
                    + F.coalesce(
                        F.element_at(
                            ratio_map, portable_bucket(w, salt, n_buckets)
                        ),
                        F.lit(0).cast("bigint"),
                    ),
                )
                / F.lit(1e9),
                6,
            ).alias("logw"),
        ),
    )
    return docs.select("*", F.inline(F.array(scored)))


# ---------------------------------------------------------------------------
# Count-Min Sketch: build / merge / estimate
# ---------------------------------------------------------------------------


def cms_rows(key: Column, *, salt: str, depth: int, width: int) -> Column:
    """The ``depth`` (row, bucket) cells a key hashes into — one
    md5-derived bucket per sketch row, exploded by the caller. Each
    sketch row uses an independent salt ``'<salt>:<j>'``."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row_j"),
                portable_bucket(key, f"{salt}:{j}", width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key: Column,
    group_cols: list[str],
    *,
    salt: str = "cms-v1",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Build one Count-Min sketch per group: ONE map-side-combinable
    aggregate from facts to ``groups x depth x width`` summary rows.
    The reduce-side exchange is sketch-sized; the fact table is
    scanned exactly once and never again — estimation and merge work
    on the summary."""
    cells = df.select(
        *group_cols,
        F.explode(cms_rows(key, salt=salt, depth=depth, width=width)).alias(
            "cell"
        ),
    ).select(*group_cols, "cell.row_j", "cell.bucket")
    return cells.groupBy(*group_cols, "row_j", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(sketches: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge sketches by cell-wise sum — the defining mergeable-summary
    property (same algebra as the HLL register merge in
    ``operators/sketches.py``): an aggregate over sketch rows, never a
    rescan of the facts that built them."""
    keys = (group_cols or []) + ["row_j", "bucket"]
    return sketches.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    candidates: DataFrame,
    merged: DataFrame,
    key: Column,
    *,
    salt: str = "cms-v1",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-estimate each candidate key: min over the sketch's
    ``depth`` cells (the classic CMS upper-bound estimator — never an
    underestimate). The merged sketch is ``depth x width`` rows, so
    the lookup join is a broadcast; candidates stay partitioned as
    they arrive and the final min is a candidates-sized aggregate."""
    probes = candidates.select(
        "*",
        F.explode(cms_rows(key, salt=salt, depth=depth, width=width)).alias(
            "cell"
        ),
    ).select("*", "cell.row_j", "cell.bucket").drop("cell")
    joined = probes.join(F.broadcast(merged), ["row_j", "bucket"], "left")
    others = [c for c in candidates.columns]
    return joined.groupBy(*others).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate")
    )


# ---------------------------------------------------------------------------
# Broadcast linear quality model
# ---------------------------------------------------------------------------

# "Pretrained" quality weights: a fixed linear model over cheap
# lexical features — the shape of fastText-style quality classifiers
# in C4/RefinedWeb pipelines, with the learned weights replaced by a
# deterministic constant vector so the whole stage value-oracles.
QUALITY_STOPWORDS = ("a", "the", "of", "and", "to", "in", "is", "for")
QUALITY_BIAS = 4.85
QUALITY_W_NWORDS = 0.05
QUALITY_W_DISTINCT = 6.0
QUALITY_W_STOP = 12.0
QUALITY_W_WLEN = -2.5


def quality_features(words: Column) -> dict[str, Column]:
    """Lexical quality features over a bound word array: length,
    lexical diversity, stopword share, mean word length. All native
    array expressions — one pass, no shuffle, no UDF."""
    n = F.size(words).cast("bigint")
    nd = F.size(F.array_distinct(words)).cast("bigint")
    n_stop = F.size(
        F.filter(words, lambda w: w.isin(*QUALITY_STOPWORDS))
    ).cast("bigint")
    total_len = F.aggregate(
        words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
    )
    safe_n = F.greatest(n, F.lit(1)).cast("double")
    return {
        "n_words": n,
        "distinct_ratio": nd / safe_n,
        "stop_ratio": n_stop / safe_n,
        "mean_wlen": total_len / safe_n,
    }


def quality_score(feats: dict[str, Column]) -> Column:
    """Sigmoid of the fixed linear model — a [0,1] quality score."""
    z = (
        F.lit(QUALITY_BIAS)
        + F.lit(QUALITY_W_NWORDS) * feats["n_words"]
        + F.lit(QUALITY_W_DISTINCT) * feats["distinct_ratio"]
        + F.lit(QUALITY_W_STOP) * feats["stop_ratio"]
        + F.lit(QUALITY_W_WLEN) * feats["mean_wlen"]
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


# ---------------------------------------------------------------------------
# Greedy k-center coreset selection
# ---------------------------------------------------------------------------


def sq_dist_fp(v: Column, center: list[float], quantum: float = 1e6) -> Column:
    """Fixed-point squared-L2 distance between a vector column and a
    constant center: each elementwise squared difference is quantized
    to a BIGINT (x ``quantum``) BEFORE the sum, so the total is an
    integer sum — exact and association-order-independent, which is
    what lets a farthest-point argmax agree bit-for-bit with a DuckDB
    oracle (a float fold could rank two near-tied candidates
    differently across engines). DuckDB twin::

        list_sum(list_transform(range(1, len(v) + 1),
            i -> CAST(round((v[i]-c[i]) * (v[i]-c[i]) * 1e6) AS BIGINT)))
    """
    carr = F.array(*[F.lit(float(x)) for x in center])
    return F.aggregate(
        F.zip_with(
            v,
            carr,
            lambda a, b: F.round((a - b) * (a - b) * F.lit(quantum), 0).cast(
                "bigint"
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def kcenter_greedy(
    points: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 8,
    quantum: float = 1e6,
    persist_every: int = 4,
) -> tuple[list[dict], DataFrame]:
    """Greedy k-center coreset selection (farthest-point traversal —
    the 2-approximation of Gonzalez 1985, the coreset selector of
    Sener & Savarese 2018 "Active Learning for CNNs: A Core-Set
    Approach"): seed with the minimum id, then ``k-1`` rounds of
    "pick the point farthest from the chosen set".

    Distributed shape: the chosen set lives on the driver (k rows — a
    model, not data); per round the ONLY cluster work is one
    scan-stage ``least(mind, dist-to-new-center)`` update plus a
    bounded top-1 reduce (``TakeOrderedAndProject`` of a single row),
    so a round is O(N·d) map work with a 1-row action and the whole
    selection is k such passes — the standard cluster formulation.
    The running-min column compounds as an expression chain over the
    base scan (round r re-evaluates r distances per row AND re-plans
    an r-deep codegen tree); every ``persist_every`` rounds the state
    is localCheckpointed lazily, capping both the per-row re-eval and
    the plan depth at a constant while keeping per-round cluster work
    O(N·d).

    Fewer than ``k`` distinct points is not an error: selection stops
    early when no unchosen point remains (matching the oracle's
    recursive-CTE early termination) and returns the centers found.

    Returns ``(centers, assigned)``: ``centers`` is the selection
    order (``step``, ``id``, fixed-point ``sq_fp`` distance to the
    prior set — None for the seed, and the max-min coverage radius of
    step j-1's set is step j's ``sq_fp``); ``assigned`` maps every
    point to its nearest center (ties to the smallest center id),
    computed as one zero-shuffle scan over an ``array_sort`` of the
    k (dist, center) structs."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k=}")
    if persist_every < 1:
        raise ValueError(f"need persist_every >= 1, got {persist_every=}")
    pts = points.select(
        F.col(id_col).alias("pid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    seed = pts.orderBy("pid").limit(1).collect()[0]
    centers: list[dict] = [
        {"step": 1, "id": seed["pid"], "sq_fp": None, "vec": list(seed["v"])}
    ]
    state = pts.select(
        "pid", "v", sq_dist_fp(F.col("v"), centers[0]["vec"], quantum).alias("mind")
    )
    for step in range(2, k + 1):
        chosen_ids = [c["id"] for c in centers]
        far = (
            state.filter(~F.col("pid").isin(chosen_ids))
            .orderBy(F.desc("mind"), "pid")
            .limit(1)
            .collect()
        )
        if not far:  # fewer than k distinct points: stop like the oracle
            break
        far = far[0]
        centers.append(
            {
                "step": step,
                "id": far["pid"],
                "sq_fp": far["mind"],
                "vec": list(far["v"]),
            }
        )
        state = state.withColumn(
            "mind",
            F.least("mind", sq_dist_fp(F.col("v"), centers[-1]["vec"], quantum)),
        )
        if (step - 1) % persist_every == 0:
            # lazy: materializes with the NEXT round's top-1 action,
            # then every later round reads the checkpoint instead of
            # re-evaluating the compounded distance chain.
            state = state.localCheckpoint(eager=False)
    assigned = assign_to_centers(pts, centers, quantum=quantum)
    return centers, assigned


def assign_to_centers(
    pts: DataFrame,
    centers: list[dict],
    *,
    quantum: float = 1e6,
    payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Nearest-center assignment against a FROZEN center list (the
    apply side of k-center selection, and the coarse-quantizer routing
    step of an IVF-style vector index): one zero-shuffle scan over an
    ``array_sort`` of the k broadcast (dist, center) structs — ties to
    the smallest center id, distances fixed-point so the argmin is
    engine-exact. ``pts`` must carry ``pid`` and ``v`` columns (the
    shape :func:`kcenter_greedy` builds); extra ``payload_cols`` ride
    through so callers never need a corpus-sized re-join."""
    cands = F.array(
        *[
            F.struct(
                sq_dist_fp(F.col("v"), c["vec"], quantum).alias("sq_fp"),
                F.lit(c["id"]).alias("center_id"),
            )
            for c in centers
        ]
    )
    best = F.element_at(F.array_sort(cands), 1)
    return pts.select(
        "pid",
        *payload_cols,
        best["center_id"].alias("center_id"),
        best["sq_fp"].alias("sq_fp"),
    )
