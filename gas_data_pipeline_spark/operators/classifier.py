"""Trained quality-classifier lifecycle (SURVEY §2.11 extensions,
round 7): distributed FULL-BATCH gradient-descent training of a
hashing-trick linear classifier, then a stochastic acceptance filter
over its scores — the "train a discriminator against a reference
corpus, keep crawl docs it likes" stage of GPT-3 / CCNet / RefinedWeb
style pipelines (Brown et al. 2020 §A; the reference repo has no
model-training surface, so this is a beyond-reference family mandated
by the build brief).

Where :mod:`operators/selection.py` ships a FIXED weight vector
(`quality_model_score`), this module closes the lifecycle the way
``operators/bpe.py`` does for tokenizers: train → inspect trajectory
→ apply. The trainer is the classic Spark iterative-aggregate shape:

- **One map-side-combinable aggregate per iteration.** The gradient
  of the squared-error/hard-sigmoid objective is ``g_j = Σ_d e_d ·
  x_dj`` — an integer sum over exploded (bucket, doc-error) pairs
  that partial-aggregates to ``dim + 1`` rows (64 feature buckets +
  the bias sentinel −1). At 100 TB the reduce-side exchange per
  iteration is ``partitions × 65`` partial sums, never corpus-sized.
- **The model rides the closure.** Weights live on the driver
  (65 integers — a model, not data) and are embedded in the next
  iteration's scan as a ``map<bigint,bigint>`` literal, so the
  per-doc margin ``z_d`` is a ZERO-shuffle JVM-side array fold with
  no join (same embed discipline as the DSIR ratio map and the IVF
  codebooks).
- **Engine-exact arithmetic.** Every quantity is fixed-point BIGINT
  (scale 1e6): the activation is a HARD sigmoid
  ``clamp(floor(z/4) + 0.5, 0, 1)`` (Collobert 2004's piecewise
  approximation), so the whole trajectory is integer sums plus
  IEEE-exact ``floor(x / 4.0)`` / ``floor(g·η / N)`` steps — DuckDB
  replays all three unrolled iterations bit-for-bit, which is what
  makes a TRAINING RUN value-oracle-able (a float ``exp`` sigmoid
  would drift in the last ulp and flip fixed-point boundaries).

Labels are deterministic weak supervision: ``y = 1`` for the target
slice (English docs — the same "reference corpus" proxy the DSIR fit
uses), ``y = 0`` for the rest.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gas_data_pipeline_spark.operators.selection import portable_bucket

# Fixed-point scale for probabilities, errors, and weights.
FP = 1_000_000
# Hard-sigmoid slope 1/4 (Collobert 2004): p = clamp(z/4 + 1/2, 0, 1).
SIGMOID_DIV = 4.0
# Bias term travels as the sentinel bucket -1 (one occurrence per doc).
BIAS_BUCKET = -1


def hashed_buckets(words: Column, *, salt: str, dim: int) -> Column:
    """Hashing-trick featurization: each word of the bound array maps
    to its md5-derived bucket in ``[0, dim)``. Per-doc counts of
    these buckets ARE the feature vector — never materialized wider
    than the word array itself."""
    return F.transform(words, lambda w: portable_bucket(w, salt, dim))


def margin_fp(buckets: Column, w_map: Column, bias_fp: int) -> Column:
    """Fixed-point margin ``z_d = b + Σ_j w_j x_dj`` as a JVM-side
    fold over the doc's bucket array against the broadcast weight-map
    literal — zero shuffle, zero join, exact integer sum."""
    return F.aggregate(
        buckets,
        F.lit(int(bias_fp)).cast("bigint"),
        lambda acc, b: acc
        + F.coalesce(F.element_at(w_map, b), F.lit(0).cast("bigint")),
    )


def hard_sigmoid_fp(z_fp: Column) -> Column:
    """``p = clamp(floor(z/4) + FP/2, 0, FP)`` — the piecewise-linear
    sigmoid in fixed point. ``z / 4.0`` divides by a power of two
    (exact in IEEE doubles), so ``floor`` is engine-portable."""
    return F.least(
        F.greatest(
            F.floor(z_fp / F.lit(SIGMOID_DIV)).cast("bigint")
            + F.lit(FP // 2),
            F.lit(0).cast("bigint"),
        ),
        F.lit(FP).cast("bigint"),
    )


def _weight_map(weights: dict[int, int]) -> Column:
    pairs: list[Column] = []
    for b, w in weights.items():
        if b == BIAS_BUCKET:
            continue
        pairs.append(F.lit(int(b)).cast("bigint"))
        pairs.append(F.lit(int(w)).cast("bigint"))
    if not pairs:  # iteration 1: all-zero model
        return F.map_from_arrays(
            F.array().cast("array<bigint>"), F.array().cast("array<bigint>")
        )
    return F.create_map(*pairs)


def featurize(
    docs: DataFrame,
    words: Column,
    is_target: Column,
    *,
    salt: str = "qclf-v1",
    dim: int = 64,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The shared featurization scan: per doc the hashed bucket array
    ``bs`` plus the fixed-point label ``y_fp`` (and any passthrough
    ``extra_cols`` the caller needs downstream). Training replays this
    frame once per GD iteration and scoring once more — callers should
    ``persist()`` it so the word split + md5 hashing run ONCE, not 4-5
    times (the r7 scale probe flagged the unpersisted replay at
    per-copy 1.65)."""
    return docs.select(
        *extra_cols,
        hashed_buckets(words, salt=salt, dim=dim).alias("bs"),
        F.when(is_target, F.lit(FP)).otherwise(F.lit(0))
        .cast("bigint")
        .alias("y_fp"),
    )


def train_on_features(
    feats: DataFrame,
    *,
    iters: int = 3,
    eta: float = 0.0625,
) -> list[dict[int, int]]:
    """Full-batch gradient descent on the hard-sigmoid squared-error
    surrogate, over a pre-featurized (``bs``, ``y_fp``) frame. Returns
    the weight snapshot AFTER each iteration (a list of
    ``{bucket: w_fp}`` dicts including the bias at bucket −1) so
    callers can expose the whole trajectory to an oracle.

    Per iteration exactly ONE distributed action: scan feats, fold the
    margin per row against the embedded weight map, explode the
    bucket array (bias sentinel appended) carrying the doc error, and
    partial-aggregate ``sum(e_d)`` per bucket — ``g_j = Σ_d e_d x_dj``
    lands as ``dim + 1`` rows on the driver. The update
    ``w_j ← w_j − floor(g_j · η / N)`` runs in Python on the 65-entry
    model; N is read from the same aggregate (the bias row counts
    every doc once), so training adds no extra ``count()`` job.

    ``eta`` must be a power of two so ``g · η`` is exact in IEEE
    doubles (the oracle contract). The 1/16 default is sized to the
    corpus's feature scale: docs average ~50 word occurrences whose
    bucket weights all move together on the first step, so a step
    that changes each weight by Δ moves a margin by ~50Δ — 1/16
    keeps first-step margins inside the hard sigmoid's linear band
    (|z| < 2e6) instead of slamming every doc to a saturated 0/1
    where gradients stop being informative."""
    weights: dict[int, int] = {}
    snapshots: list[dict[int, int]] = []
    n_docs: int | None = None
    for _ in range(iters):
        w_map = _weight_map(weights)
        bias = weights.get(BIAS_BUCKET, 0)
        e_fp = hard_sigmoid_fp(margin_fp(F.col("bs"), w_map, bias)) - F.col(
            "y_fp"
        )
        grad_rows = (
            feats.select(
                e_fp.alias("e_fp"),
                F.explode(
                    F.array_append(
                        F.col("bs"), F.lit(BIAS_BUCKET).cast("bigint")
                    )
                ).alias("bucket"),
            )
            .groupBy("bucket")
            .agg(F.sum("e_fp").alias("g"), F.count(F.lit(1)).alias("x_tot"))
            .collect()
        )
        if n_docs is None:
            n_docs = next(
                int(r["x_tot"]) for r in grad_rows if r["bucket"] == BIAS_BUCKET
            )
        new_w = dict(weights)
        for r in grad_rows:
            b = int(r["bucket"])
            # g·η exact (η = power of two), /N IEEE-exact-rounded,
            # floor — bit-identical in Spark, DuckDB, and CPython.
            new_w[b] = new_w.get(b, 0) - math.floor(
                int(r["g"]) * eta / n_docs
            )
        weights = new_w
        snapshots.append(dict(weights))
    return snapshots


def fit_sample(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    n: int = 2048,
    salt: str = "qcf-fit",
) -> DataFrame:
    """Deterministic bounded fit sample (VERDICT r11 #3): the ``n``
    docs with the smallest ``md5(salt:id)`` draw — the same
    smallest-hash device the k-center trainer uses. The plan is ONE
    TakeOrderedAndProject (scan + bounded per-partition heap, never a
    global sort), so the FIT cost of the classifier stops growing
    with the corpus: at 100 TB the trainer still optimizes over
    ``n`` rows while the scoring pass stays a full-corpus zero-shuffle
    scan. Exactly replayable in SQL (``ORDER BY md5(...) LIMIT n`` —
    md5 of distinct ids never ties), corpora at or below ``n`` train
    full-batch unchanged."""
    key = F.md5(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    return docs.orderBy(key).limit(n)


def train_quality_classifier(
    docs: DataFrame,
    words: Column,
    is_target: Column,
    *,
    salt: str = "qclf-v1",
    dim: int = 64,
    iters: int = 3,
    eta: float = 0.0625,
) -> list[dict[int, int]]:
    """Featurize-then-train convenience wrapper: persists the
    featurized frame for the GD loop (the word split + hashing scan
    runs once, every iteration reads the cache) and releases it when
    the trajectory is collected. Callers that also SCORE afterwards
    should instead :func:`featurize` + persist themselves and pass the
    same frame to :func:`train_on_features` and
    :func:`score_from_buckets`, so scoring shares the cache too."""
    feats = featurize(docs, words, is_target, salt=salt, dim=dim).persist()
    try:
        return train_on_features(feats, iters=iters, eta=eta)
    finally:
        feats.unpersist()


def score_from_buckets(buckets: Column, weights: dict[int, int]) -> Column:
    """Fixed-point classifier score from an existing bucket-array
    column under a trained snapshot — the zero-shuffle apply side
    (model as map literal, margin as array fold, hard sigmoid). Use
    this over a persisted :func:`featurize` frame so scoring reuses
    the cached featurization instead of re-splitting the corpus."""
    w_map = _weight_map(weights)
    bias = weights.get(BIAS_BUCKET, 0)
    return hard_sigmoid_fp(margin_fp(buckets, w_map, bias))


def score_fp(
    docs: DataFrame,
    words: Column,
    weights: dict[int, int],
    *,
    salt: str = "qclf-v1",
    dim: int = 64,
) -> Column:
    """:func:`score_from_buckets` with the featurization inline — for
    one-shot scoring where nothing else reuses the bucket arrays."""
    return score_from_buckets(
        hashed_buckets(words, salt=salt, dim=dim), weights
    )
