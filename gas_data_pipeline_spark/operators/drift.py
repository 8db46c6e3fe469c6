"""Dataset drift and split-integrity diagnostics.

A 100 TB training pipeline re-ingests its corpus continuously; the
questions that gate a retrain are "did the feature distributions move
since the last snapshot?", "does any entity leak across the
train/test boundary?", and "which join keys will blow up the next
shuffle?". The reference answers the first two ad hoc in pandas
notebooks (the repo makes them engine operators); the third is the
diagnostic you run BEFORE a large join to decide broadcast vs salt
(`operators/layout.py` consumes its output shape).

All three are exact and oracle-checkable:

- :func:`psi_drift` — Population Stability Index per feature between
  a baseline and a current snapshot, over equi-width bins anchored on
  the *baseline's* min/max (the standard scorecard-monitoring
  formulation). Everything after the two scans is arithmetic on a
  ``features x bins``-sized histogram: the raw rows never shuffle —
  each side folds map-side into per-(feature, bin) partial counts, so
  the single exchange carries at most ``partitions x features x
  bins`` rows regardless of snapshot size.
- :func:`split_leakage_audit` — entities whose rows straddle split
  assignments. The first aggregation collapses to distinct
  ``(group, split)`` pairs map-side, so the second (per-group)
  exchange is bounded by ``groups x n_splits``, never row count.
- :func:`join_skew_profile` — per-key multiplicities on both sides of
  a prospective join, the implied per-key output contribution
  (``cnt_left * cnt_right``), the exact total join cardinality, and
  the top-N heaviest keys. Both sides reduce map-side to per-key
  counts before the one small count-table join; the top-N is a
  ``TakeOrderedAndProject``, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _long_form(df: DataFrame, feature_cols: list[str]) -> DataFrame:
    """(feature, v) long form via one ``stack`` pass — a single scan
    regardless of feature count; null feature values drop (they have
    no bin in either engine's histogram)."""
    bad = [c for c in feature_cols if "'" in c or "`" in c]
    if bad:
        raise ValueError(f"feature names may not contain quotes/backticks: {bad}")
    pairs = ", ".join(f"'{c}', CAST(`{c}` AS DOUBLE)" for c in feature_cols)
    return df.select(
        F.expr(f"stack({len(feature_cols)}, {pairs}) AS (feature, v)")
    ).filter(F.col("v").isNotNull())


def baseline_bounds(base: DataFrame, feature_cols: list[str]) -> DataFrame:
    """Per-feature [min, max] of the baseline snapshot — the bin
    anchor every later histogram (batch or stream) shares. A
    features-sized frame; persist it once, broadcast it everywhere."""
    return _long_form(base, feature_cols).groupBy("feature").agg(
        F.min("v").alias("__lo"), F.max("v").alias("__hi")
    )


def histogram_on_bounds(
    df: DataFrame, feature_cols: list[str], bounds: DataFrame, bins: int
) -> DataFrame:
    """(feature, bin, cnt) equi-width histogram under shared
    ``bounds`` — out-of-span values clamp into the edge bins, so
    every non-null row lands exactly once. Map-side partial counts
    are the only exchange; the additive output is the mergeable
    summary incremental monitoring maintains (add each batch's
    histogram, never rescan the accumulated stream)."""
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    binned = _long_form(df, feature_cols).join(
        F.broadcast(bounds), "feature"
    ).withColumn(
        "bin",
        F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
            F.least(
                F.lit(bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor((F.col("v") - F.col("__lo")) / width).cast("int"),
                ),
            )
        ),
    )
    return binned.groupBy("feature", "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def psi_from_histograms(
    base_hist: DataFrame, cur_hist: DataFrame, min_share: float = 1e-6
) -> DataFrame:
    """PSI per feature from two (feature, bin, cnt) histograms built
    on the SAME bounds. Histogram-sized arithmetic — at 100 TB this
    is the free part; the scans that built the histograms were the
    cost. Returns ``feature, n_base, n_cur, psi`` (psi rounded 6dp).

    The per-feature totals come from a WINDOW over the merged
    histogram, not a second aggregate branch: branching ``hist`` into
    a totals subquery and re-joining would re-execute the entire
    upstream lineage (both snapshot scans!) once per branch — the
    single-reference plan keeps each input scanned exactly once.
    """
    from pyspark.sql.window import Window

    hist = (
        base_hist.select("feature", "bin", F.col("cnt").alias("cnt_base"))
        .join(
            cur_hist.select("feature", "bin", F.col("cnt").alias("cnt_cur")),
            ["feature", "bin"],
            "full_outer",
        )
        .fillna(0, subset=["cnt_base", "cnt_cur"])
    )
    w = Window.partitionBy("feature")
    hist = hist.withColumn("n_base", F.sum("cnt_base").over(w)).withColumn(
        "n_cur", F.sum("cnt_cur").over(w)
    )
    eps = F.lit(float(min_share))
    p_base = F.greatest(F.col("cnt_base") / F.col("n_base"), eps)
    p_cur = F.greatest(F.col("cnt_cur") / F.col("n_cur"), eps)
    term = (p_cur - p_base) * F.log(p_cur / p_base)
    return hist.groupBy("feature").agg(
        F.max("n_base").alias("n_base"),
        F.max("n_cur").alias("n_cur"),
        F.round(F.sum(term), 6).alias("psi"),
    )


def psi_drift(
    base: DataFrame,
    cur: DataFrame,
    feature_cols: list[str],
    bins: int = 10,
    min_share: float = 1e-6,
) -> DataFrame:
    """PSI per feature: ``sum_b (p_cur - p_base) * ln(p_cur /
    p_base)`` over ``bins`` equi-width bins spanning the baseline's
    [min, max] (current-side values outside the span clamp into the
    edge bins, the standard convention). Shares are floored at
    ``min_share`` so empty bins contribute a finite penalty instead
    of ln(0).

    Output: one row per feature — ``feature, n_base, n_cur, psi``
    (psi rounded to 6dp; both engines compute the identical double
    expression, same device as ``text_unigram_logprob``).

    Scale shape: two scans, each folding map-side into (feature, bin,
    side) partial counts; ONE exchange of ``<= features x bins x 2``
    distinct keys; the bounds aggregate is features-sized and rides a
    broadcast join. No row-sized shuffle exists in the plan — at
    100 TB the cost is the two scans, full stop.
    """
    if bins < 2:
        raise ValueError("bins must be >= 2")
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")

    bounds = baseline_bounds(base, feature_cols)
    base_hist = histogram_on_bounds(base, feature_cols, bounds, bins)
    cur_hist = histogram_on_bounds(cur, feature_cols, bounds, bins)
    return psi_from_histograms(base_hist, cur_hist, min_share)


def split_leakage_audit(
    df: DataFrame, group_col: str, split_col: str
) -> DataFrame:
    """Entities assigned to more than one split — the audit that
    catches a row-level split applied where a group-level one was
    required (the classic contamination bug: one user's sessions in
    both train and test). Returns one row per LEAKING group:
    ``group, n_rows, n_splits, splits`` (splits as a sorted
    comma-join, engine-portable for hashing).

    Scale shape: the first groupBy collapses to distinct
    ``(group, split)`` pairs with map-side partial aggregation — the
    only row-count-sized work is that fold; the per-group re-exchange
    then carries at most ``groups x n_splits`` rows, and leak rows
    (the output) are rarer still.
    """
    pairs = df.groupBy(group_col, split_col).agg(F.count(F.lit(1)).alias("__n"))
    return (
        pairs.groupBy(group_col)
        .agg(
            F.sum("__n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_splits"),
            F.array_join(
                F.sort_array(F.collect_list(split_col)), ","
            ).alias("splits"),
        )
        .filter(F.col("n_splits") > 1)
    )


def _key_profile(left: DataFrame, right: DataFrame, key_col: str) -> DataFrame:
    """Keys-sized join profile: per-key counts on both sides and the
    per-key output contribution. Each side folds map-side to per-key
    counts before its exchange — the plan-shape contract
    ``tests/test_drift.py`` pins on this builder (the public wrapper
    checkpoints it, which hides these stages from the final plan)."""
    lc = left.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt_left"))
    rc = right.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt_right"))
    return lc.join(rc, key_col, "inner").select(
        F.col(key_col).cast("string").alias("key"),
        "cnt_left",
        "cnt_right",
        (F.col("cnt_left") * F.col("cnt_right")).alias("contribution"),
    )


def join_skew_profile(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    top_n: int = 20,
) -> DataFrame:
    """Pre-flight skew diagnostic for ``left JOIN right ON key``:
    exact per-key multiplicities, the per-key output contribution
    ``cnt_left * cnt_right``, and the exact total join cardinality.
    One ``kind='key'`` row per top-N key (by contribution desc, key
    asc — deterministic) and one ``kind='total'`` row carrying
    ``n_keys`` (matching keys) and ``contribution`` = total join
    output rows. Feed the heavy keys to ``layout.salt_skewed_keys``
    or flip the small side to broadcast.

    Scale shape: each side reduces map-side to per-key counts (the
    same exchange the real join would do, minus the payload); the
    count-table join is keys-sized; top-N is TakeOrderedAndProject;
    the total is a 1-row aggregate. Never materializes the join.
    """
    prof = _key_profile(left, right, key_col)
    # Both output branches (top-N and the 1-row total) consume `prof`;
    # without a materialization each branch would re-execute the two
    # count aggregations AND their input scans — the same
    # double-lineage trap psi_from_histograms avoids with its window.
    # The profile is keys-sized (already reduced) so materializing is
    # bounded; localCheckpoint (not persist) keeps it scoped to this
    # invocation instead of leaving a session-lifetime cache entry.
    prof = prof.localCheckpoint(eager=True)
    top = prof.orderBy(F.desc("contribution"), F.asc("key")).limit(top_n)
    total = prof.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("contribution").alias("contribution"),
    ).select(
        F.lit("total").alias("kind"),
        F.lit(None).cast("string").alias("key"),
        F.lit(None).cast("bigint").alias("cnt_left"),
        F.lit(None).cast("bigint").alias("cnt_right"),
        F.col("n_keys"),
        "contribution",
    )
    return top.select(
        F.lit("key").alias("kind"),
        "key",
        "cnt_left",
        "cnt_right",
        F.lit(None).cast("bigint").alias("n_keys"),
        "contribution",
    ).unionByName(total)


def embedding_centroid_drift(
    base: DataFrame,
    cur: DataFrame,
    vec_col: str,
    label_col: str,
) -> DataFrame:
    """Vector-space drift per label slice: the cosine between the two
    snapshots' per-label centroids and the L2 centroid shift — the
    embedding-column complement of :func:`psi_drift` (a re-embedded or
    silently re-normalized corpus moves here long before scalar
    features notice). Returns ``label, n_base, n_cur, centroid_cos,
    centroid_shift`` (rounded 6dp).

    Scale shape: each side posexplodes to (label, pos, x) and folds
    map-side into per-(label, pos) partial sums — the exchange carries
    ``labels x dim`` rows per side regardless of corpus size; the
    centroid join and the final per-label reduction are labels-sized.
    No Python, no vector ever collected.
    """
    def cent(df: DataFrame) -> DataFrame:
        ex = df.select(
            F.col(label_col).alias("label"),
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x"),
        )
        return ex.groupBy("label", "pos").agg(
            F.avg("x").alias("c"), F.count(F.lit(1)).alias("n")
        )

    cb = cent(base).select(
        "label", "pos", F.col("c").alias("cb"), F.col("n").alias("n_base")
    )
    cc = cent(cur).select(
        "label", "pos", F.col("c").alias("cc"), F.col("n").alias("n_cur")
    )
    joined = cb.join(cc, ["label", "pos"], "inner")
    return joined.groupBy("label").agg(
        F.max("n_base").alias("n_base"),
        F.max("n_cur").alias("n_cur"),
        F.round(
            F.sum(F.col("cb") * F.col("cc"))
            / (
                F.sqrt(F.sum(F.col("cb") * F.col("cb")))
                * F.sqrt(F.sum(F.col("cc") * F.col("cc")))
            ),
            6,
        ).alias("centroid_cos"),
        F.round(
            F.sqrt(F.sum((F.col("cb") - F.col("cc")) * (F.col("cb") - F.col("cc")))),
            6,
        ).alias("centroid_shift"),
    )


def ks_from_histograms(
    base_hist: DataFrame, cur_hist: DataFrame
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D per feature from the same
    (feature, bin, cnt) summaries :func:`psi_from_histograms` consumes:
    D = max over bin boundaries of |CDF_base - CDF_cur| (computed on
    the binned empirical CDFs, so it is exact FOR THE BINNING — the
    summary-resolution counterpart of the exact-sketch family).
    Threshold-free complement to PSI: PSI weights tail mass
    logarithmically; D reports the single largest CDF gap. Same scale
    shape: everything after the histogram builds is bins-sized; the
    running CDFs are one ordered window per feature over <= bins rows.
    """
    from pyspark.sql.window import Window

    hist = (
        base_hist.select("feature", "bin", F.col("cnt").alias("cnt_base"))
        .join(
            cur_hist.select("feature", "bin", F.col("cnt").alias("cnt_cur")),
            ["feature", "bin"],
            "full_outer",
        )
        .fillna(0, subset=["cnt_base", "cnt_cur"])
    )
    wtot = Window.partitionBy("feature")
    wcdf = (
        Window.partitionBy("feature")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hist = (
        hist.withColumn("n_base", F.sum("cnt_base").over(wtot))
        .withColumn("n_cur", F.sum("cnt_cur").over(wtot))
        .withColumn("cdf_base", F.sum("cnt_base").over(wcdf) / F.col("n_base"))
        .withColumn("cdf_cur", F.sum("cnt_cur").over(wcdf) / F.col("n_cur"))
    )
    return hist.groupBy("feature").agg(
        F.max("n_base").alias("n_base"),
        F.max("n_cur").alias("n_cur"),
        F.round(
            F.max(F.abs(F.col("cdf_base") - F.col("cdf_cur"))), 6
        ).alias("ks_d"),
    )
