"""Drift / split-integrity / join-skew diagnostics: value properties
on hand-built frames plus plan-shape hygiene (map-side partials, no
row-sized shuffles beyond the operators' contracts)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gas_data_pipeline_spark.operators.drift import (
    join_skew_profile,
    psi_drift,
    split_leakage_audit,
)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- psi


def test_psi_zero_on_identical_snapshots(spark):
    df = spark.range(1000).select(
        (F.col("id") % 97).cast("double").alias("x"),
        (F.col("id") % 13).cast("double").alias("y"),
    )
    out = {r["feature"]: r for r in psi_drift(df, df, ["x", "y"]).collect()}
    assert set(out) == {"x", "y"}
    for r in out.values():
        assert r["psi"] == pytest.approx(0.0, abs=1e-9)
        assert r["n_base"] == r["n_cur"] == 1000


def test_psi_detects_shift_and_ranks_features(spark):
    base = spark.range(2000).select(
        (F.col("id") % 100).cast("double").alias("x"),
        (F.col("id") % 7).cast("double").alias("y"),
    )
    cur = spark.range(2000).select(
        ((F.col("id") % 100) * 0.3 + 60).cast("double").alias("x"),  # shifted
        (F.col("id") % 7).cast("double").alias("y"),  # unchanged
    )
    out = {r["feature"]: r["psi"] for r in psi_drift(base, cur, ["x", "y"]).collect()}
    assert out["x"] > 0.5  # strong drift
    assert out["y"] == pytest.approx(0.0, abs=1e-9)


def test_psi_clamps_out_of_range_current_rows(spark):
    """Current values outside the baseline span must land in the edge
    bins — never drop — so n_cur always equals the input row count."""
    base = spark.range(100).select(F.col("id").cast("double").alias("x"))
    cur = spark.range(100).select(
        (F.col("id").cast("double") * 10 - 400).alias("x")  # spills both ends
    )
    row = psi_drift(base, cur, ["x"]).collect()[0]
    assert row["n_cur"] == 100
    assert row["psi"] > 0


def test_psi_constant_feature_is_degenerate_not_crash(spark):
    base = spark.range(50).select(F.lit(3.0).alias("x"))
    cur = spark.range(70).select(F.lit(3.0).alias("x"))
    row = psi_drift(base, cur, ["x"]).collect()[0]
    assert row["psi"] == pytest.approx(0.0, abs=1e-9)
    assert (row["n_base"], row["n_cur"]) == (50, 70)


def test_psi_rejects_bad_args(spark):
    df = spark.range(10).select(F.col("id").cast("double").alias("x"))
    with pytest.raises(ValueError):
        psi_drift(df, df, [])
    with pytest.raises(ValueError):
        psi_drift(df, df, ["x"], bins=1)


def test_psi_plan_partial_counts_and_broadcast_bounds(spark):
    """The only exchanges carry (feature, bin)-sized partials; the
    features-sized bounds table rides a broadcast join, never a
    shuffled one."""
    df = spark.range(10000).select(
        (F.col("id") % 31).cast("double").alias("x"),
        (F.col("id") % 5).cast("double").alias("y"),
    )
    plan = _physical(psi_drift(df, df, ["x", "y"]))
    assert "partial_count" in plan
    assert "BroadcastHashJoin" in plan
    # The only sort-merge join allowed is the FullOuter merge of the
    # two POST-AGGREGATION histograms (features x bins rows) — raw
    # rows must never reach a shuffled join.
    assert plan.count("SortMergeJoin") <= 1
    if "SortMergeJoin" in plan:
        assert "FullOuter" in plan


# ----------------------------------------------------------- leakage


def test_leakage_clean_split_is_empty(spark):
    df = spark.range(500).select(
        (F.col("id") % 50).alias("g"),
        F.when(F.col("id") % 50 < 40, "train").otherwise("test").alias("split"),
    )
    assert split_leakage_audit(df, "g", "split").count() == 0


def test_leakage_finds_exact_straddlers(spark):
    rows = [
        (1, "train"), (1, "train"),
        (2, "train"), (2, "test"),           # leak
        (3, "val"),
        (4, "test"), (4, "val"), (4, "train"),  # leak
    ]
    df = spark.createDataFrame(rows, "g int, split string")
    out = {r["g"]: r for r in split_leakage_audit(df, "g", "split").collect()}
    assert set(out) == {2, 4}
    assert out[2]["splits"] == "test,train" and out[2]["n_rows"] == 2
    assert out[4]["splits"] == "test,train,val" and out[4]["n_splits"] == 3


def test_leakage_plan_has_mapside_partials(spark):
    df = spark.range(5000).select(
        (F.col("id") % 10).alias("g"),
        F.when(F.col("id") % 2 == 0, "train").otherwise("test").alias("split"),
    )
    plan = _physical(split_leakage_audit(df, "g", "split"))
    # The row-sized fold happens before its exchange.
    assert "partial_count" in plan


# -------------------------------------------------------------- skew


def test_skew_profile_total_matches_real_join(spark):
    left = spark.range(1000).select((F.col("id") % 37).alias("k"))
    right = spark.range(300).select((F.col("id") % 50).alias("k"))
    out = join_skew_profile(left, right, "k", top_n=5)
    total = out.filter(F.col("kind") == "total").collect()[0]
    assert total["contribution"] == left.join(right, "k").count()
    assert total["n_keys"] == 37  # keys 0..36 all present on both sides
    keys = out.filter(F.col("kind") == "key").collect()
    assert len(keys) == 5
    contribs = [r["contribution"] for r in keys]
    assert contribs == sorted(contribs, reverse=True)


def test_skew_profile_surfaces_planted_hot_key(spark):
    left = spark.range(2000).select(
        F.when(F.col("id") < 1000, F.lit(7)).otherwise(F.col("id")).alias("k")
    )
    right = spark.range(100).select((F.col("id") % 20).alias("k"))
    top = (
        join_skew_profile(left, right, "k", top_n=1)
        .filter(F.col("kind") == "key")
        .collect()[0]
    )
    assert top["key"] == "7"
    assert top["cnt_left"] == 1000  # the whole planted block maps to 7
    assert top["contribution"] == top["cnt_left"] * top["cnt_right"]


def test_skew_profile_plan_reduces_before_join(spark):
    from gas_data_pipeline_spark.operators.drift import _key_profile

    left = spark.range(10000).select((F.col("id") % 100).alias("k"))
    right = spark.range(10000).select((F.col("id") % 80).alias("k"))
    # Both sides must fold to per-key counts map-side before any
    # exchange — the diagnostic must never shuffle raw rows. Pinned on
    # the profile builder (the wrapper's eager checkpoint hides these
    # stages from the final plan).
    plan = _physical(_key_profile(left, right, "k"))
    assert plan.count("partial_count") >= 2
    # The public wrapper's top-N must stay a bounded TakeOrdered, not
    # a global sort.
    assert "TakeOrderedAndProject" in _physical(join_skew_profile(left, right, "k"))


# ---------------------------------------------------- centroid drift


def _emb_frame(spark, shift=0.0, labels=(0, 1)):
    rows = [
        (i, int(lab), [float(i % 5) + d + (shift if lab == 0 else 0.0)
                       for d in range(4)])
        for i in range(40)
        for lab in [i % len(labels)]
    ]
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )


def test_centroid_drift_identity(spark):
    from gas_data_pipeline_spark.operators.drift import embedding_centroid_drift

    df = _emb_frame(spark)
    out = embedding_centroid_drift(df, df, "embedding", "label").collect()
    for r in out:
        assert r["centroid_cos"] == pytest.approx(1.0, abs=1e-9)
        assert r["centroid_shift"] == pytest.approx(0.0, abs=1e-9)
        assert r["n_base"] == r["n_cur"] == 20


def test_centroid_drift_detects_shifted_label_only(spark):
    from gas_data_pipeline_spark.operators.drift import embedding_centroid_drift

    base = _emb_frame(spark)
    cur = _emb_frame(spark, shift=5.0)  # label 0 shifted, label 1 untouched
    out = {r["label"]: r for r in
           embedding_centroid_drift(base, cur, "embedding", "label").collect()}
    assert out[0]["centroid_shift"] == pytest.approx(10.0, abs=1e-6)  # sqrt(4*25)
    assert out[0]["centroid_cos"] < 1.0
    assert out[1]["centroid_shift"] == pytest.approx(0.0, abs=1e-9)
    assert out[1]["centroid_cos"] == pytest.approx(1.0, abs=1e-9)


def test_centroid_drift_plan_partial_avg(spark):
    from gas_data_pipeline_spark.operators.drift import embedding_centroid_drift

    df = _emb_frame(spark)
    plan = _physical(embedding_centroid_drift(df, df, "embedding", "label"))
    # The posexploded stream must fold map-side before its exchange.
    assert "partial_avg" in plan or "partial_average" in plan


def test_ks_zero_on_identical_and_one_on_disjoint(spark):
    from gas_data_pipeline_spark.operators.drift import (
        baseline_bounds,
        histogram_on_bounds,
        ks_from_histograms,
    )

    base = spark.range(500).select((F.col("id") % 40).cast("double").alias("x"))
    bounds = baseline_bounds(base, ["x"])
    hb = histogram_on_bounds(base, ["x"], bounds, bins=10)
    same = ks_from_histograms(hb, hb).collect()[0]
    assert same["ks_d"] == pytest.approx(0.0, abs=1e-9)

    # Disjoint supports (current clamps into the top edge bin): D = 1
    # at the boundary just below the last bin.
    cur = spark.range(500).select(
        (F.col("id").cast("double") + 1000).alias("x")
    )
    hc = histogram_on_bounds(cur, ["x"], bounds, bins=10)
    far = ks_from_histograms(hb, hc).collect()[0]
    assert far["ks_d"] > 0.85


# ------------------------------------------- streaming monitor replay


def test_drift_monitor_writer_replay_converges(spark, tmp_path):
    """Structured Streaming re-delivers a micro-batch after a crash
    between the sink write and the checkpoint commit — the writer must
    converge under replay: re-running (batch 0, batch 0, batch 1) must
    leave byte-identical state and log to the clean (batch 0, batch 1)
    run. A blind append would double-count; errorifexists would throw."""
    from gas_data_pipeline_spark.operators.drift import (
        baseline_bounds,
        histogram_on_bounds,
    )
    from gas_data_pipeline_spark.suite.streaming_suite import (
        drift_monitor_writer,
    )

    base = spark.range(400).select((F.col("id") % 23).cast("double").alias("x"))
    b0 = spark.range(100).select((F.col("id") % 17).cast("double").alias("x"))
    b1 = spark.range(100).select((F.col("id") % 29).cast("double").alias("x"))

    def run(root, replay):
        bounds_path = str(root / "bounds")
        base_hist = str(root / "base_hist")
        log = str(root / "log")
        bounds = baseline_bounds(base, ["x"])
        bounds.write.parquet(bounds_path)
        histogram_on_bounds(base, ["x"], bounds, bins=10).write.parquet(base_hist)
        mon = drift_monitor_writer(bounds_path, base_hist, str(root), log, ["x"])
        mon(b0, 0)
        if replay:
            mon(b0, 0)  # retried micro-batch: same data, same batch_id
        mon(b1, 1)
        return (
            spark.read.parquet(log + "/batch_*")
            .orderBy("batch_seq", "feature")
            .collect()
        )

    clean = run(tmp_path / "clean", replay=False)
    replayed = run(tmp_path / "replay", replay=True)
    assert replayed == clean
    assert len(clean) == 2  # one PSI row per batch for the one feature
