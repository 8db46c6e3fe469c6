"""Data-selection family (round 7): property, determinism, and
plan-shape tests for DSIR importance weighting, the Count-Min sketch,
and the broadcast quality model. Value parity vs DuckDB lives in
tests/test_parity.py like every other registered query; these tests
pin what the oracles can't — estimator guarantees, partitioning
invariance, and the shuffle discipline of each plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    from gas_data_pipeline_spark.catalog import table

    return table(spark, SF_DIR, "documents")


def _words():
    return F.split(F.lower(F.trim(F.col("text"))), r"\s+")


# ---------------------------------------------------------------------------
# Count-Min sketch: estimator guarantees
# ---------------------------------------------------------------------------


def test_cms_never_underestimates_any_key(spark):
    """The CMS point estimate is an upper bound for EVERY key, not
    just the top-20 the registered query reports — collisions only
    ever add counts."""
    from gas_data_pipeline_spark.catalog import table
    from gas_data_pipeline_spark.operators.selection import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    ev = table(spark, SF_DIR, "events")
    key = F.col("user_id").cast("string")
    merged = cms_merge(cms_build(ev, key, ["event_type"]))
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = cms_estimate(exact, merged, key)
    bad = est.filter(F.col("cms_estimate") < F.col("exact_cnt")).count()
    assert bad == 0


def test_cms_merge_equals_global_build(spark):
    """Cell-wise sum of per-group sketches == the sketch built in one
    pass over the union — the mergeable-summary property that lets
    100 TB pipelines sketch per partition and combine summaries."""
    from gas_data_pipeline_spark.catalog import table
    from gas_data_pipeline_spark.operators.selection import (
        cms_build,
        cms_merge,
    )

    ev = table(spark, SF_DIR, "events")
    key = F.col("user_id").cast("string")
    merged = cms_merge(cms_build(ev, key, ["event_type"])).orderBy(
        "row_j", "bucket"
    )
    direct = cms_build(ev, key, []).orderBy("row_j", "bucket")
    assert [tuple(r) for r in merged.collect()] == [
        tuple(r) for r in direct.collect()
    ]


# ---------------------------------------------------------------------------
# DSIR: model sanity + partitioning invariance
# ---------------------------------------------------------------------------


def test_dsir_targets_score_higher(spark):
    """Documents from the target domain (lang='en') must average a
    higher importance weight than the raw pool — the defining
    behavior of importance weighting."""
    from gas_data_pipeline_spark.operators.selection import (
        dsir_fit_log_ratios,
        dsir_log_ratio_map,
        dsir_score,
    )

    docs = _docs(spark)
    ratios = dsir_fit_log_ratios(
        docs, _words(), F.col("lang") == "en", n_buckets=128
    )
    scored = dsir_score(docs, _words(), dsir_log_ratio_map(ratios))
    rows = (
        scored.groupBy(F.col("lang") == "en")
        .agg(F.avg("logw").alias("m"))
        .collect()
    )
    means = {r[0]: r["m"] for r in rows}
    assert means[True] > means[False]


def test_dsir_fit_is_partitioning_invariant(spark):
    """The fitted ratio table is identical whatever the input layout —
    repartitioning the corpus must not move a single fixed-point
    addend (reruns on a different cluster shape give identical
    selections)."""
    from gas_data_pipeline_spark.operators.selection import (
        dsir_fit_log_ratios,
    )

    docs = _docs(spark)
    a = dsir_fit_log_ratios(docs, _words(), F.col("lang") == "en")
    b = dsir_fit_log_ratios(
        docs.repartition(7), _words(), F.col("lang") == "en"
    )
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb


# ---------------------------------------------------------------------------
# Quality model: range + bucket coverage
# ---------------------------------------------------------------------------


def test_quality_scores_bounded_and_buckets_populated(spark):
    from gas_data_pipeline_spark.registry import all_queries

    df = all_queries()["quality_model_score"](spark, SF_DIR)
    agg = df.agg(
        F.min("score").alias("lo"),
        F.max("score").alias("hi"),
        F.countDistinct("bucket").alias("nb"),
    ).collect()[0]
    assert 0.0 <= agg["lo"] <= agg["hi"] <= 1.0
    assert agg["nb"] == 3  # all of high / medium / low occur at sf0.01


# ---------------------------------------------------------------------------
# Plan shapes: the shuffle discipline the docstrings claim
# ---------------------------------------------------------------------------


def test_dsir_scoring_pass_is_zero_shuffle(spark):
    """After the 128-row model collect, scoring is scan -> project:
    no Exchange anywhere in the executed plan (the model is a map
    literal, not a join)."""
    from gas_data_pipeline_spark.registry import all_queries

    df = all_queries()["dsir_importance_select"](spark, SF_DIR)
    plan = _plan_of(df)
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_quality_model_is_zero_shuffle(spark):
    from gas_data_pipeline_spark.registry import all_queries

    df = all_queries()["quality_model_score"](spark, SF_DIR)
    plan = _plan_of(df)
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_cms_lookup_join_is_broadcast(spark):
    """The merged sketch is depth x width rows — the estimate lookup
    must be a broadcast join, never a sort-merge exchange of the
    candidate side."""
    from gas_data_pipeline_spark.registry import all_queries

    df = all_queries()["cms_heavy_hitters_merge"](spark, SF_DIR)
    plan = _plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_zipf_regression_runs_on_vocab_sized_data(spark):
    """The corpus-sized stage is ONE partial-aggregated token count;
    the rank window and regression run on vocabulary-sized data. The
    plan must show a partial aggregate before the first exchange and
    no second corpus-wide shuffle."""
    from gas_data_pipeline_spark.registry import all_queries

    df = all_queries()["zipf_token_slope"](spark, SF_DIR)
    plan = _plan_of(df)
    assert "partial_count" in plan or "partial" in plan.lower()
    # token count + lang window + final agg: <= 3 exchanges, all keyed
    # on (lang[, word]) summaries, never a corpus-row shuffle.
    assert plan.count("Exchange") <= 3


def test_cms_monitor_writer_replay_converges(spark, tmp_path):
    """Streaming re-delivers a micro-batch after a crash between the
    sink write and the checkpoint commit — the CMS monitor must
    converge under replay: (batch 0, batch 0, batch 1) must leave
    identical state and log to the clean (batch 0, batch 1) run. A
    blind sketch append would double-count every cell."""
    from gas_data_pipeline_spark.suite.streaming_suite import (
        cms_monitor_writer,
    )

    b0 = spark.range(200).select((F.col("id") % 13).alias("user_id"))
    b1 = spark.range(150).select((F.col("id") % 7).alias("user_id"))

    def run(root, replay):
        root.mkdir()
        log = str(root / "log")
        mon = cms_monitor_writer(str(root), log, tracked=[0, 1, 2, 3, 4])
        mon(b0, 0)
        if replay:
            mon(b0, 0)  # retried micro-batch: same data, same batch_id
        mon(b1, 1)
        return (
            spark.read.parquet(log + "/batch_*")
            .orderBy("batch_seq", "user_id")
            .collect()
        )

    clean = run(tmp_path / "clean", replay=False)
    replayed = run(tmp_path / "replay", replay=True)
    assert replayed == clean
    assert len(clean) == 10  # 5 tracked keys x 2 batches
