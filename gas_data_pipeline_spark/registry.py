"""Query registry: the single source of truth for the driver contract.

Every operator from SURVEY.md §2 that the engine implements registers
here as a named query: a Spark plan builder ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) the ANSI-SQL oracle string that
DuckDB runs on the same parquet tables. Keeping both in one
``register`` call keeps column aliases in lockstep — the driver's
compare hashes values under name-sorted columns, so a drifted alias is
a correctness failure.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as driver query ``name`` with its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


def _load_all() -> None:
    """Import every suite module for its registration side effects."""
    from gas_data_pipeline_spark.suite import (  # noqa: F401
        relational,
        scalar,
        reshape,
        pipeline_suite,
        streaming_suite,
        northstar,
        analytics_suite,
        curation_suite,
        selection_suite,
    )


# The external driver hard-checks only the FIRST 50 entries of
# ``queries()`` against their DuckDB oracles. This explicit window
# guarantees at least one oracled query per SURVEY §2 family AND per
# north-star (§2.11) family lands inside it, independent of module
# import order. Everything else follows in registration order and is
# still covered by the builder-side parity gate (tests/test_parity.py,
# all queries).
#
# Round-7 note: the round-6 driver check never landed a
# CORRECTNESS_r06.json in the repo, so this window is kept FROZEN for
# round 7 — the 41 first-time queries below still need their driver
# rows before anything rotates out. The round-7 additions
# (selection family incl. CCNet buckets + k-center coreset,
# bpe_encode_corpus, stream_heavy_hitters_cms, the streamed REST
# DataSource ingest)
# register in the tail and are covered by tests/test_parity.py until
# a later window rotation.
#
# Round-6 rotation (VERDICT r5 #1): finish the evidence rotation in
# one round. The anchor block shrinks 24 -> 9 (one per macro-family,
# each driver-green in >=2 prior rounds), freeing 41 slots — exactly
# the number of registered queries that have never earned a
# driver-side CORRECTNESS row (union of CORRECTNESS_r01..r05 keys =
# 116 of 157; the remaining 41 all rotate in below, including the
# whole drift/X7 and BPE/X8 families). After this round,
# union(r1..r6 driver rows) == all 157 registered names. Every
# rotated-OUT query keeps its exact DuckDB oracle in
# tests/test_parity.py, so nothing loses correctness coverage. Four
# rotated-in queries are rows-only by design, each with a pytest
# ground-truth bound: ann_ivf / ann_pq (recall floors,
# tests/test_northstar.py), approx_distinct_users (relative-error
# bound vs exact COUNT(DISTINCT), tests/test_plans.py),
# approx_percentiles_tdigest (quantile-error bound vs exact
# percentiles, tests/test_layout.py).
_DRIVER_WINDOW: tuple[str, ...] = (
    # -- anchors (one per macro-family, driver-green in >=2 rounds) --
    "flagship_data_query",
    "star_join_3way",
    "silver_upsert_idempotent",
    "melt_wide_to_long",
    "field_profile",
    "bronze_zero_loss_roundtrip",
    "stream_gie_delete_reload",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    # -- first-time driver-checked this round (all 41 remaining) --
    # drift / dataset-QA family (X7)
    "drift_psi_features",
    "drift_ks_statistic",
    "schema_drift_audit",
    "split_leakage_audit",
    "join_skew_profile",
    "embedding_centroid_drift",
    "stream_drift_monitor",
    "sample_k_per_group",
    # distributed BPE tokenizer training (X8)
    "bpe_pair_counts",
    "bpe_train_merge_rules",
    "bpe_vocab_after_merges",
    # analytics / SQL showcase tail
    "sql_q5_local_supplier_volume",
    "entity_resolution_e2e",
    "forecast_seasonal_naive_backtest",
    "robust_scale_winsorized",
    "event_day_streaks",
    "value_histogram_bins",
    "fuzzy_part_name_pairs",
    "zorder_bucket_stats",
    "order_basket_hof_profile",
    "stats_corr_by_brand",
    "rolling_weekly_active_users",
    # sketches / approximate family
    "approx_distinct_rollup_merge",
    "kmv_segment_overlap",
    "approx_distinct_users",
    "approx_percentiles_tdigest",
    # dedup / similarity tail
    "dedup_prefix_jaccard",
    "dedup_cluster_stats",
    "dedup_semantic_buckets",
    "ann_ivf",
    "ann_pq",
    # text / multimodal tail
    "multimodal_frame_sample",
    "multimodal_resize_grid",
    "text_chunk_sliding",
    "text_repetition_topgram",
    "embedding_norm_stats",
    "vocab_top_terms",
    "curation_quality_percentile",
    "corpus_stats_card",
    # pipeline / streaming tail
    "schema_evolution_merge_read",
    "stream_quarantine_split",
)


def _ordered() -> list[QuerySpec]:
    _load_all()
    head = [_REGISTRY[n] for n in _DRIVER_WINDOW if n in _REGISTRY]
    in_head = set(_DRIVER_WINDOW)
    tail = [s for n, s in _REGISTRY.items() if n not in in_head]
    return head + tail


def all_queries() -> dict[str, QueryFn]:
    return {spec.name: spec.fn for spec in _ordered()}


def all_oracles() -> dict[str, str]:
    return {spec.name: spec.oracle for spec in _ordered() if spec.oracle is not None}
