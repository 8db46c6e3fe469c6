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
# Round-8 rotation (VERDICT r7 #1): CORRECTNESS_r07.json landed
# (49/50 green, 1 harness-compat red), so the window rotates. The 9
# anchors stay; the 41 r7-greened entries rotate OUT (their exact
# DuckDB oracles remain in tests/test_parity.py); rotating IN:
#   - all 20 queries that have never had a driver-side CORRECTNESS
#     row — the full X9 data-selection and X10 corpus-selection
#     families (ann_index_incremental, bpe_encode_corpus,
#     ccnet_perplexity_buckets, cms_heavy_hitters_merge,
#     contamination_source_matrix, coreset_kcenter_select,
#     dsir_importance_select, kanonymity_audit,
#     observe_ingest_metrics, quality_classifier_filter,
#     quality_classifier_train, quality_model_score,
#     selection_pipeline_summary, stream_heavy_hitters_cms,
#     stream_rest_datasource_ingest, training_shard_incremental,
#     training_shard_manifest, unigram_lm_segment_words,
#     unigram_lm_train_vocab, zipf_token_slope);
#   - multimodal_resize_grid, re-shaped to scalar (doc_id, i, j, v)
#     rows after its r7 driver-compare crash on a raw array<double>
#     column (no windowed query may output array/struct/map columns
#     — enforced by tests/test_registry.py);
#   - the four vs-r6 bench-regression watch queries not already
#     anchored (dedup_semantic_buckets, dedup_cluster_stats,
#     approx_distinct_portable_hll, bloom_pruned_join_revenue), so
#     their r8 rows double as still-green evidence;
#   - ann_ivf, which gained an exact DuckDB oracle this round
#     (deterministic k-center coarse quantizer — VERDICT r7 #9);
#   - 15 re-verification slots for r1-r5-era greens across the
#     macro-families (hourly_pipeline_e2e per VERDICT r7 #7, plus
#     pivot_long_to_wide, graph_pagerank, tfidf_top_terms and the
#     relational/pipeline tail below).
# Every windowed query this round has an exact DuckDB oracle — the
# rows-only set (ann_pq, ann_ivfpq, ann_lsh_bucketed,
# approx_distinct_users, approx_percentiles_tdigest — all with pytest
# ground-truth bounds) sits entirely outside the window, and each of
# those earned its driver rows-only row in r1-r7. After this round,
# union(r1..r8 driver rows) == all 177 registered names.
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
    # -- X9 data selection + X10 corpus selection (first driver rows) --
    "dsir_importance_select",
    "cms_heavy_hitters_merge",
    "zipf_token_slope",
    "quality_model_score",
    "selection_pipeline_summary",
    "ccnet_perplexity_buckets",
    "coreset_kcenter_select",
    "quality_classifier_train",
    "quality_classifier_filter",
    "ann_index_incremental",
    "bpe_encode_corpus",
    "unigram_lm_train_vocab",
    "unigram_lm_segment_words",
    "contamination_source_matrix",
    "training_shard_manifest",
    "training_shard_incremental",
    "stream_heavy_hitters_cms",
    "stream_rest_datasource_ingest",
    "observe_ingest_metrics",
    "kanonymity_audit",
    # -- r7 driver red, re-shaped to scalar rows --
    "multimodal_resize_grid",
    # -- vs-r6 bench-regression watch: re-green under the r8 driver --
    "dedup_semantic_buckets",
    "dedup_cluster_stats",
    "approx_distinct_portable_hll",
    "bloom_pruned_join_revenue",
    # -- newly exact-oracled this round --
    "ann_ivf",
    # -- re-verification of r1-r5-era greens --
    "hourly_pipeline_e2e",
    "pivot_long_to_wide",
    "graph_pagerank",
    "tfidf_top_terms",
    "stream_lookback_upsert",
    "dedup_last_write_wins",
    "group_to_nested",
    "quality_expectations",
    "json_field_predicate",
    "limit_offset_pagination",
    "series_id_slug",
    "range_scan_history",
    "anti_join_delete",
    "json_roundtrip",
    "projection_computed",
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
