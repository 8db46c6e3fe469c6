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
# Round-13 rotation (VERDICT r12 #1): CORRECTNESS_r12.json landed
# 50/50 exact-green (zero failures), so the window rotates. The 9
# anchors stay; rotating IN:
#   - the FULL r8-era cohort (28 rows — the stalest anywhere after
#     the r12 window), starting with the 4 fillers the r12 versioned
#     family displaced (ccnet_perplexity_buckets,
#     cms_heavy_hitters_merge, contamination_source_matrix,
#     dedup_cluster_stats);
#   - the 4 rows-only-by-design approximations for their periodic
#     rows-only refresh (each has an exact-oracled twin and
#     pytest-pinned recall/error bounds; last refreshed r11);
#   - 1 first driver row: silver_versioned_time_prune (REGISTERED
#     this round: sub-day observation_time pruning on manifest stats,
#     VERDICT r12 #4);
#   - 2 touched-this-round re-certifications of r12 greens whose
#     kernels were reshaped: gie_rest_datasource_melt (the reader
#     gained the authenticated paginated http transport and its read
#     loop changed, ADVICE r12 medium) and silver_versioned_stats_prune
#     (stats collection moved to a parallelized footer job and the
#     stats schema gained observation_time, VERDICT r12 #3/#4);
#   - the 6 alphabetically-first r9-era rows to fill the window.
# After this window runs, the union staleness ceiling moves to r9.
# Rotating OUT: the r12 greens (re-proven last round) and the r7-era
# rows re-certified in r12.
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
    # -- first driver row (registered this round) --
    "silver_versioned_time_prune",
    # -- touched this round: re-certification --
    "gie_rest_datasource_melt",
    "silver_versioned_stats_prune",
    # -- rows-only periodic refresh (exact twins stay oracled) --
    "ann_ivfpq",
    "ann_lsh_bucketed",
    "approx_distinct_users",
    "approx_percentiles_tdigest",
    # -- stalest re-verification: the full r8-era cohort --
    "ccnet_perplexity_buckets",
    "cms_heavy_hitters_merge",
    "contamination_source_matrix",
    "dedup_cluster_stats",
    "dedup_last_write_wins",
    "dedup_semantic_buckets",
    "dsir_importance_select",
    "graph_pagerank",
    "group_to_nested",
    "json_field_predicate",
    "json_roundtrip",
    "kanonymity_audit",
    "limit_offset_pagination",
    "multimodal_resize_grid",
    "observe_ingest_metrics",
    "projection_computed",
    "quality_expectations",
    "quality_model_score",
    "range_scan_history",
    "selection_pipeline_summary",
    "series_id_slug",
    "stream_heavy_hitters_cms",
    "stream_lookback_upsert",
    "stream_rest_datasource_ingest",
    "tfidf_top_terms",
    "training_shard_incremental",
    "training_shard_manifest",
    "zipf_token_slope",
    # -- oldest r9 rows filling the window --
    "ann_index_incremental",
    "ann_ivf",
    "ann_ivfpq_kcenter",
    "ann_pq",
    "asof_join_latest_view",
    "coreset_kcenter_select",
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


def reset_model_seams() -> None:
    """Clear every session-scoped compute-once model cache (BPE,
    unigram, k-center, PQ codebooks, classifier, planted components).
    Queries stay correct with warm seams — the caches hold pure
    functions of (corpus, params) — but MEASUREMENT needs cold ones:
    the bench scale probe compares a fresh scaled-dir run against a
    base run, and a warm base seam makes a perfectly linear trainer
    look superlinear (cold-vs-warm, the r8 unigram probe flag)."""
    _load_all()
    from gas_data_pipeline_spark.suite import (
        curation_suite,
        northstar,
        selection_suite,
    )

    def _release(cache: dict) -> None:
        # localCheckpointed entries hold executor cache blocks; dropping
        # the dict entry alone would leave them to GC (ADVICE r9). The
        # PERSISTED RDD is the LogicalRDD's internal one — `df.rdd`
        # would build a NEW deserialized RDD whose unpersist is a no-op
        # — so reach it through the analyzed plan. Safe only because
        # reset drops every seam reference together: nothing re-reads
        # a truncated-lineage Dataset whose blocks are gone.
        from pyspark.sql import DataFrame

        for val in cache.values():
            parts = val if isinstance(val, (tuple, list)) else (val,)
            for part in parts:
                if isinstance(part, DataFrame):
                    try:
                        plan = part._jdf.queryExecution().analyzed()
                        if plan.getClass().getSimpleName() == "LogicalRDD":
                            plan.rdd().unpersist(False)
                    except Exception:
                        pass
        cache.clear()

    _release(curation_suite._BPE_CACHE)
    _release(curation_suite._UNIGRAM_CACHE)
    selection_suite._KCENTER_CACHE.clear()
    selection_suite._QCLF_CACHE.clear()
    northstar._COMPONENTS_CACHE.clear()
    northstar._PQ_BOOK_CACHE.clear()
    _release(northstar._IVF_INDEX_CACHE)
    _release(northstar._PQ_CODES_CACHE)
    _release(northstar._IVFPQ_INDEX_CACHE)
