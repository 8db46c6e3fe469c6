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
    )


# The external driver hard-checks only the FIRST 50 entries of
# ``queries()`` against their DuckDB oracles. This explicit window
# guarantees at least one oracled query per SURVEY §2 family AND per
# north-star (§2.11) family lands inside it, independent of module
# import order. Everything else follows in registration order and is
# still covered by the builder-side parity gate (tests/test_parity.py,
# all queries).
#
# Round-4 rotation (VERDICT r3 #1): 24 family anchors stay, and 26
# slots rotate to queries that never earned a driver-side CORRECTNESS
# row in rounds 1-3 (the curation nine, the span/keep-best/incremental
# dedup ops, the stream-stream join, SCD2, OHLC, funnel, band-range
# join, skew/layout, and the window-function tail). Every rotated-OUT
# query keeps its exact DuckDB oracle in tests/test_parity.py, so
# nothing loses correctness coverage — it converts builder-side trust
# into driver-side proof for the tail.
_DRIVER_WINDOW: tuple[str, ...] = (
    # -- anchors (driver-green in r1-r3, one per SURVEY §2 family) --
    "flagship_data_query",
    "json_field_predicate",
    "star_join_3way",
    "lookup_join_get_or_create",
    "dedup_last_write_wins",
    "group_to_nested",
    "quality_expectations",
    "limit_offset_pagination",
    "union_by_name_harmonized",
    # ST3 slot: stream_lookback_upsert earned its driver row in r3;
    # the slot now proves the SNK4∘ST3 composition (round-4 addition,
    # never driver-checked; lookback upsert stays in the parity gate).
    "stream_gie_delete_reload",
    "sql_topn_revenue_report",
    "series_id_slug",
    "date_chunk_fanout",
    "value_clean_gauntlet",
    "melt_wide_to_long",
    "json_key_melt_nested",
    "field_profile",
    "bronze_zero_loss_roundtrip",
    "silver_upsert_idempotent",
    "export_csv_roundtrip",
    "stream_stateful_stats",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "multimodal_features",
    # -- first-time driver-checked this round --
    # relational / aggregate / window tail
    "grouping_sets_priority_status",
    "band_range_join",
    "rolling_time_average",
    "latest_event_per_user",
    "cohort_monthly_retention",
    "funnel_conversion",
    "daily_ohlc_downsample",
    "scd2_user_state_history",
    # sinks / ingest / layout
    "jsonl_ingest_quarantine",
    "compaction_roundtrip",
    "salted_skew_aggregate",
    # streaming
    "stream_stream_interval_join",
    # X1 dedup tail
    "dedup_span_exact",
    "dedup_keep_best",
    "dedup_incremental_batch",
    # X3 text tail
    "text_token_count",
    "text_unigram_logprob",
    # curation nine (§2.11)
    "curation_contamination",
    "curation_pack_sequences",
    "curation_quality_rules",
    "curation_shuffle_rank",
    "curation_weighted_sample",
    "curation_mixture_weights",
    "curation_mixture_apply",
    "curation_domain_cap",
    "curation_end_to_end",
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
