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
# Round-10 rotation (VERDICT r9 #2): CORRECTNESS_r09.json landed
# (46 exact + 4 rows-only-by-design, zero failures), so the window
# rotates. The 9 anchors stay; rotating IN:
#   - ann_lsh_signed — REGISTERED this round (VERDICT r9 #7: the LSH
#     ANN family's exact-oracled member, deterministic sign-signature
#     partitioner), earning its first driver row in its own round;
#   - 4 touched-this-round re-certifications: pivot_long_to_wide
#     (plan changed — spread_scan now counts parquet row groups,
#     closing the r9 superlinear probe flag), unigram_lm_train_vocab
#     and unigram_lm_segment_words (Viterbi backpointers repacked
#     into a constant-size BIGINT; results identical by parity, the
#     driver row re-proves it), bloom_pruned_join_revenue (the r9
#     probe watch item — ratio halved by the row-group fix);
#   - every remaining r3/r4-checked row: the r3 scalar trio that
#     yielded slots in r9 (date_parse_coerce, series_id_reverse_parse,
#     null_invalid_value_filter) plus the other four r3 rows and all
#     26 r4-era rows;
#   - 2 of the oldest r5 rows plus silver_upsert_atomic_versioned
#     (registered this round: the Iceberg-shaped atomic-commit upsert,
#     pipeline/versioned.py) to fill the window.
# The 4 rows-only-by-design approximations (ann_ivfpq,
# ann_lsh_bucketed, approx_distinct_users,
# approx_percentiles_tdigest) stay OUT per VERDICT r9 #2 — results
# unchanged, fresh r9 rows, pytest ground-truth bounds. Every
# windowed query has an exact DuckDB oracle. After this window runs,
# the stalest driver row anywhere is r5-era.
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
    # -- registered this round: first driver row --
    "ann_lsh_signed",
    # -- touched this round: re-certification --
    "pivot_long_to_wide",
    "unigram_lm_train_vocab",
    "unigram_lm_segment_words",
    "bloom_pruned_join_revenue",
    # -- stalest re-verification: rows last checked in r3 --
    "date_parse_coerce",
    "series_id_reverse_parse",
    "null_invalid_value_filter",
    "text_pii_scrub",
    "text_quality_langid",
    "topn_recency",
    "window_functions",
    # -- stalest re-verification: rows last checked in r4 --
    "band_range_join",
    "cohort_monthly_retention",
    "compaction_roundtrip",
    "curation_contamination",
    "curation_domain_cap",
    "curation_end_to_end",
    "curation_mixture_apply",
    "curation_mixture_weights",
    "curation_pack_sequences",
    "curation_quality_rules",
    "curation_shuffle_rank",
    "curation_weighted_sample",
    "daily_ohlc_downsample",
    "dedup_incremental_batch",
    "dedup_keep_best",
    "dedup_span_exact",
    "funnel_conversion",
    "grouping_sets_priority_status",
    "jsonl_ingest_quarantine",
    "latest_event_per_user",
    "rolling_time_average",
    "salted_skew_aggregate",
    "scd2_user_state_history",
    "stream_stream_interval_join",
    "text_token_count",
    "text_unigram_logprob",
    # -- registered this round: first driver row --
    "silver_upsert_atomic_versioned",
    # -- oldest r5 rows filling the window --
    "anomaly_mad_outliers",
    "approx_percentiles_sampled",
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
