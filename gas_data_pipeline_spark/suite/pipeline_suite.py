"""Driver-facing queries exercising the lakehouse write path
(SURVEY §2.1 SNK1/SNK2/SNK5 + §3.2 lifecycle): each query performs a
real write to a scratch directory, reads the result back, and returns
a DataFrame the DuckDB oracle can reproduce from the source tables —
proving the write path is lossless/idempotent, not just that it runs.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gas_data_pipeline_spark.catalog import table
from gas_data_pipeline_spark.pipeline.bronze import bronze_append, read_bronze
from gas_data_pipeline_spark.pipeline.exports import export_csv
from gas_data_pipeline_spark.pipeline.silver import upsert_observations
from gas_data_pipeline_spark.registry import register


def _scratch() -> str:
    d = tempfile.mkdtemp(prefix="gas_pipeline_scratch_")
    shutil.rmtree(d, ignore_errors=True)  # writers create it themselves
    return d


@register(
    "bronze_zero_loss_roundtrip",
    oracle="""
        SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey,
               o_orderstatus, o_orderpriority
        FROM orders
    """,
)
def bronze_zero_loss_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNK1 + the reference's only test idea (test.py:1-18): source
    batch -> bronze JSON envelope -> physical append -> read back ->
    re-extract payload fields == source. Zero-loss, through disk."""
    path = _scratch()
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    bronze_append(o, dataset_id="ORDERS", source="testdata", path=path)
    back = read_bronze(spark, path, dataset_id="ORDERS")
    return back.select(
        F.get_json_object("raw_payload", "$.o_orderkey").alias("o_orderkey"),
        F.get_json_object("raw_payload", "$.o_orderstatus").alias("o_orderstatus"),
        F.get_json_object("raw_payload", "$.o_orderpriority").alias("o_orderpriority"),
    )


@register(
    "silver_upsert_idempotent",
    oracle="""
        SELECT series_id, observation_time, value
        FROM (
            SELECT 'NG_EVENTS_' || CAST(user_id AS VARCHAR) AS series_id,
                   date_trunc('hour', ts) AS observation_time,
                   CAST(value AS DOUBLE) AS value,
                   row_number() OVER (
                       PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        ) WHERE rn = 1
    """,
)
def silver_upsert_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNK2: the same batch upserted TWICE into a fresh silver table
    must equal one clean last-write-wins dedup of the source — the
    ``ON CONFLICT DO UPDATE`` idempotency contract (reference
    loader.py:7-35), through disk, with dynamic partition overwrite."""
    path = _scratch()
    e = table(spark, sf_dir, "events")
    batch = e.select(
        F.concat(F.lit("NG_EVENTS_"), F.col("user_id").cast("string")).alias(
            "series_id"
        ),
        F.date_trunc("hour", F.col("ts")).alias("observation_time"),
        F.col("value").cast("double").alias("value"),
        F.col("ts").alias("ingestion_time"),
        F.col("event_id"),
    )
    upsert_observations(spark, batch, path, order_cols=["ingestion_time", "event_id"])
    upsert_observations(spark, batch, path, order_cols=["ingestion_time", "event_id"])
    return spark.read.parquet(path).select("series_id", "observation_time", "value")


@register(
    "silver_upsert_atomic_versioned",
    oracle="""
        SELECT series_id, observation_time, value
        FROM (
            SELECT 'NG_EVENTS_' || CAST(user_id AS VARCHAR) AS series_id,
                   date_trunc('hour', ts) AS observation_time,
                   CAST(value AS DOUBLE) AS value,
                   row_number() OVER (
                       PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        ) WHERE rn = 1
    """,
)
def silver_upsert_atomic_versioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNK2, atomic-commit variant (pipeline/versioned.py — the
    Iceberg-shaped write-audit-publish closing the table-format gap):
    a provisional upsert of the even-id half (v1), then the full
    batch twice (v2, v3 — idempotency through the versioned path).
    Every key in v1 also appears in the full batch and the new batch
    wins on key collision, so the CURRENT snapshot equals one clean
    last-write-wins dedup of the source — same contract (and oracle)
    as silver_upsert_idempotent, but each commit is a single atomic
    manifest rename and untouched partitions are structurally shared
    across versions instead of rewritten."""
    from gas_data_pipeline_spark.pipeline.versioned import (
        read_observations_versioned,
        upsert_observations_versioned,
    )

    root = _scratch()
    e = table(spark, sf_dir, "events")

    def page(df):
        return df.select(
            F.concat(
                F.lit("NG_EVENTS_"), F.col("user_id").cast("string")
            ).alias("series_id"),
            F.date_trunc("hour", F.col("ts")).alias("observation_time"),
            F.col("value").cast("double").alias("value"),
            F.col("ts").alias("ingestion_time"),
            F.col("event_id"),
        )

    order = ["ingestion_time", "event_id"]
    upsert_observations_versioned(
        spark, page(e.filter(F.col("event_id") % 2 == 0)), root, order_cols=order
    )
    upsert_observations_versioned(spark, page(e), root, order_cols=order)
    upsert_observations_versioned(spark, page(e), root, order_cols=order)
    return read_observations_versioned(spark, root).select(
        "series_id", "observation_time", "value"
    )


@register(
    "silver_versioned_time_travel",
    oracle="""
        SELECT series_id, observation_time, value
        FROM (
            SELECT 'NG_EVENTS_' || CAST(user_id AS VARCHAR) AS series_id,
                   date_trunc('hour', ts) AS observation_time,
                   CAST(value AS DOUBLE) AS value,
                   row_number() OVER (
                       PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
            WHERE event_id % 2 = 0
        ) WHERE rn = 1
    """,
)
def silver_versioned_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel on the versioned silver store (pipeline/versioned.py:
    every commit keeps its manifest as ``manifest-v<N>.json``, so any
    past snapshot stays readable until vacuumed past retention — the
    Iceberg ``VERSION AS OF`` contract): commit the even-id half (v1),
    then the FULL batch (v2, which rewrites every partition v1 touched),
    then read ``version=1`` back. The pinned read must reproduce the
    even-half dedup EXACTLY — none of v2's odd-id rows may leak in, and
    none of v1's rows may be lost to v2's overwrite, because v2's data
    landed in its own version directory and v1's manifest still points
    at v1's files (structural sharing cuts the other way too: a v2
    commit touching NO v1 partition would share v1's directories).
    The current snapshot is proven separately by
    silver_upsert_atomic_versioned; this query pins the history side
    of the same commit protocol."""
    from gas_data_pipeline_spark.pipeline.versioned import (
        read_observations_versioned,
        upsert_observations_versioned,
    )

    root = _scratch()
    e = table(spark, sf_dir, "events")

    def page(df):
        return df.select(
            F.concat(
                F.lit("NG_EVENTS_"), F.col("user_id").cast("string")
            ).alias("series_id"),
            F.date_trunc("hour", F.col("ts")).alias("observation_time"),
            F.col("value").cast("double").alias("value"),
            F.col("ts").alias("ingestion_time"),
            F.col("event_id"),
        )

    order = ["ingestion_time", "event_id"]
    upsert_observations_versioned(
        spark, page(e.filter(F.col("event_id") % 2 == 0)), root, order_cols=order
    )
    upsert_observations_versioned(spark, page(e), root, order_cols=order)
    return read_observations_versioned(spark, root, version=1).select(
        "series_id", "observation_time", "value"
    )


@register(
    "silver_versioned_changelog",
    oracle="""
        WITH page AS (
            SELECT 'NG_EVENTS_' || CAST(user_id AS VARCHAR) AS series_id,
                   date_trunc('hour', ts) AS observation_time,
                   CAST(value AS DOUBLE) AS value,
                   ts AS ingestion_time,
                   event_id
            FROM events
        ),
        v1 AS (
            SELECT * FROM (
                SELECT p.*, row_number() OVER (
                           PARTITION BY series_id, observation_time
                           ORDER BY ingestion_time DESC, event_id DESC
                       ) AS rn
                FROM page p WHERE event_id % 2 = 0
            ) WHERE rn = 1
        ),
        v2 AS (
            SELECT * FROM (
                SELECT p.*, row_number() OVER (
                           PARTITION BY series_id, observation_time
                           ORDER BY ingestion_time DESC, event_id DESC
                       ) AS rn
                FROM page p
            ) WHERE rn = 1
        ),
        leg1 AS (
            SELECT CAST(1 AS BIGINT) AS from_version,
                   COALESCE(o.series_id, n.series_id) AS series_id,
                   COALESCE(o.observation_time, n.observation_time)
                       AS observation_time,
                   CASE WHEN o.event_id IS NULL THEN 'insert'
                        WHEN n.event_id IS NULL THEN 'delete'
                        ELSE 'update' END AS change_type,
                   CASE WHEN o.event_id IS NULL OR n.event_id IS NULL
                        THEN CAST(0 AS BIGINT)
                        ELSE CAST(
                            (CASE WHEN o.value IS DISTINCT FROM n.value
                                  THEN 1 ELSE 0 END)
                          + (CASE WHEN o.ingestion_time IS DISTINCT FROM
                                       n.ingestion_time THEN 1 ELSE 0 END)
                          + (CASE WHEN o.event_id IS DISTINCT FROM n.event_id
                                  THEN 1 ELSE 0 END)
                          + (CASE WHEN CAST(o.observation_time AS DATE)
                                       IS DISTINCT FROM
                                       CAST(n.observation_time AS DATE)
                                  THEN 1 ELSE 0 END)
                        AS BIGINT) END AS n_changed_cols
            FROM v1 o
            FULL OUTER JOIN v2 n
              ON o.series_id = n.series_id
             AND o.observation_time = n.observation_time
            WHERE o.event_id IS NULL OR n.event_id IS NULL
               OR o.value IS DISTINCT FROM n.value
               OR o.ingestion_time IS DISTINCT FROM n.ingestion_time
               OR o.event_id IS DISTINCT FROM n.event_id
        ),
        leg2 AS (
            SELECT CAST(2 AS BIGINT) AS from_version,
                   series_id, observation_time,
                   'update' AS change_type,
                   CAST(1 AS BIGINT) AS n_changed_cols
            FROM v2
            WHERE CAST(observation_time AS DATE) =
                  (SELECT min(CAST(ts AS DATE)) FROM events)
        )
        SELECT * FROM leg1 UNION ALL SELECT * FROM leg2
    """,
)
def silver_versioned_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog (CDC) read on the versioned silver store — Iceberg's
    incremental scan built on the manifests the store already keeps
    (pipeline/versioned.py:changelog_versioned). Three commits: v1 =
    the even-id half, v2 = the full batch, v3 = ONLY the earliest
    date's rows with their values bumped. Leg 1 (v1 -> v2) derives the
    insert/update feed of the full-batch overwrite; leg 2 (v2 -> v3)
    is the scale story: the manifests agree on every partition except
    the bumped date, so the changelog prunes to that single partition
    at the METADATA level — at 100 TB an hourly commit's changelog
    reads the churned dates, never the table (the skip is pinned by
    inputFiles in tests/test_pipeline.py). Row diff = one full-outer
    key join per leg over the churned subset only
    (pipeline/diff.snapshot_diff)."""
    from gas_data_pipeline_spark.pipeline.versioned import (
        changelog_versioned,
        upsert_observations_versioned,
    )

    root = _scratch()
    e = table(spark, sf_dir, "events")

    def page(df):
        return df.select(
            F.concat(
                F.lit("NG_EVENTS_"), F.col("user_id").cast("string")
            ).alias("series_id"),
            F.date_trunc("hour", F.col("ts")).alias("observation_time"),
            F.col("value").cast("double").alias("value"),
            F.col("ts").alias("ingestion_time"),
            F.col("event_id"),
        )

    order = ["ingestion_time", "event_id"]
    upsert_observations_versioned(
        spark, page(e.filter(F.col("event_id") % 2 == 0)), root, order_cols=order
    )
    upsert_observations_versioned(spark, page(e), root, order_cols=order)
    # v3 touches exactly one partition: the earliest date, values
    # bumped so every winner row changes in place. The min is a
    # metadata-sized scalar (one aggregate row), not a data collect.
    min_day = e.agg(F.min(F.to_date("ts"))).collect()[0][0]
    # Null/NaN-proof bump (ADVICE r11): a null value would make
    # value+100 stay null, comparing EQUAL under eqNullSafe — the diff
    # would drop the row while the leg-2 oracle (which declares every
    # min-day winner an update) keeps it. nanvl+coalesce guarantees
    # every winner's value genuinely changes, data notwithstanding.
    bumped = page(e.filter(F.to_date("ts") == F.lit(min_day))).withColumn(
        "value",
        F.coalesce(F.nanvl(F.col("value"), F.lit(0.0)), F.lit(0.0))
        + F.lit(100.0),
    )
    upsert_observations_versioned(spark, bumped, root, order_cols=order)

    def leg(from_v, to_v):
        return changelog_versioned(spark, root, from_v, to_v).select(
            F.lit(from_v).cast("bigint").alias("from_version"),
            "series_id",
            "observation_time",
            "change_type",
            "n_changed_cols",
        )

    return leg(1, 2).unionByName(leg(2, 3))


@register(
    "silver_versioned_lifecycle_e2e",
    oracle="""
        WITH page AS (
            SELECT 'NG_EVENTS_' || CAST(user_id AS VARCHAR) AS series_id,
                   date_trunc('hour', ts) AS observation_time,
                   CAST(value AS DOUBLE) AS value,
                   ts AS ingestion_time,
                   event_id
            FROM events
        ),
        v AS (
            SELECT * FROM (
                SELECT p.*, row_number() OVER (
                           PARTITION BY series_id, observation_time
                           ORDER BY ingestion_time DESC, event_id DESC
                       ) AS rn
                FROM page p
            ) WHERE rn = 1
        ),
        d0 AS (SELECT min(CAST(ts AS DATE)) AS d FROM events),
        d1 AS (
            SELECT min(CAST(ts AS DATE)) AS d FROM events
            WHERE CAST(ts AS DATE) > (SELECT d FROM d0)
        )
        SELECT series_id, observation_time, value,
               CASE WHEN CAST(observation_time AS DATE) = (SELECT d FROM d0)
                    THEN CASE WHEN value >= 50 THEN 'good' ELSE 'poor' END
                    ELSE NULL END AS quality_flag
        FROM v
        WHERE NOT COALESCE(
            CAST(observation_time AS DATE) = (SELECT d FROM d1)
            AND value < 50.0, FALSE)
    """,
)
def silver_versioned_lifecycle_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE table format composed in one lifecycle (round 12):
    v1 = full-batch commit, v2 = schema-evolving single-date commit
    (quality_flag on the earliest date, written FRAGMENTED — the
    incremental-writer steady state; every other partition
    structurally shared under the manifest-declared evolved schema),
    v3 = copy-on-write DELETE (second date's sub-50 values; only that
    partition rewrites), v4 = bin-packed COMPACTION (layout only,
    rewriting exactly the fragmented evolved partition). The final
    read must surface all four commits composed —
    evolved column with computed values on d0 and nulls elsewhere,
    d1's deletions applied, compaction invisible — which is exactly
    what this oracle states declaratively over the raw events. The
    'changelog across a compaction is EMPTY' invariant and the
    per-version time-travel ladder are pinned in
    tests/test_pipeline.py."""
    from gas_data_pipeline_spark.pipeline.versioned import (
        compact_versioned,
        delete_versioned,
        read_observations_versioned,
        upsert_observations_versioned,
    )

    root = _scratch()
    e = table(spark, sf_dir, "events")

    def page(df):
        return df.select(
            F.concat(
                F.lit("NG_EVENTS_"), F.col("user_id").cast("string")
            ).alias("series_id"),
            F.date_trunc("hour", F.col("ts")).alias("observation_time"),
            F.col("value").cast("double").alias("value"),
            F.col("ts").alias("ingestion_time"),
            F.col("event_id"),
        )

    order = ["ingestion_time", "event_id"]
    upsert_observations_versioned(spark, page(e), root, order_cols=order)
    d0 = e.agg(F.min(F.to_date("ts"))).collect()[0][0]
    d1 = (
        e.filter(F.to_date("ts") > F.lit(d0))
        .agg(F.min(F.to_date("ts")))
        .collect()[0][0]
    )
    evolved = page(e.filter(F.to_date("ts") == F.lit(d0))).withColumn(
        "quality_flag",
        F.when(F.col("value") >= 50, F.lit("good")).otherwise(F.lit("poor")),
    )
    # Fragment ONLY the evolved commit's partition (the incremental-
    # writer steady state, scoped so the harness cost stays the one
    # partition compaction will rewrite — fragmenting the whole v1
    # table measured 24.7 s at sf0.1, all harness).
    key = "spark.sql.files.maxRecordsPerFile"
    old = spark.conf.get(key, "0")
    spark.conf.set(key, "200")
    try:
        upsert_observations_versioned(spark, evolved, root, order_cols=order)
    finally:
        spark.conf.set(key, old)
    delete_versioned(
        spark,
        root,
        (F.to_date("observation_time") == F.lit(d1)) & (F.col("value") < 50.0),
    )
    compact_versioned(spark, root, target_bytes=256 * 1024)
    return read_observations_versioned(spark, root).select(
        "series_id", "observation_time", "value", "quality_flag"
    )


@register(
    "silver_versioned_delete",
    oracle="""
        WITH v AS (
            SELECT * FROM (
                SELECT 'NG_EVENTS_' || CAST(user_id AS VARCHAR) AS series_id,
                       date_trunc('hour', ts) AS observation_time,
                       CAST(value AS DOUBLE) AS value,
                       row_number() OVER (
                           PARTITION BY user_id, date_trunc('hour', ts)
                           ORDER BY ts DESC, event_id DESC
                       ) AS rn
                FROM events
            ) WHERE rn = 1
        ),
        d0 AS (SELECT min(CAST(ts AS DATE)) AS d FROM events)
        SELECT series_id, observation_time, value
        FROM v
        WHERE NOT COALESCE(
            CAST(observation_time AS DATE) = (SELECT d FROM d0)
            AND value < 50.0, FALSE)
    """,
)
def silver_versioned_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE as a commit (round 12 — Delta/Iceberg
    copy-on-write DELETE; pipeline/versioned.py:delete_versioned):
    commit the full batch, then delete min-date rows with value < 50.
    Only the matched date's partition rewrites (one scan finds the
    affected partitions, the rewrite touches exactly those —
    structural sharing keeps every other date's directory); the
    pre-delete snapshot stays time-travelable; NULL-evaluating
    predicates KEEP their rows (SQL DELETE three-valued logic, which
    the oracle mirrors with NOT COALESCE(pred, FALSE)). The publish is
    the same CAS-fenced manifest swap as any writer's."""
    from gas_data_pipeline_spark.pipeline.versioned import (
        delete_versioned,
        read_observations_versioned,
        upsert_observations_versioned,
    )

    root = _scratch()
    e = table(spark, sf_dir, "events")
    page = e.select(
        F.concat(
            F.lit("NG_EVENTS_"), F.col("user_id").cast("string")
        ).alias("series_id"),
        F.date_trunc("hour", F.col("ts")).alias("observation_time"),
        F.col("value").cast("double").alias("value"),
        F.col("ts").alias("ingestion_time"),
        F.col("event_id"),
    )
    upsert_observations_versioned(
        spark, page, root, order_cols=["ingestion_time", "event_id"]
    )
    min_day = e.agg(F.min(F.to_date("ts"))).collect()[0][0]
    delete_versioned(
        spark,
        root,
        (F.to_date("observation_time") == F.lit(min_day))
        & (F.col("value") < 50.0),
    )
    return read_observations_versioned(spark, root).select(
        "series_id", "observation_time", "value"
    )


@register(
    "silver_versioned_incremental_rollup",
    oracle="""
        WITH v2 AS (
            SELECT * FROM (
                SELECT 'NG_EVENTS_' || CAST(user_id AS VARCHAR) AS series_id,
                       date_trunc('hour', ts) AS observation_time,
                       CAST(value AS DOUBLE) AS value,
                       row_number() OVER (
                           PARTITION BY user_id, date_trunc('hour', ts)
                           ORDER BY ts DESC, event_id DESC
                       ) AS rn
                FROM events
            ) WHERE rn = 1
        )
        SELECT series_id,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM v2
        GROUP BY series_id
    """,
)
def silver_versioned_incremental_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The materialized-view half of the table format (round 12):
    a per-series count/sum rollup built from snapshot v1 (the even-id
    half) is maintained to v2 (the full batch) by folding the SIGNED
    changelog between the two commits
    (pipeline/versioned.py:changelog_delta_versioned — the
    retract/add feed over CHURNED partitions only, manifest-pruned) —
    no fact rescan ever happens, yet the oracle is the full recompute
    over v2 and the maintained result must be indistinguishable from
    it. At 100 TB an hourly commit's rollup refresh costs the churn:
    the delta feed aggregates map-side to group grain before one
    churn-sized merge join (pipeline/diff.apply_delta_to_rollup).
    Sums ride decimal so addition order can't drift from the
    recompute."""
    from gas_data_pipeline_spark.pipeline.diff import apply_delta_to_rollup
    from gas_data_pipeline_spark.pipeline.versioned import (
        changelog_delta_versioned,
        read_observations_versioned,
        upsert_observations_versioned,
    )

    root = _scratch()
    e = table(spark, sf_dir, "events")

    def page(df):
        return df.select(
            F.concat(
                F.lit("NG_EVENTS_"), F.col("user_id").cast("string")
            ).alias("series_id"),
            F.date_trunc("hour", F.col("ts")).alias("observation_time"),
            F.col("value").cast("double").alias("value"),
            F.col("ts").alias("ingestion_time"),
            F.col("event_id"),
        )

    order = ["ingestion_time", "event_id"]
    upsert_observations_versioned(
        spark, page(e.filter(F.col("event_id") % 2 == 0)), root, order_cols=order
    )
    upsert_observations_versioned(spark, page(e), root, order_cols=order)

    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    rollup_v1 = (
        read_observations_versioned(spark, root, version=1)
        .withColumn("sum_value", dec("value"))
        .groupBy("series_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("sum_value").alias("sum_value"),
        )
    )
    deltas = changelog_delta_versioned(
        spark, root, 1, 2, cols=["value"]
    ).withColumn("sum_value", dec("value"))
    maintained = apply_delta_to_rollup(
        rollup_v1,
        deltas,
        group_cols=["series_id"],
        sum_cols=["sum_value"],
        count_col="n_rows",
    )
    return maintained.select(
        "series_id",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("sum_value").cast("double").alias("sum_value"),
    )


@register(
    "silver_versioned_compaction",
    oracle="""
        SELECT series_id, observation_time, value
        FROM (
            SELECT 'NG_EVENTS_' || CAST(user_id AS VARCHAR) AS series_id,
                   date_trunc('hour', ts) AS observation_time,
                   CAST(value AS DOUBLE) AS value,
                   row_number() OVER (
                       PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        ) WHERE rn = 1
    """,
)
def silver_versioned_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction as a COMMIT on the versioned store (round 12 —
    Iceberg's rewrite_data_files; pipeline/versioned.py:
    compact_versioned): the initial commit is forced to fragment
    (maxRecordsPerFile caps the merge write, the state an incremental
    writer reaches at scale once dates span many files), compaction
    rewrites the fragmented partitions into one sorted file each and
    publishes the layout change as a normal CAS-fenced snapshot —
    content exactly preserved (this oracle), old versions still
    time-travelable (structural sharing), stats refreshed from the new
    footers. Cost is the rewritten partitions only, never the table.
    File-count and pinned-read invariants live in
    tests/test_pipeline.py."""
    from gas_data_pipeline_spark.pipeline.versioned import (
        compact_versioned,
        read_observations_versioned,
        upsert_observations_versioned,
    )

    root = _scratch()
    e = table(spark, sf_dir, "events")
    page = e.select(
        F.concat(
            F.lit("NG_EVENTS_"), F.col("user_id").cast("string")
        ).alias("series_id"),
        F.date_trunc("hour", F.col("ts")).alias("observation_time"),
        F.col("value").cast("double").alias("value"),
        F.col("ts").alias("ingestion_time"),
        F.col("event_id"),
    )
    key = "spark.sql.files.maxRecordsPerFile"
    old = spark.conf.get(key, "0")
    spark.conf.set(key, "500")
    try:
        upsert_observations_versioned(
            spark, page, root, order_cols=["ingestion_time", "event_id"]
        )
    finally:
        spark.conf.set(key, old)
    # Small target so the bin-pack fan-out (ceil(bytes/target) output
    # files per partition — the at-scale parallelism story) actually
    # engages on test-sized partitions instead of degenerating to one
    # task per date.
    compact_versioned(spark, root, target_bytes=256 * 1024)
    return read_observations_versioned(spark, root).select(
        "series_id", "observation_time", "value"
    )


@register(
    "silver_versioned_stats_prune",
    oracle="""
        WITH page AS (
            SELECT 'B' || strftime(CAST(ts AS DATE), '%Y%m%d')
                       || '_' || CAST(user_id AS VARCHAR) AS series_id,
                   date_trunc('hour', ts) AS observation_time,
                   CAST(value AS DOUBLE) AS value,
                   ts AS ingestion_time,
                   event_id
            FROM events
        ),
        v AS (
            SELECT * FROM (
                SELECT p.*, row_number() OVER (
                           PARTITION BY series_id, observation_time
                           ORDER BY ingestion_time DESC, event_id DESC
                       ) AS rn
                FROM page p
            ) WHERE rn = 1
        ),
        d0 AS (SELECT min(CAST(ts AS DATE)) AS d FROM events)
        SELECT series_id, observation_time, value
        FROM v
        WHERE series_id IN (
            SELECT 'B' || strftime(d, '%Y%m%d') || '_1' FROM d0
            UNION ALL
            SELECT 'B' || strftime(d, '%Y%m%d') || '_5' FROM d0
        )
    """,
)
def silver_versioned_stats_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-pruned read on the versioned silver store (VERDICT r11
    #2): every commit records per-partition min/max for the business
    keys from the written files' FOOTERS (pipeline/versioned.py:
    _partition_stats — the file-stats half of Iceberg's manifests, the
    reference's B-tree on (series_id, observation_time) analog,
    db_queries.sql:79-80). Series ids here embed their date
    ('B<yyyymmdd>_<user>'), so each date partition's recorded range is
    DISJOINT from every other's, and a read filtered to two min-date
    series prunes every other partition before any file listing — at
    100 TB a series-predicate read touches the matching partitions'
    files only, never the table (the skip is pinned by inputFiles in
    tests/test_pipeline.py). The row-level isin still applies on top,
    so the result is exact whether or not stats exist."""
    from gas_data_pipeline_spark.pipeline.versioned import (
        read_observations_versioned,
        upsert_observations_versioned,
    )

    root = _scratch()
    e = table(spark, sf_dir, "events")
    page = e.select(
        F.concat(
            F.lit("B"),
            F.date_format(F.to_date("ts"), "yyyyMMdd"),
            F.lit("_"),
            F.col("user_id").cast("string"),
        ).alias("series_id"),
        F.date_trunc("hour", F.col("ts")).alias("observation_time"),
        F.col("value").cast("double").alias("value"),
        F.col("ts").alias("ingestion_time"),
        F.col("event_id"),
    )
    upsert_observations_versioned(
        spark, page, root, order_cols=["ingestion_time", "event_id"]
    )
    # The min date is a metadata-sized scalar (one aggregate row).
    d0 = e.agg(F.min(F.to_date("ts"))).collect()[0][0]
    wanted = [f"B{d0.strftime('%Y%m%d')}_{u}" for u in (1, 5)]
    return read_observations_versioned(
        spark, root, series_ids=wanted
    ).select("series_id", "observation_time", "value")


@register(
    "silver_versioned_file_prune",
    oracle="""
        SELECT series_id, observation_time, value
        FROM (
            SELECT 'NG_EVENTS_' || CAST(user_id AS VARCHAR) AS series_id,
                   date_trunc('hour', ts) AS observation_time,
                   CAST(value AS DOUBLE) AS value,
                   row_number() OVER (
                       PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        WHERE rn = 1
          AND series_id IN ('NG_EVENTS_1', 'NG_EVENTS_5')
    """,
)
def silver_versioned_file_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-grain pruned read on the versioned store (round 13 —
    Iceberg's manifest-entry shape, pipeline/versioned.py:
    _collect_stats): every commit records per-file column bounds, the
    range-clustered compaction gives each output file a narrow
    contiguous (series_id, observation_time) slice, and a
    series-filtered read then selects individual FILES from manifest
    metadata — no directory listing, and after compaction a one-series
    read touches ~one file per partition instead of all of them (the
    strict-subset skip is pinned by inputFiles in
    tests/test_pipeline.py). At 100 TB this is the difference between
    scanning a TB-sized date partition and scanning the few hundred MB
    whose key range can match. The row-level isin applies on top, so
    the result is exact with or without file stats."""
    from gas_data_pipeline_spark.pipeline.versioned import (
        compact_versioned,
        read_observations_versioned,
        upsert_observations_versioned,
    )

    root = _scratch()
    e = table(spark, sf_dir, "events")
    page = e.select(
        F.concat(
            F.lit("NG_EVENTS_"), F.col("user_id").cast("string")
        ).alias("series_id"),
        F.date_trunc("hour", F.col("ts")).alias("observation_time"),
        F.col("value").cast("double").alias("value"),
        F.col("ts").alias("ingestion_time"),
        F.col("event_id"),
    )
    key = "spark.sql.files.maxRecordsPerFile"
    old = spark.conf.get(key, "0")
    # 2000 rows/file plants a fragmented-but-not-absurd layout
    # (VERDICT r13 #5: the old 500-row cap made this the suite's
    # heaviest fs load — ~4x the files for the SAME pruning
    # assertion; the strict-subset skip only needs >1 file per
    # partition pre-compaction, which 2000 still guarantees at bench
    # scale).
    spark.conf.set(key, "2000")
    try:
        upsert_observations_versioned(
            spark, page, root, order_cols=["ingestion_time", "event_id"]
        )
    finally:
        spark.conf.set(key, old)
    # Small target so each date fans out over several range-clustered
    # files — the layout whose per-file bounds the read then prunes.
    compact_versioned(spark, root, target_bytes=256 * 1024)
    return read_observations_versioned(
        spark, root, series_ids=["NG_EVENTS_1", "NG_EVENTS_5"]
    ).select("series_id", "observation_time", "value")


@register(
    "silver_versioned_point_prune",
    oracle="""
        SELECT series_id, observation_time, value
        FROM (
            SELECT 'PP_' || CAST(user_id AS VARCHAR) AS series_id,
                   date_trunc('hour', ts) AS observation_time,
                   CAST(value AS DOUBLE) AS value,
                   row_number() OVER (
                       PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
            WHERE (user_id + CAST(strftime(ts, '%d') AS INT)) % 3 = 0
        )
        WHERE rn = 1 AND series_id IN ('PP_7', 'PP_10')
    """,
)
def silver_versioned_point_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-pruned point lookup on the versioned store (round
    14 — the Parquet/Iceberg bloom-filter analog, pipeline/
    _stats_kernel.py:_file_key_fingerprint): every commit records each
    grain's DISTINCT key set (exact up to 64 keys, an 8192-bit bloom
    beyond), and an equality read prunes grains whose recorded set
    misses every wanted id even though their [min, max] RANGE admits
    it. Series here appear only on dates where (user + day) % 3 == 0,
    so every partition's range spans the keyspace — range checks admit
    everything — and only the key set discriminates: the read touches
    the ~1/3 of partitions that actually hold the wanted series
    (pinned by inputFiles in tests/test_pipeline.py). At 100 TB this
    is the sparse-series case min/max can never prune: a series that
    exists on 30 of 3650 days reads 30 partitions, not the table.
    Blooms are one-sided (false positives keep a grain, never drop
    one) and the row-level isin applies on top, so the result is
    exact with or without fingerprints."""
    from gas_data_pipeline_spark.pipeline.versioned import (
        read_observations_versioned,
        upsert_observations_versioned,
    )

    root = _scratch()
    e = table(spark, sf_dir, "events")
    page = e.filter(
        ((F.col("user_id") + F.dayofmonth(F.col("ts"))) % 3) == 0
    ).select(
        F.concat(F.lit("PP_"), F.col("user_id").cast("string")).alias(
            "series_id"
        ),
        F.date_trunc("hour", F.col("ts")).alias("observation_time"),
        F.col("value").cast("double").alias("value"),
        F.col("ts").alias("ingestion_time"),
        F.col("event_id"),
    )
    upsert_observations_versioned(
        spark, page, root, order_cols=["ingestion_time", "event_id"]
    )
    return read_observations_versioned(
        spark, root, series_ids=["PP_7", "PP_10"]
    ).select("series_id", "observation_time", "value")


@register(
    "silver_versioned_delete_vectors",
    oracle="""
        SELECT series_id, observation_time, value
        FROM (
            SELECT 'DV_' || CAST(user_id AS VARCHAR) AS series_id,
                   date_trunc('hour', ts) AS observation_time,
                   CAST(value AS DOUBLE) AS value,
                   row_number() OVER (
                       PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        WHERE rn = 1
          AND NOT COALESCE(
              series_id IN ('DV_3', 'DV_8') OR value < 5.0, FALSE)
    """,
)
def silver_versioned_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE via deletion vectors (round 14 — Iceberg
    v2's positional deletes, pipeline/versioned.py:
    _delete_versioned_mor): the delete commit rewrites ZERO data
    files — one scan records the matched rows' (file, row_position)
    identities from Spark's parquet ``_metadata`` columns as a
    deleted-rows-sized parquet vector under <root>/dv/, and every
    subsequent read subtracts it with a broadcast anti-join on the
    scan (plan-pinned in tests/test_pipeline.py; compaction later
    materializes the vectors and returns reads to a plain scan). At
    100 TB this is the difference between a GDPR-erasure of a few
    thousand rows costing a rewrite of every touched partition and
    costing a KB-sized vector write. Null-predicate rows are KEPT
    (SQL DELETE's three-valued logic — the oracle's COALESCE
    mirrors it)."""
    from gas_data_pipeline_spark.pipeline.versioned import (
        delete_versioned,
        read_observations_versioned,
        upsert_observations_versioned,
    )

    root = _scratch()
    e = table(spark, sf_dir, "events")
    page = e.select(
        F.concat(F.lit("DV_"), F.col("user_id").cast("string")).alias(
            "series_id"
        ),
        F.date_trunc("hour", F.col("ts")).alias("observation_time"),
        F.col("value").cast("double").alias("value"),
        F.col("ts").alias("ingestion_time"),
        F.col("event_id"),
    )
    upsert_observations_versioned(
        spark, page, root, order_cols=["ingestion_time", "event_id"]
    )
    delete_versioned(
        spark,
        root,
        F.col("series_id").isin("DV_3", "DV_8") | (F.col("value") < 5.0),
        mode="merge-on-read",
    )
    return read_observations_versioned(spark, root).select(
        "series_id", "observation_time", "value"
    )


@register(
    "silver_versioned_delete_by_key",
    oracle="""
        SELECT series_id, observation_time, value
        FROM (
            SELECT 'EQ_' || CAST(user_id AS VARCHAR) AS series_id,
                   date_trunc('hour', ts) AS observation_time,
                   CAST(value AS DOUBLE) AS value,
                   row_number() OVER (
                       PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        WHERE rn = 1 AND series_id NOT IN ('EQ_3', 'EQ_8')
    """,
)
def silver_versioned_delete_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality delete — key erasure as a METADATA-ONLY commit (round
    14, Iceberg's second delete-file kind, pipeline/versioned.py:
    delete_versioned_by_key): the commit reads no data and writes no
    files — the key list lands in the manifest (`dv_eq_sets`),
    per-date refs land under the standard carry rule, and the
    manifest's inline stats + distinct-key fingerprints decide which
    partitions are referenced at all (a partition whose recorded key
    set excludes every key carries no ref — this round's fingerprint
    and delete features composing). Readers compile the subtraction
    into a plain Catalyst filter: no join, no extra IO, date-scoped
    so a later re-insert of an erased series reads back correctly
    (pinned in tests/test_pipeline.py). At 100 TB this is GDPR
    erasure by key as a constant-time commit; the next rewrite of
    each date (upsert/compaction) materializes it."""
    from gas_data_pipeline_spark.pipeline.versioned import (
        delete_versioned_by_key,
        read_observations_versioned,
        upsert_observations_versioned,
    )

    root = _scratch()
    e = table(spark, sf_dir, "events")
    page = e.select(
        F.concat(F.lit("EQ_"), F.col("user_id").cast("string")).alias(
            "series_id"
        ),
        F.date_trunc("hour", F.col("ts")).alias("observation_time"),
        F.col("value").cast("double").alias("value"),
        F.col("ts").alias("ingestion_time"),
        F.col("event_id"),
    )
    upsert_observations_versioned(
        spark, page, root, order_cols=["ingestion_time", "event_id"]
    )
    delete_versioned_by_key(spark, root, ["EQ_3", "EQ_8"])
    return read_observations_versioned(spark, root).select(
        "series_id", "observation_time", "value"
    )


@register(
    "silver_versioned_update_where",
    oracle="""
        SELECT series_id, observation_time,
               CASE WHEN user_id % 7 = 0 THEN round(value * 2, 6)
                    ELSE value END AS value
        FROM (
            SELECT 'UP_' || CAST(user_id AS VARCHAR) AS series_id,
                   date_trunc('hour', ts) AS observation_time,
                   CAST(value AS DOUBLE) AS value,
                   user_id,
                   row_number() OVER (
                       PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
)
def silver_versioned_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write UPDATE as a commit (round 14 — Delta/Iceberg's
    UPDATE, pipeline/versioned.py:update_versioned): partitions with
    matches rewrite with per-row CASE WHEN assignments (unmatched
    rows copy through bit-identical), untouched partitions stay
    structurally shared, pinned pre-update versions still read the
    old values, and key/partition columns are refused as targets (a
    key change is delete + insert, never a silent partition
    migration). Completes the store's DML surface: insert/upsert,
    DELETE in all three forms (copy-on-write, positional vectors,
    metadata-only equality), and UPDATE."""
    from gas_data_pipeline_spark.pipeline.versioned import (
        read_observations_versioned,
        update_versioned,
        upsert_observations_versioned,
    )

    root = _scratch()
    e = table(spark, sf_dir, "events")
    page = e.select(
        F.concat(F.lit("UP_"), F.col("user_id").cast("string")).alias(
            "series_id"
        ),
        F.date_trunc("hour", F.col("ts")).alias("observation_time"),
        F.col("value").cast("double").alias("value"),
        F.col("ts").alias("ingestion_time"),
        F.col("event_id"),
    )
    upsert_observations_versioned(
        spark, page, root, order_cols=["ingestion_time", "event_id"]
    )
    update_versioned(
        spark,
        root,
        F.substring("series_id", 4, 10).cast("long") % 7 == 0,
        {"value": F.round(F.col("value") * 2, 6)},
    )
    return read_observations_versioned(spark, root).select(
        "series_id", "observation_time", "value"
    )


@register(
    "silver_versioned_time_prune",
    oracle="""
        WITH page AS (
            SELECT 'NG_EVENTS_' || CAST(user_id AS VARCHAR) AS series_id,
                   CAST(CAST(ts AS DATE) AS TIMESTAMP)
                       + to_hours(user_id % 6) AS observation_time,
                   CAST(value AS DOUBLE) AS value,
                   ts AS ingestion_time,
                   event_id
            FROM events
        ),
        v AS (
            SELECT * FROM (
                SELECT p.*, row_number() OVER (
                           PARTITION BY series_id, observation_time
                           ORDER BY ingestion_time DESC, event_id DESC
                       ) AS rn
                FROM page p
            ) WHERE rn = 1
        ),
        d0 AS (SELECT min(CAST(ts AS DATE)) AS d FROM events)
        SELECT series_id, observation_time, value
        FROM v
        WHERE observation_time >=
              (SELECT CAST(d AS TIMESTAMP) + INTERVAL 6 HOUR FROM d0)
    """,
)
def silver_versioned_time_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-day time-range pruning on the versioned store (VERDICT r12
    #4 — the second half of the reference's B-tree on (series_id,
    observation_time), db_queries.sql:79-80): every commit records
    per-partition observation_time min/max from the written files'
    footers (pipeline/versioned.py:_stat_value — fixed-width UTC keys,
    written TIMESTAMP_MICROS because INT96 carries no stats), and a
    range read skips partitions whose recorded span doesn't overlap
    the window BEFORE any file listing. Here every date's rows sit in
    hours 0-5 (hour keyed on user_id), so a read from min_day 06:00
    prunes the min-day partition entirely even though date-grain
    pruning keeps it — at 100 TB a narrow-window read over
    hour-clustered data touches only the overlapping partitions' files
    (the skip is pinned by inputFiles in tests/test_pipeline.py). The
    row-level time filter still applies on top, so the result is
    exact with or without stats."""
    from gas_data_pipeline_spark.pipeline.versioned import (
        read_observations_versioned,
        upsert_observations_versioned,
    )

    root = _scratch()
    e = table(spark, sf_dir, "events")
    page = e.select(
        F.concat(
            F.lit("NG_EVENTS_"), F.col("user_id").cast("string")
        ).alias("series_id"),
        F.expr(
            "timestampadd(HOUR, CAST(user_id % 6 AS INT), "
            "CAST(to_date(ts) AS TIMESTAMP))"
        ).alias("observation_time"),
        F.col("value").cast("double").alias("value"),
        F.col("ts").alias("ingestion_time"),
        F.col("event_id"),
    )
    upsert_observations_versioned(
        spark, page, root, order_cols=["ingestion_time", "event_id"]
    )
    # The min date is a metadata-sized scalar (one aggregate row).
    d0 = e.agg(F.min(F.to_date("ts"))).collect()[0][0]
    return read_observations_versioned(
        spark, root, start=f"{d0.isoformat()} 06:00:00"
    ).select("series_id", "observation_time", "value")


@register(
    "silver_versioned_schema_evolution",
    oracle="""
        WITH page AS (
            SELECT 'NG_EVENTS_' || CAST(user_id AS VARCHAR) AS series_id,
                   date_trunc('hour', ts) AS observation_time,
                   CAST(value AS DOUBLE) AS value,
                   ts AS ingestion_time,
                   event_id
            FROM events
        ),
        v AS (
            SELECT * FROM (
                SELECT p.*, row_number() OVER (
                           PARTITION BY series_id, observation_time
                           ORDER BY ingestion_time DESC, event_id DESC
                       ) AS rn
                FROM page p
            ) WHERE rn = 1
        )
        SELECT series_id, observation_time, value,
               CASE WHEN CAST(observation_time AS DATE) =
                         (SELECT min(CAST(ts AS DATE)) FROM events)
                    THEN CASE WHEN value >= 50 THEN 'good' ELSE 'poor' END
                    ELSE NULL END AS quality_flag
        FROM v
    """,
)
def silver_versioned_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution as manifest metadata on the versioned store:
    v1 commits the full batch under the base schema; v2 adds a
    quality_flag column but touches ONLY the earliest date, so every
    other partition is structurally shared into the v2 snapshot
    unrewritten. The current read must surface the added column —
    computed values on the churned date, nulls on the shared old-schema
    partitions — because the snapshot's schema is DECLARED in the
    manifest (evolved at commit), not anchored on whichever file the
    multi-directory scan lists first (round-11 self-review: the
    file-anchored read silently dropped the column whenever an old
    shared partition won; pipeline/versioned.py:_evolve_schema)."""
    from gas_data_pipeline_spark.pipeline.versioned import (
        read_observations_versioned,
        upsert_observations_versioned,
    )

    root = _scratch()
    e = table(spark, sf_dir, "events")

    def page(df):
        return df.select(
            F.concat(
                F.lit("NG_EVENTS_"), F.col("user_id").cast("string")
            ).alias("series_id"),
            F.date_trunc("hour", F.col("ts")).alias("observation_time"),
            F.col("value").cast("double").alias("value"),
            F.col("ts").alias("ingestion_time"),
            F.col("event_id"),
        )

    order = ["ingestion_time", "event_id"]
    upsert_observations_versioned(spark, page(e), root, order_cols=order)
    min_day = e.agg(F.min(F.to_date("ts"))).collect()[0][0]
    evolved = page(e.filter(F.to_date("ts") == F.lit(min_day))).withColumn(
        "quality_flag",
        F.when(F.col("value") >= 50, F.lit("good")).otherwise(F.lit("poor")),
    )
    upsert_observations_versioned(spark, evolved, root, order_cols=order)
    return read_observations_versioned(spark, root).select(
        "series_id", "observation_time", "value", "quality_flag"
    )


@register(
    "export_csv_roundtrip",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        ORDER BY o_orderdate DESC, o_orderkey DESC
        LIMIT 1000
    """,
)
def export_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNK5: newest-first capped CSV export (reference export.py:35-62),
    read back with an explicit schema — header, ordering cap, and
    CSV round-trip of doubles all exercised through disk."""
    path = _scratch()
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    export_csv(o, path, order_col="o_orderdate", tie_col="o_orderkey", limit=1000)
    back = spark.read.option("header", True).schema(
        "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, o_orderdate TIMESTAMP"
    ).csv(path)
    return back.select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "scd2_user_state_history",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        ),
        numbered AS (
            SELECT *, sum(CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS interval_no
            FROM ordered
        ),
        intervals AS (
            SELECT user_id, interval_no, min(event_type) AS event_type,
                   min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_changes
            FROM numbered GROUP BY user_id, interval_no
        )
        SELECT user_id, event_type, valid_from,
               lead(valid_from) OVER (PARTITION BY user_id ORDER BY interval_no) AS valid_to,
               lead(valid_from) OVER (PARTITION BY user_id ORDER BY interval_no) IS NULL
                 AS is_current,
               n_changes
        FROM intervals
    """,
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension history built from a change log: each
    user's event-type run collapses into validity intervals
    ([valid_from, valid_to), open interval flagged is_current) so facts
    can join the dimension as-of their own event time. The reference
    stores only latest-per-key (its upsert path); this is the versioned
    form a lakehouse keeps alongside it. One shuffle on the key, then
    ordered within-partition passes — no joins."""
    from gas_data_pipeline_spark.pipeline.scd import scd2_intervals

    ev = table(spark, sf_dir, "events")
    return scd2_intervals(
        ev, key_col="user_id", attr_col="event_type", ts_col="ts", tiebreak_col="event_id"
    )


@register(
    "jsonl_ingest_quarantine",
    oracle="""
        SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents WHERE doc_id % 97 <> 0 GROUP BY lang
        UNION ALL
        SELECT '_quarantined', CAST(count(*) AS BIGINT), CAST(NULL AS BIGINT)
        FROM documents WHERE doc_id % 97 = 0
    """,
)
def jsonl_ingest_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-loss JSONL ingest: malformed lines are quarantined with the
    raw text, never dropped (the file analog of the reference's
    store-then-transform bronze order). The query writes the documents
    table as JSONL with a deterministic subset of lines corrupted
    (truncated), reads it back through the quarantine reader, and
    reports per-language parsed counts plus the quarantined line count
    — which the oracle reproduces from the clean table."""
    from gas_data_pipeline_spark.sources.files import read_jsonl_quarantine

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    line = F.to_json(F.struct("doc_id", "lang", "n_chars"))
    corrupted = F.when(
        F.col("doc_id") % 97 == 0, F.substring(line, 1, 10)
    ).otherwise(line)
    scratch = _scratch()
    docs.select(corrupted.alias("value")).write.mode("overwrite").text(scratch)
    good, bad = read_jsonl_quarantine(
        spark, scratch, "doc_id bigint, lang string, n_chars bigint"
    )
    per_lang = good.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    quarantined = bad.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows")).select(
        F.lit("_quarantined").alias("lang"),
        "n_rows",
        F.lit(None).cast("bigint").alias("total_chars"),
    )
    return per_lang.unionByName(quarantined)


@register(
    "compaction_roundtrip",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
)
def compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction is content-neutral: fragment the orders
    table into 64 tiny files (the state an incremental writer leaves),
    compact to ~4 near-target-size files, and return the compacted
    content — which must be byte-identical to the source. File-count
    and sizing invariants are asserted in tests/test_pipeline.py; the
    oracle proves the rewrite loses and alters nothing."""
    from gas_data_pipeline_spark.pipeline.compaction import (
        compact_parquet,
        dir_parquet_stats,
        write_fragmented,
    )

    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    scratch = _scratch()
    write_fragmented(src, scratch, n_files=64)
    _n, total = dir_parquet_stats(scratch)
    compact_parquet(spark, scratch, target_bytes=max(1, total // 4))
    return spark.read.parquet(scratch)


@register(
    "quality_expectations",
    oracle="""
        WITH base AS (
            SELECT count(*) AS n,
                   CAST(sum(CASE WHEN NOT COALESCE(value <= 400, FALSE)
                            THEN 1 ELSE 0 END) AS BIGINT) AS v_val400,
                   CAST(sum(CASE WHEN NOT COALESCE(event_type <> 'error', FALSE)
                            THEN 1 ELSE 0 END) AS BIGINT) AS v_noerr,
                   CAST(sum(CASE WHEN NOT COALESCE(value >= 1.0, FALSE)
                            THEN 1 ELSE 0 END) AS BIGINT) AS v_val1,
                   CAST(sum(CASE WHEN NOT COALESCE(ts IS NOT NULL, FALSE)
                            THEN 1 ELSE 0 END) AS BIGINT) AS v_ts
            FROM events
        )
        SELECT 'value_at_most_400' AS rule, v_val400 AS n_violations, n AS n_rows,
               round(v_val400 / n, 6) AS violation_rate FROM base
        UNION ALL SELECT 'no_error_events', v_noerr, n, round(v_noerr / n, 6) FROM base
        UNION ALL SELECT 'value_at_least_1', v_val1, n, round(v_val1 / n, 6) FROM base
        UNION ALL SELECT 'ts_not_null', v_ts, n, round(v_ts / n, 6) FROM base
    """,
)
def quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F7 as a first-class audit pass: named boolean rules stamped
    in ONE narrow projection (null predicate = violation), per-rule
    violation counts/rates from one tiny aggregate — the set-based
    replacement for the reference's row-at-a-time transform validation
    (transformer.py:78-95), with quarantine semantics instead of
    silent drops (pipeline/expectations.py)."""
    from gas_data_pipeline_spark.pipeline.expectations import (
        expectation_metrics,
    )

    e = table(spark, sf_dir, "events")
    rules = {
        "value_at_most_400": F.col("value") <= 400,
        "no_error_events": F.col("event_type") != "error",
        "value_at_least_1": F.col("value") >= 1.0,
        "ts_not_null": F.col("ts").isNotNull(),
    }
    return expectation_metrics(e, rules)


@register(
    "snapshot_diff_cdc",
    oracle="""
        WITH v1 AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
            FROM orders WHERE o_orderkey % 7 <> 0
        ),
        v2 AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderpriority
            FROM orders WHERE o_orderkey % 11 <> 0
        ),
        j AS (
            SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
                   a.o_orderkey IS NULL AS ins, b.o_orderkey IS NULL AS del,
                   CAST((a.o_orderstatus IS DISTINCT FROM b.o_orderstatus)
                      AS INTEGER)
                   + CAST((a.o_totalprice IS DISTINCT FROM b.o_totalprice)
                      AS INTEGER)
                   + CAST((a.o_orderpriority IS DISTINCT FROM b.o_orderpriority)
                      AS INTEGER) AS nc
            FROM v1 a FULL OUTER JOIN v2 b USING (o_orderkey)
        )
        SELECT o_orderkey,
               CASE WHEN ins THEN 'insert' WHEN del THEN 'delete'
                    ELSE 'update' END AS change_type,
               CAST(CASE WHEN ins OR del THEN 0 ELSE nc END AS BIGINT)
                 AS n_changed_cols
        FROM j WHERE ins OR del OR nc > 0
    """,
)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CDC derived from two full snapshots — the inverse of
    the upsert/delete-reload write paths: yesterday's orders (v1)
    vs today's (v2, with rows added, dropped, and repriced) diff to
    the exact insert/delete/update feed with per-row changed-column
    counts. pipeline/diff.snapshot_diff: one full-outer key join,
    column-wise null-safe compare, churn-sized output. The %5 /
    %7 / %11 carvings guarantee every change type appears and
    overlap (a repriced row that is also new counts as insert)."""
    from gas_data_pipeline_spark.pipeline.diff import snapshot_diff

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    v1 = orders.filter(F.col("o_orderkey") % 7 != 0)
    v2 = orders.filter(F.col("o_orderkey") % 11 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    return snapshot_diff(v1, v2, ["o_orderkey"])


@register(
    "referential_integrity_audit",
    oracle="""
        WITH parents AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 <> 0),
        e1 AS (
            SELECT 'orders.custkey->customer' AS edge,
                   CAST(count(*) AS BIGINT) AS n_child,
                   CAST(sum(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_null_fk,
                   CAST(sum(CASE WHEN o.o_custkey IS NOT NULL AND p.c_custkey IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
            FROM orders o LEFT JOIN parents p ON o.o_custkey = p.c_custkey
        ),
        e2 AS (
            SELECT 'lineitem.orderkey->orders', CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT)
            FROM lineitem l
            LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
              ON l.l_orderkey = o.o_orderkey
        ),
        e3 AS (
            SELECT 'lineitem.partkey->part', CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN l.l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN l.l_partkey IS NOT NULL AND p.p_partkey IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT)
            FROM lineitem l
            LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
              ON l.l_partkey = p.p_partkey
        ),
        u AS (
            SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3
        )
        SELECT edge, n_child, n_null_fk, n_orphans,
               round(n_orphans / n_child, 6) AS orphan_rate
        FROM u
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 at the join level: FK orphan audit across the star schema.
    The customer side is carved to every-10th-key-missing so the
    orders edge MUST report ~10% orphans while the lineitem edges
    report zero — a silent-upstream-delete detector with a known
    planted answer. pipeline/expectations.referential_integrity_audit:
    per edge only the FK column shuffles, each edge collapses to one
    row before the union."""
    from gas_data_pipeline_spark.pipeline.expectations import (
        referential_integrity_audit as ri_audit,
    )

    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    parents = table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 10 != 0
    )
    part = table(spark, sf_dir, "part")
    return ri_audit(
        [
            ("orders.custkey->customer", orders, "o_custkey", parents, "c_custkey"),
            ("lineitem.orderkey->orders", lineitem, "l_orderkey", orders, "o_orderkey"),
            ("lineitem.partkey->part", lineitem, "l_partkey", part, "p_partkey"),
        ]
    )


@register(
    "incremental_rollup_maintenance",
    oracle="""
        WITH v2 AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 13 = 0 THEN '3-MEDIUM'
                        ELSE o_orderpriority END AS o_orderpriority,
                   CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1
                        ELSE o_totalprice END AS o_totalprice
            FROM orders WHERE o_orderkey % 11 <> 0
        )
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM v2
        GROUP BY o_orderpriority
    """,
)
def incremental_rollup_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: yesterday's priority rollup is
    refreshed to today's WITHOUT rescanning the fact table — only the
    churn between snapshots moves. v1 -> v2 plants every maintenance
    case: inserts (keys absent from v1), deletes (keys gone from v2),
    value updates (repriced rows), GROUP MIGRATION (rows whose
    priority changes — the -1 lands in the old group, the +1 in the
    new), and a synthetic 'X-GONE' group that empties entirely and
    must vanish from the maintained rollup. The oracle is just the
    full GROUP BY over v2 — the maintained result must be
    indistinguishable from a recompute (sums kept in decimal so
    addition order can't drift). pipeline/diff.snapshot_delta +
    apply_delta_to_rollup."""
    from gas_data_pipeline_spark.pipeline.diff import (
        apply_delta_to_rollup,
        snapshot_delta,
    )

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    gone = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        F.lit("X-GONE").alias("o_orderpriority"),
        F.col("o_totalprice"),
    )
    v1 = orders.filter(F.col("o_orderkey") % 7 != 0).unionByName(gone)
    v2 = (
        orders.filter(F.col("o_orderkey") % 11 != 0)
        .withColumn(
            "o_orderpriority",
            F.when(F.col("o_orderkey") % 13 == 0, F.lit("3-MEDIUM")).otherwise(
                F.col("o_orderpriority")
            ),
        )
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1
            ).otherwise(F.col("o_totalprice")),
        )
    )

    def with_total(df: DataFrame) -> DataFrame:
        return df.withColumn("total", F.col("o_totalprice").cast("decimal(18,2)"))

    rollup_v1 = (
        with_total(v1)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("total").alias("total"),
        )
    )
    deltas = snapshot_delta(
        with_total(v1),
        with_total(v2),
        keys=["o_orderkey"],
        cols=["o_orderpriority", "total"],
    )
    maintained = apply_delta_to_rollup(
        rollup_v1,
        deltas,
        group_cols=["o_orderpriority"],
        sum_cols=["total"],
        count_col="n_orders",
    )
    return maintained.select(
        "o_orderpriority",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("total").cast("double").alias("total"),
    )


@register(
    "schema_evolution_merge_read",
    oracle="""
        SELECT o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
                   AS o_orderpriority,
               o_orderkey % 2 = 1 AS from_v2
        FROM orders
    """,
)
def schema_evolution_merge_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-level schema evolution: a v1 writer lands files WITHOUT
    the `o_orderpriority` column, a later v2 writer includes it; one
    `mergeSchema` read returns the union schema with nulls where v1
    files have no column — no rewrite of old files, no reader branch
    per vintage (the lakehouse answer to the reference's additive
    ALTER TABLE migrations). The DataFrame-level counterpart is
    `union_by_name_harmonized`; this proves the same contract at the
    PARQUET FOOTER level, where schema merging is per-file metadata
    only — at 100 TB the merge cost is footer reads, never data."""
    import os

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    path = _scratch()
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).drop("o_orderpriority")
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "from_v2", F.lit(True)
    )
    v1.write.mode("overwrite").parquet(os.path.join(path, "vintage=1"))
    v2.write.mode("overwrite").parquet(os.path.join(path, "vintage=2"))
    merged = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "true"
    ).parquet(path)
    return merged.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double"),
        "o_orderpriority",
        F.coalesce(F.col("from_v2"), F.lit(False)).alias("from_v2"),
    )


@register(
    "observe_ingest_metrics",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null_props,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS min_ts,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts,
               CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
                   AS value_fp_sum,
               CAST(count(*) AS BIGINT) AS landed_rows
        FROM events WHERE event_id % 4 = 0
    """,
)
def observe_ingest_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass ingest observability (``df.observe``): data-quality
    metrics — row count, null-payload count, event-time bounds, a
    fixed-point value checksum — ride the bronze WRITE action itself
    as Spark observed metrics, so the batch is scanned exactly ONCE
    for landing + metrics (the reference logs per-run counts from a
    second query; at 100 TB a metrics re-scan is a second pass over
    the feed). ``landed_rows`` re-counts the written bronze partition
    (count-only columnless scan) to close the zero-loss loop:
    landed == observed. The oracle recomputes every metric from the
    source slice — the observed values must match a full SQL
    recomputation exactly."""
    from pyspark.sql import Observation

    src = table(spark, sf_dir, "events").filter(F.col("event_id") % 4 == 0)
    obs = Observation("ingest_metrics")
    watched = src.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("props").isNull(), 1).otherwise(0)
        ).alias("n_null_props"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("min_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("max_ts"),
        F.sum(F.round(F.col("value") * 1e6, 0).cast("bigint")).alias(
            "value_fp_sum"
        ),
    )
    root = _scratch()
    bronze = f"{root}/bronze"
    bronze_append(watched, "ds_observe", "events_feed", bronze)
    m = obs.get
    landed = read_bronze(spark, bronze, "ds_observe").count()
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["n_null_props"],
                m["min_ts"],
                m["max_ts"],
                m["value_fp_sum"],
                landed,
            )
        ],
        "n_rows bigint, n_null_props bigint, min_ts string, "
        "max_ts string, value_fp_sum bigint, landed_rows bigint",
    )
