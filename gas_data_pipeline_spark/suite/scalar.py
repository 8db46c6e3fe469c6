"""Scalar-function surface (SURVEY §2.7, S1-S10): string slug/parse,
date parse/arithmetic, numeric coercion, JSON access/construct.

Everything here is a native Column expression — no Python UDFs — so
each query stays inside whole-stage codegen (SURVEY §2.10: the
reference's custom scalar logic maps to built-ins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gas_data_pipeline_spark.catalog import spread_scan, table
from gas_data_pipeline_spark.functions import (
    clean_value,
    date_chunks,
    make_series_id,
    parse_series_part,
)
from gas_data_pipeline_spark.registry import register


@register(
    "series_id_slug",
    oracle="""
        SELECT event_id,
               'NG_EVENTS_'
                 || regexp_replace(regexp_replace(upper(trim(event_type)), '[,()]', '', 'g'), '\\s+', '_', 'g')
                 || '_'
                 || CAST(user_id AS VARCHAR) AS series_id
        FROM events
    """,
)
def series_id_slug(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: make_series_id slug derivation (reference
    series_autoregister.py:7-16) as concat_ws/upper/regexp_replace."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        make_series_id("EVENTS", F.col("event_type"), F.col("user_id")).alias(
            "series_id"
        ),
    )


@register(
    "series_id_reverse_parse",
    oracle="""
        WITH ids AS (
            SELECT event_id,
                   'NG_EVENTS_' || upper(event_type) || '_' || CAST(user_id AS VARCHAR) AS series_id
            FROM events
        )
        SELECT event_id, series_id,
               string_split(series_id, '_')[3] AS indicator,
               string_split(series_id, '_')[4] AS point_key
        FROM ids
    """,
)
def series_id_reverse_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: positional reverse-parse of the series id (reference
    transformer.py:17-19,49-56) via split + element_at."""
    e = table(spark, sf_dir, "events")
    with_id = e.select(
        "event_id",
        make_series_id("EVENTS", F.col("event_type"), F.col("user_id")).alias(
            "series_id"
        ),
    )
    return with_id.select(
        "event_id",
        "series_id",
        parse_series_part(F.col("series_id"), 3).alias("indicator"),
        parse_series_part(F.col("series_id"), 4).alias("point_key"),
    )


@register(
    "date_parse_coerce",
    oracle="""
        SELECT event_id,
               TRY_CAST(CASE WHEN event_type = 'error' THEN 'not-a-timestamp'
                             ELSE strftime(ts, '%Y-%m-%d %H:%M:%S.%f') END AS TIMESTAMP) AS parsed_ts
        FROM events
    """,
)
def date_parse_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: permissive timestamp parsing — ``pd.to_datetime(...,
    errors='coerce')`` (reference transformer.py:70) as try_cast; bad
    strings become null instead of failing the job."""
    e = table(spark, sf_dir, "events")
    dirty = F.when(F.col("event_type") == "error", F.lit("not-a-timestamp")).otherwise(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    )
    return e.select("event_id", dirty.try_cast("timestamp").alias("parsed_ts"))


@register(
    "date_chunk_fanout",
    oracle="""
        SELECT g AS chunk_start,
               least(g + INTERVAL 2 DAYS, TIMESTAMP '2024-01-31 00:00:00') AS chunk_end
        FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
                             TIMESTAMP '2024-01-31 00:00:00',
                             INTERVAL 2 DAYS) AS t(g)
    """,
)
def date_chunk_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: the 2-day fetch-chunk loop (reference
    national_gas_client.py:61-66) as ``explode(sequence(...))`` — the
    chunk set becomes a DataFrame that drives parallel fetch tasks
    instead of a serial driver loop."""
    start = F.lit("2024-01-01 00:00:00").cast("timestamp")
    stop = F.lit("2024-01-31 00:00:00").cast("timestamp")
    chunks = spark.range(1).select(
        F.explode(date_chunks(start, stop, days=2)).alias("chunk_start")
    )
    return chunks.select(
        "chunk_start",
        F.least(
            F.col("chunk_start") + F.expr("INTERVAL 2 DAYS"), stop
        ).alias("chunk_end"),
    )


@register(
    "value_clean_gauntlet",
    oracle="""
        SELECT event_id,
               TRY_CAST(nullif(trim(raw), '') AS DOUBLE) AS value
        FROM (
            SELECT event_id,
                   CASE WHEN event_type = 'error' THEN ' '
                        WHEN event_type = 'signup' THEN 'n/a'
                        ELSE CAST(value AS VARCHAR) END AS raw
            FROM events
        )
    """,
)
def value_clean_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7+S8: clean_value() — NULL_LIKE blanks to null + permissive
    double cast (reference gie/constants.py:19, transformer.py:83-86)."""
    e = table(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_type") == "error", F.lit(" "))
        .when(F.col("event_type") == "signup", F.lit("n/a"))
        .otherwise(F.col("value").cast("string"))
    )
    return e.select("event_id", clean_value(raw).alias("value"))


@register(
    "json_roundtrip",
    oracle="""
        SELECT o_orderkey,
               o_orderstatus AS status_back,
               o_orderpriority AS priority_back,
               CAST(o_custkey AS VARCHAR) AS custkey_back
        FROM orders
    """,
)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9+S10: JSON construct (``to_json(struct(*))`` — the bronze
    payload, reference raw_ingestor.py:31-34) then field re-extraction
    (``payload ->> k`` — reference discovery.py:73). Identity roundtrip
    proves zero-loss for the covered fields."""
    # JSON construct + 3 JSON-path extracts are interpreted expressions:
    # spread the 1-split scan so they run on every core (see spread_scan).
    o = spread_scan(table(spark, sf_dir, "orders"))
    payload = F.to_json(
        F.struct("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    )
    with_payload = o.select("o_orderkey", payload.alias("payload"))
    return with_payload.select(
        "o_orderkey",
        F.get_json_object("payload", "$.o_orderstatus").alias("status_back"),
        F.get_json_object("payload", "$.o_orderpriority").alias("priority_back"),
        F.get_json_object("payload", "$.o_custkey").alias("custkey_back"),
    )
