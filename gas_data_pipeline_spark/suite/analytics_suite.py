"""Analytics suite: time-series operators (as-of join, sessionization,
gap-filled resample) + relational extras (range/band join, CUBE,
approx-distinct) the engine exposes beyond reference parity.

The reference's domain is a long-format time-series store (reference
app/db/models.py:42-62); "value as of T", sessions, and dense daily
rollups are the canonical queries such a store serves. Oracles are
exact ANSI/DuckDB SQL except approx-distinct (engine-specific HLL —
rows-only with a pytest accuracy bound vs exact)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gas_data_pipeline_spark.catalog import table
from gas_data_pipeline_spark.operators.timeseries import (
    asof_join,
    gap_fill_daily,
    sessionize,
)
from gas_data_pipeline_spark.registry import register


@register(
    "asof_join_latest_view",
    oracle="""
        WITH ev AS (
            SELECT event_id, user_id, event_type, value,
                   CAST(date_trunc('microsecond', ts) AS TIMESTAMP) AS ts
            FROM events
        ),
        clicks AS (SELECT * FROM ev WHERE event_type = 'click'),
        views AS (
            SELECT user_id, ts, event_id, value FROM (
                SELECT user_id, ts, event_id, value,
                       row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
                FROM ev WHERE event_type = 'view'
            ) WHERE rn = 1
        )
        SELECT c.event_id, c.user_id, c.ts, c.value,
               v.event_id AS view_event_id, v.ts AS view_ts, v.value AS view_value
        FROM clicks c ASOF LEFT JOIN views v
          ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def asof_join_latest_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (union-tag window, one shuffle): each click matched
    to the same user's most recent view at-or-before it. DuckDB's
    native ASOF JOIN is the oracle. Views pre-deduped per (user, ts)
    so tie resolution is deterministic in both engines."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    views = (
        ev.filter(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_id", "value")
    )
    out = asof_join(
        clicks,
        views,
        keys=["user_id"],
        right_payload=["event_id", "ts", "value"],
        prefix="view_",
    )
    return out.select(
        "event_id", "user_id", "ts", "value",
        "view_event_id", "view_ts", "view_value",
    )


@register(
    "sessionize_events",
    oracle="""
        WITH ev AS (
            SELECT user_id, event_id, value,
                   CAST(date_trunc('microsecond', ts) AS TIMESTAMP) AS ts
            FROM events
        ),
        flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts, value,
                   CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_seq
            FROM flagged
        )
        SELECT user_id, session_seq,
               min(ts) AS session_start, max(ts) AS session_end,
               CAST(count(*) AS BIGINT) AS n_events,
               sum(value) AS total_value
        FROM sessions
        GROUP BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) + per-session rollup —
    the batch analog of Structured Streaming's session_window. One
    shuffle for the window, map-side partials for the rollup."""
    ev = table(spark, sf_dir, "events")
    sessions = sessionize(
        ev, key="user_id", ts_col="ts", gap_seconds=1800, order_tiebreak="event_id"
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )


@register(
    "gap_fill_daily_rollup",
    oracle="""
        WITH ev AS (
            SELECT event_type AS series, CAST(ts AS DATE) AS day, value
            FROM events
        ),
        daily AS (
            SELECT series, day, sum(value) AS total,
                   CAST(count(*) AS BIGINT) AS n_obs
            FROM ev GROUP BY series, day
        ),
        bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
        grid AS (
            SELECT s.series, CAST(g.day AS DATE) AS day
            FROM (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
                  FROM bounds) g
            CROSS JOIN (SELECT DISTINCT series FROM ev) s
        )
        SELECT grid.series, strftime(grid.day, '%Y-%m-%d') AS day,
               coalesce(daily.total, 0.0) AS total,
               coalesce(daily.n_obs, 0) AS n_obs
        FROM grid LEFT JOIN daily
          ON grid.series = daily.series AND grid.day = daily.day
    """,
)
def gap_fill_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily rollup per event_type: intraday→daily downsampling
    (the reference's frequency column implies it) with missing days
    emitted as zero rows via a sequence-exploded day grid. The day is
    emitted as an ISO string: DuckDB DATE surfaces in pandas as
    datetime64 while Spark DateType surfaces as date, so a string is
    the only representation both engines hash identically."""
    ev = table(spark, sf_dir, "events")
    out = gap_fill_daily(ev, series_col="event_type", ts_col="ts", value_col="value")
    return out.withColumn("day", F.date_format("day", "yyyy-MM-dd"))


_BANDS = [
    ("budget", 0.0, 1000.0),
    ("mid", 1000.0, 1400.0),
    ("premium", 1400.0, 1800.0),
    ("luxury", 1800.0, 1e9),
]
_BANDS_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)


@register(
    "band_range_join",
    oracle=f"""
        SELECT band, CAST(count(*) AS BIGINT) AS n_parts,
               round(avg(p_retailprice), 4) AS avg_price
        FROM part
        JOIN (VALUES {_BANDS_SQL}) AS bands(band, lo, hi)
          ON p_retailprice >= lo AND p_retailprice < hi
        GROUP BY band
    """,
)
def band_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join: parts against a broadcast price-band dim on
    lo <= price < hi — Spark plans BroadcastNestedLoopJoin, which is
    exactly right for a 4-row build side; the fact side never
    shuffles until the final 4-group aggregate."""
    part = table(spark, sf_dir, "part")
    bands = spark.createDataFrame(_BANDS, ["band", "lo", "hi"])
    joined = part.join(
        F.broadcast(bands),
        (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi")),
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
    )


@register(
    "cube_revenue",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
                 AS grouping_level,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate (all 4 grouping sets in one pass — Spark expands
    to a single shuffle with grouping-id, not 4 scans)."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("bigint").alias("grouping_level"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register("approx_distinct_users")  # rows-only: HLL sketch is engine-specific
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event_type — the
    100 TB cardinality-estimation workhorse (no exact-distinct
    shuffle). Accuracy vs exact asserted in pytest (rsd=0.01)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users")
    )


@register(
    "salted_skew_aggregate",
    oracle="""
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 4) AS total
        FROM events
        GROUP BY event_type
    """,
)
def salted_skew_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for skewed keys: events has only a
    handful of event_types, so a plain groupBy sends each key's entire
    volume to ONE reducer. Phase 1 aggregates on (key, salt) — fan-out
    16 — spreading each hot key over 16 reducers; phase 2 combines the
    16 partials per key. The salt is a deterministic hash of a
    high-cardinality column (no rand(): plans stay re-executable).
    At 100 TB this is the difference between one straggler task and an
    even stage; AQE skew-join handles joins, but skewed *aggregation*
    needs the salt."""
    ev = table(spark, sf_dir, "events")
    salted = ev.withColumn("__salt", F.pmod(F.hash("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "__salt").agg(
        F.count(F.lit(1)).alias("n_partial"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_partial"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("n_partial").cast("bigint").alias("n_events"),
        F.round(F.sum("sum_partial").cast("double"), 4).alias("total"),
    )


@register(
    "rolling_time_average",
    oracle="""
        WITH ev AS (
            SELECT user_id, event_id, value,
                   CAST(date_trunc('microsecond', ts) AS TIMESTAMP) AS ts
            FROM events WHERE user_id < 10
        )
        SELECT user_id, event_id, ts,
               round(avg(value) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW
               ), 4) AS avg_24h,
               CAST(count(*) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_24h
        FROM ev
    """,
)
def rolling_time_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 24-hour rolling mean per series — a RANGE frame over
    event time (peers included, exactly SQL RANGE semantics), the
    canonical smoothing query over the observation store. One shuffle
    on the series key; the frame is evaluated in a single sorted pass
    per partition."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    micros = F.unix_micros(F.col("ts"))
    day_us = 24 * 3600 * 1_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(micros)
        .rangeBetween(-day_us, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.avg("value").over(w), 4).alias("avg_24h"),
        F.count(F.lit(1)).over(w).alias("n_24h"),
    )


@register(
    "interpolate_daily_gaps",
    oracle="""
        WITH ev AS (
            SELECT event_type AS series, CAST(ts AS DATE) AS day, value
            FROM events
        ),
        daily AS (
            SELECT series, day, round(avg(value), 6) AS obs
            FROM ev WHERE day <= DATE '2024-01-20' GROUP BY series, day
        ),
        bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
        grid AS (
            SELECT s.series, CAST(g.day AS DATE) AS day
            FROM (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
                  FROM bounds) g
            CROSS JOIN (SELECT DISTINCT series FROM ev) s
        ),
        joined AS (
            SELECT grid.series, grid.day, daily.obs FROM grid
            LEFT JOIN daily ON grid.series = daily.series AND grid.day = daily.day
        ),
        bracketed AS (
            SELECT series, day, obs,
                   last_value(obs IGNORE NULLS) OVER (
                       PARTITION BY series ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_obs,
                   last_value(CASE WHEN obs IS NOT NULL THEN day END IGNORE NULLS) OVER (
                       PARTITION BY series ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
                   first_value(obs IGNORE NULLS) OVER (
                       PARTITION BY series ORDER BY day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_obs,
                   first_value(CASE WHEN obs IS NOT NULL THEN day END IGNORE NULLS) OVER (
                       PARTITION BY series ORDER BY day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
            FROM joined
        )
        SELECT series, strftime(day, '%Y-%m-%d') AS day,
               round(CASE
                   WHEN obs IS NOT NULL THEN obs
                   WHEN prev_obs IS NULL THEN next_obs
                   WHEN next_obs IS NULL THEN prev_obs
                   ELSE prev_obs + (next_obs - prev_obs)
                        * date_diff('day', prev_day, day)
                        / date_diff('day', prev_day, next_day)
               END, 6) AS value,
               obs IS NULL AS interpolated
        FROM bracketed
    """,
)
def interpolate_daily_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over missing days: bracket each gap day
    with the nearest observed values (last/first over IGNORE NULLS
    windows — two sorted passes, one shuffle) and interpolate by day
    distance; edges extend flat. Observations after Jan 20 are dropped
    so the grid genuinely has gaps to fill. The standard time-series
    regularization the reference's daily frequency implies."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    daily = (
        ev.groupBy(F.col("event_type").alias("series"), day)
        .agg(F.round(F.avg("value"), 6).alias("obs"))
        .filter(F.col("day") <= F.lit("2024-01-20").cast("date"))
    )
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    grid = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day")).crossJoin(
        F.broadcast(ev.select(F.col("event_type").alias("series")).distinct())
    )
    joined = grid.join(daily, ["series", "day"], "left")

    w_back = (
        Window.partitionBy("series")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("series")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("obs").isNotNull(), F.col("day"))
    bracketed = joined.select(
        "series",
        "day",
        "obs",
        F.last("obs", ignorenulls=True).over(w_back).alias("prev_obs"),
        F.last(obs_day, ignorenulls=True).over(w_back).alias("prev_day"),
        F.first("obs", ignorenulls=True).over(w_fwd).alias("next_obs"),
        F.first(obs_day, ignorenulls=True).over(w_fwd).alias("next_day"),
    )
    frac = F.datediff("day", "prev_day") / F.datediff("next_day", "prev_day")
    value = (
        F.when(F.col("obs").isNotNull(), F.col("obs"))
        .when(F.col("prev_obs").isNull(), F.col("next_obs"))
        .when(F.col("next_obs").isNull(), F.col("prev_obs"))
        .otherwise(F.col("prev_obs") + (F.col("next_obs") - F.col("prev_obs")) * frac)
    )
    return bracketed.select(
        "series",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(value, 6).alias("value"),
        F.col("obs").isNull().alias("interpolated"),
    )


@register(
    "percentiles_by_series",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.95), 6) AS p95,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events
        GROUP BY event_type
    """,
)
def percentiles_by_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per series (ordered-set
    aggregate; Spark's percentile == SQL percentile_cont semantics ==
    DuckDB quantile_cont). Exact percentiles sort within groups —
    at 100 TB reach for approx_percentile (t-digest, one pass,
    mergeable) and accept rank error; both surfaces are exposed."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )
