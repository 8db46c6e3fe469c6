"""Time-series operators the reference's domain (gas-market series)
implies but its Postgres layer cannot express: as-of join,
sessionization, gap-filled resampling.

Reference grounding: the observation store is a long-format time
series keyed (series_id, observation_time) (reference
app/db/models.py:42-62); "latest value at time T" lookups and
daily downsampling are the natural queries over it (reference
app/ingestion/series_autoregister.py:50,89 distinguishes
intraday/daily frequencies). These operators give that surface
first-class, scalable form.

Scale design: every operator here is ONE shuffle on the series key
followed by a per-partition sort (window) — the canonical Spark
time-series shape. No driver-side state, no UDFs; at 1000 executors
the partitioning column is the series/user key, so skew tooling
(AQE skew-join, salting) applies untouched.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] = (),
    prefix: str = "matched_",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` within the same key group (the "price as
    of trade time" / "observation as of event time" join).

    Implemented as the union-tag trick — NOT a range join: tag sides,
    union, one window ``last(payload, ignorenulls)`` ordered by
    (ts, side) per key. Exactly one shuffle on the keys and one
    partition-local sort, O(n log n) per key group; a range-join
    formulation would be O(n·m) per key. Right rows at exactly
    left.ts match (side tag orders right first on ties).

    Left rows with no prior right row keep null payload columns
    (left-join semantics). Ties *within* the right side at one
    timestamp should be pre-deduplicated by the caller for
    deterministic output.
    """
    payload = F.struct(*[F.col(c) for c in right_payload]).alias("__payload")
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload,
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out_cols = [
        F.col(f"__l_{c}").alias(c) for c in left.columns
    ] + [
        F.col("__match").getField(c).alias(f"{prefix}{c}") for c in right_payload
    ]
    return matched.filter(F.col("__side") == 1).select(*out_cols)


def sessionize(
    events: DataFrame,
    key: str,
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap since the
    previous event of the same key exceeds ``gap_seconds``.

    Batch analog of Structured Streaming's ``session_window`` —
    lag-compare + running sum of session starts; one shuffle on the
    key. Adds ``session_seq`` (1-based per key)."""
    order_cols = [F.col(ts_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    w_order = Window.partitionBy(key).orderBy(*order_cols)
    w_running = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag(ts_col).over(w_order)
    new_session = F.when(
        prev_ts.isNull()
        | (
            F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
            > gap_seconds * 1_000_000
        ),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_seq", F.sum(new_session).over(w_running).cast("bigint")
    )


def gap_fill_daily(
    df: DataFrame,
    series_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Daily downsample with gap filling: sum per (series, day) over a
    dense day grid spanning the observed range — missing days emit 0.

    The grid is built by cross-joining the distinct SERIES side with
    the broadcast 1-ROW bounds aggregate and exploding
    sequence(min_day, max_day) per series row. Broadcast direction
    matters at scale: the day grid is bounded by the observed date
    span (thousands of rows at most) and the bounds row is bounded by
    1, while the series set is unbounded (100M series would never
    broadcast) — so the unbounded side streams and only the 1-row
    bounds ride the broadcast. The only real shuffle is the daily
    pre-aggregation (map-side partials first). This is the
    intraday→daily downsampling the reference's frequency column
    implies (reference app/ingestion/series_autoregister.py:50,89),
    made gap-complete."""
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = df.groupBy(F.col(series_col).alias("series"), day).agg(
        F.sum(value_col).alias("total"), F.count(F.lit(1)).alias("n_obs")
    )
    bounds = df.agg(
        F.min(F.to_date(F.col(ts_col))).alias("d0"),
        F.max(F.to_date(F.col(ts_col))).alias("d1"),
    )
    series = df.select(F.col(series_col).alias("series")).distinct()
    grid = series.crossJoin(F.broadcast(bounds)).select(
        "series", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    return (
        grid.join(daily, ["series", "day"], "left")
        .select(
            "series",
            "day",
            F.coalesce(F.col("total"), F.lit(0.0)).alias("total"),
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("bigint").alias("n_obs"),
        )
    )


def ewma(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.2,
    tiebreak: str | None = None,
) -> DataFrame:
    """Exponentially-weighted moving average per series — the classic
    smoother the reference's quality_flag screening implies, and a
    genuinely RECURSIVE operator (y_i = a*x_i + (1-a)*y_{i-1}) that no
    window frame expresses: every output depends on the entire prefix.

    Implemented as a grouped-map Pandas UDF (applyInPandas): one
    shuffle on the series key, then a sequential in-memory scan per
    group — the recurrence is embarrassingly parallel ACROSS series,
    inherently serial WITHIN one. That is the right physical shape at
    100 TB when series count >> executor count and single series fit
    in memory; for the single-giant-series case, chunk with carry-in
    state via applyInPandasWithState (see streaming/incremental.py) —
    the same recurrence, checkpointed.

    The closure is self-contained (imports inside) so external drivers
    that never ship this package to executors can still run it.
    """
    sort_cols = [ts_col] + ([tiebreak] if tiebreak else [])
    a = float(alpha)

    def smooth(pdf):
        import pandas as pd  # noqa: F401  (self-contained closure)

        pdf = pdf.sort_values(sort_cols)
        pdf["ewma"] = (
            pdf[value_col].ewm(alpha=a, adjust=False).mean().astype("float64")
        )
        return pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", ewma double"
    return df.groupBy(key).applyInPandas(smooth, schema=schema)
