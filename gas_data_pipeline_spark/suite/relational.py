"""Relational operators (SURVEY §2.2-§2.6): projections, filters,
joins, aggregations, windows, sorts, limits, set ops.

Cross-engine determinism rules used throughout (SURVEY §7 "what's
hard" #2/#3):

- every LIMIT sits on a total order with a unique tie-break key;
- double-typed SUMs round each term to fixed decimals, sum in
  DECIMAL (exact, associative — safe under Spark's partial
  aggregation), then cast the total back to double;
- collected lists are serialized under an explicit sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gas_data_pipeline_spark.catalog import table
from gas_data_pipeline_spark.plans.flagship import data_query, data_query_oracle_sql
from gas_data_pipeline_spark.registry import register


# ---------------------------------------------------------------------------
# Flagship: DATA_QUERY (J1 + F1 + P1 + W1 + W3) — reference
# app/api/v2/queries.py:3-26.
# ---------------------------------------------------------------------------

_FLAGSHIP_PARAMS = dict(
    mktsegment="BUILDING",
    start_date="1996-01-01",
    end_date="2000-12-31",
    min_price=50_000.0,
    limit=1000,
)


@register("flagship_data_query", oracle=data_query_oracle_sql(**_FLAGSHIP_PARAMS))
def flagship_data_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return data_query(
        spark,
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "customer"),
        **_FLAGSHIP_PARAMS,
    )


# F1 with every optional parameter null ⇒ the full join result
# (FIXTURES.md invariant 5). Ordered+limited high enough to cover all rows
# at sf<=0.1 is wasteful; instead aggregate to a checkable digest.
@register(
    "optional_filters_all_null",
    oracle="""
        SELECT count(*) AS n_rows,
               CAST(sum(CAST(round(o.o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def optional_filters_all_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    full = data_query(
        spark,
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "customer"),
        limit=(1 << 31) - 1,
    )
    return full.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# P1/P2 — projections (reference app/api/v2/queries.py:4-13, routes.py:57,
# gie.py:66).
# ---------------------------------------------------------------------------


@register(
    "projection_computed",
    oracle="""
        SELECT o_orderkey,
               o_orderdate AS observation_time,
               CAST(o_totalprice AS DOUBLE) AS value,
               CASE WHEN o_orderstatus = 'F' THEN 'FINAL' ELSE 'PROVISIONAL' END AS quality_flag,
               CASE WHEN TRUE THEN o_orderpriority ELSE NULL END AS raw_payload
        FROM orders
    """,
)
def projection_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2: explicit projection, conditional column (the reference's
    ``include_raw`` nulling, routes.py:57), cast-projection (gie.py:66)."""
    include_raw = True
    o = table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey"),
        F.col("o_orderdate").alias("observation_time"),
        F.col("o_totalprice").cast("double").alias("value"),
        F.when(F.col("o_orderstatus") == "F", F.lit("FINAL"))
        .otherwise(F.lit("PROVISIONAL"))
        .alias("quality_flag"),
        F.when(F.lit(include_raw), F.col("o_orderpriority"))
        .otherwise(F.lit(None).cast("string"))
        .alias("raw_payload"),
    )


# ---------------------------------------------------------------------------
# F3/F4/F6 — range, JSON, and null/invalid-value predicates.
# ---------------------------------------------------------------------------


@register(
    "range_scan_history",
    oracle="""
        SELECT ts AS observation_time, CAST(value AS DOUBLE) AS value
        FROM events
        WHERE user_id = 7
          AND ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
        ORDER BY ts
    """,
)
def range_scan_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3+W1: the client ``get_history`` range scan (reference
    app/client/gas_client.py:31-38) — key equality + time BETWEEN, time
    order. ``events`` plays the observation store; partition pruning on
    a date-partitioned silver table replaces the B-tree index."""
    e = table(spark, sf_dir, "events")
    return (
        e.filter(
            (F.col("user_id") == 7)
            & F.col("ts").between("2024-01-05 00:00:00", "2024-01-20 00:00:00")
        )
        .select(F.col("ts").alias("observation_time"), F.col("value").cast("double").alias("value"))
        .orderBy("observation_time")
    )


@register(
    "json_field_predicate",
    oracle="""
        SELECT event_id, event_type, CAST(json_extract_string(props, '$.k') AS INT) AS site_id
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INT) = 42
    """,
)
def json_field_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4+S9: semi-structured predicate ``(raw_payload ->> 'siteId')::int
    = :site_id`` (reference app/api/v2/discovery.py:73). At scale the
    extracted field would be materialized to a column at write time so
    the predicate can push down; here we extract inline."""
    e = table(spark, sf_dir, "events")
    site = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.withColumn("site_id", site)
        .filter(F.col("site_id") == 42)
        .select("event_id", "event_type", "site_id")
    )


@register(
    "null_invalid_value_filter",
    oracle="""
        SELECT event_id,
               TRY_CAST(nullif(trim(CASE WHEN event_type = 'error' THEN '' ELSE CAST(value AS VARCHAR) END), '') AS DOUBLE) AS value
        FROM events
        WHERE TRY_CAST(nullif(trim(CASE WHEN event_type = 'error' THEN '' ELSE CAST(value AS VARCHAR) END), '') AS DOUBLE) IS NOT NULL
    """,
)
def null_invalid_value_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6+S7+S8: the reference's value-cleaning gauntlet — blank-like
    strings to null (gie/constants.py:19), reject non-castable floats
    via try/except (transformer.py:83-86) — as try_cast + null filters.
    A synthetic "dirty" string column stands in for raw source values."""
    e = table(spark, sf_dir, "events")
    dirty = F.when(F.col("event_type") == "error", F.lit("")).otherwise(
        F.col("value").cast("string")
    )
    cleaned = F.nullif(F.trim(dirty), F.lit("")).try_cast("double")
    return (
        e.select("event_id", cleaned.alias("value"))
        .filter(F.col("value").isNotNull())
    )


# ---------------------------------------------------------------------------
# J1/J2/J3/J4 — joins.
# ---------------------------------------------------------------------------


@register(
    "star_join_3way",
    oracle="""
        SELECT r.r_name AS region, n.n_name AS nation,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o.o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    """,
)
def star_join_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: chained dim joins (reference app/api/v2/gie.py:52-55,
    ``daily ⋈ series ⋈ assets``). Every dimension is broadcast — the
    fact table is never shuffled for the joins; the only shuffle is the
    final partial-aggregated group-by."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "anti_join_delete",
    oracle="""
        SELECT c.c_custkey, c.c_name
        FROM customer c
        ANTI JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def anti_join_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: the join-delete ``DELETE FROM daily USING series WHERE ...``
    (reference gie/service.py:40-48) re-expressed as the surviving-rows
    anti-join — the set-based rewrite of a mutation."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "lookup_join_get_or_create",
    oracle="""
        WITH existing AS (
            SELECT DISTINCT c_mktsegment AS natural_key FROM customer WHERE c_mktsegment <> 'BUILDING'
        ),
        incoming AS (
            SELECT DISTINCT c_mktsegment AS natural_key FROM customer
        ),
        dim AS (
            SELECT natural_key, TRUE AS pre_existing FROM existing
            UNION ALL
            SELECT i.natural_key, FALSE FROM incoming i ANTI JOIN existing e USING (natural_key)
        )
        SELECT natural_key, pre_existing,
               CAST(row_number() OVER (ORDER BY pre_existing DESC, natural_key) AS BIGINT) AS surrogate_id
        FROM dim
    """,
)
def lookup_join_get_or_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: get-or-create (reference gie/series_builder.py:5-61) done
    set-based: probe the dimension with one left-anti join, mint
    surrogate keys for the misses in bulk — not row-at-a-time.

    Surrogates here are deterministic row_numbers so the oracle can
    reproduce them; a production engine would offset by max(existing id)
    or use hash keys to avoid the single-partition window.
    """
    c = table(spark, sf_dir, "customer")
    existing = (
        c.filter(F.col("c_mktsegment") != "BUILDING")
        .select(F.col("c_mktsegment").alias("natural_key"))
        .distinct()
        .withColumn("pre_existing", F.lit(True))
    )
    incoming = c.select(F.col("c_mktsegment").alias("natural_key")).distinct()
    misses = (
        incoming.join(existing.select("natural_key"), "natural_key", "left_anti")
        .withColumn("pre_existing", F.lit(False))
    )
    dim = existing.unionByName(misses)
    w = Window.orderBy(F.col("pre_existing").desc(), F.col("natural_key"))
    return dim.withColumn("surrogate_id", F.row_number().over(w).cast("bigint"))


# ---------------------------------------------------------------------------
# A1/A2/A3/A5 — aggregations.
# ---------------------------------------------------------------------------


@register(
    "distinct_datasets",
    oracle="SELECT DISTINCT event_type AS dataset_id FROM events ORDER BY dataset_id",
)
def distinct_datasets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: ``SELECT DISTINCT dataset_id FROM raw_events ORDER BY 1``
    (reference discovery.py:12)."""
    e = table(spark, sf_dir, "events")
    return (
        e.select(F.col("event_type").alias("dataset_id")).distinct().orderBy("dataset_id")
    )


@register(
    "distinct_composite_keys",
    oracle="""
        SELECT DISTINCT event_type AS indicator, user_id % 10 AS point_key, user_id % 2 AS direction_key
        FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    """,
)
def distinct_composite_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: distinct composite keys driving series auto-registration
    (reference series_autoregister.py:69-74 ``drop_duplicates`` over
    indicator/point/direction)."""
    e = table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type").isNotNull() & F.col("user_id").isNotNull())
        .select(
            F.col("event_type").alias("indicator"),
            (F.col("user_id") % 10).alias("point_key"),
            (F.col("user_id") % 2).alias("direction_key"),
        )
        .distinct()
    )


@register(
    "dedup_last_write_wins",
    oracle="""
        SELECT series_id, observation_time, value, event_id
        FROM (
            SELECT user_id AS series_id,
                   date_trunc('hour', ts) AS observation_time,
                   CAST(value AS DOUBLE) AS value,
                   event_id,
                   row_number() OVER (
                       PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        ) WHERE rn = 1
    """,
)
def dedup_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: in-batch last-write-wins dedup on the upsert key (reference
    loader.py:13-18 dict overwrite). The reference's tie-break is dict
    insertion order; the engine makes it explicit and deterministic:
    latest arrival time, then highest unique id (SURVEY §7 #3).
    One shuffle on the dedup key; at 100 TB this is the same shuffle
    the MERGE would need, so it's free in context."""
    e = table(spark, sf_dir, "events")
    keyed = e.select(
        F.col("user_id").alias("series_id"),
        F.date_trunc("hour", F.col("ts")).alias("observation_time"),
        F.col("value").cast("double").alias("value"),
        F.col("event_id"),
        F.col("ts"),
    )
    w = (
        Window.partitionBy("series_id", "observation_time")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
    )
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("series_id", "observation_time", "value", "event_id")
    )


@register(
    "group_to_nested",
    oracle="""
        SELECT user_id AS series_id,
               count(*) AS n_points,
               string_agg(
                   epoch_us(ts) || ':' || event_id || ':' || CAST(round(value * 100) AS BIGINT),
                   '|' ORDER BY ts, event_id
               ) AS points
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY user_id
    """,
)
def group_to_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/R5: group-to-nested — the API's ``points[]`` accumulation
    (reference routes.py:40-61 defaultdict loop) as
    ``collect_list(struct(...))`` under an explicit sort.

    For the cross-engine hash the nested array is serialized to a
    canonical string (epoch-micros : unique id : value-cents); the
    natural engine output is the struct array itself.
    """
    e = table(spark, sf_dir, "events")
    pts = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
    )
    encode = lambda x: F.concat_ws(  # noqa: E731
        ":",
        F.unix_micros(x["ts"]),
        x["event_id"].cast("string"),
        F.round(x["value"] * 100).cast("bigint").cast("string"),
    )
    return (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("series_id"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.array_join(F.transform(pts, encode), "|").alias("points"),
        )
    )


# ---------------------------------------------------------------------------
# Standard aggregates + grouping sets (SURVEY §2.4 "not present" row —
# provided natively by the engine).
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(8,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(8,2))
                        * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(8,2))
                        * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                        * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
               CAST(min(l_quantity) AS DOUBLE) AS min_qty,
               CAST(max(l_quantity) AS DOUBLE) AS max_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the standard-aggregate surface
    (sum/min/max/count) the reference lacks but the engine provides
    (SURVEY §2.4). Filter pushes to the scan; aggregation is partial
    (map-side combine) before the single shuffle. Values are cast to
    decimal and summed exactly so partial-aggregation order cannot
    change the result (exactness > float associativity).

    Precision budget (VERDICT r2 #5): the business values are exact
    2-decimal numbers (qty ≤ 50, price < 1e6, disc/tax < 1), so the
    tightest faithful casts are (8,2)/(3,2). Under Spark's decimal
    multiply rule (p1+p2+1, s1+s2) the full product chain tops out at
    (8,2)x(4,2)->(13,4), x(4,2)->(18,6) — every intermediate stays
    within precision 18, i.e. an UNSCALED-LONG-backed Decimal in
    codegen, never a per-row java.math.BigDecimal like the previous
    (12,4) casts forced (their chain hit precision 40). Exactness is
    unchanged; the hot loop is integer arithmetic."""
    li = table(spark, sf_dir, "lineitem")

    qty = F.col("l_quantity").cast("decimal(8,2)")
    ext = F.col("l_extendedprice").cast("decimal(8,2)")
    one = F.lit(1).cast("decimal(3,2)")
    disc = F.col("l_discount").cast("decimal(3,2)")
    tax = F.col("l_tax").cast("decimal(3,2)")

    def dsum(col, alias):
        return F.sum(col).cast("double").alias(alias)

    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(qty, "sum_qty"),
            dsum(ext, "sum_base_price"),
            dsum(ext * (one - disc), "sum_disc_price"),
            dsum(ext * (one - disc) * (one + tax), "sum_charge"),
            F.min("l_quantity").cast("double").alias("min_qty"),
            F.max("l_quantity").cast("double").alias("max_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "rollup_revenue",
    oracle="""
        SELECT r.r_name AS region, n.n_name AS nation,
               count(*) AS n_custs,
               CAST(sum(CAST(round(c.c_acctbal, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP (region -> nation -> grand total): grouping
    sets from the engine's native surface (SURVEY §2.4 not-present row)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("r_name").alias("region"), F.col("n_name").alias("nation"), "c_acctbal")
        .rollup("region", "nation")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(F.round("c_acctbal", 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# W1/W2/W3 — sorts, top-k, pagination; plus native window functions.
# ---------------------------------------------------------------------------


@register(
    "topn_recency",
    oracle="""
        SELECT event_id, ts AS ingested_at, event_type
        FROM events
        ORDER BY ts DESC, event_id DESC
        LIMIT 500
    """,
)
def topn_recency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: ``ORDER BY ingested_at DESC LIMIT k`` (reference
    discovery.py:49-51, export.py:24-26). Spark plans this as
    TakeOrderedAndProject — per-partition top-k then a k-row merge on
    the driver; no global sort even at 100 TB."""
    e = table(spark, sf_dir, "events")
    return (
        e.select("event_id", F.col("ts").alias("ingested_at"), "event_type")
        .orderBy(F.col("ingested_at").desc(), F.col("event_id").desc())
        .limit(500)
    )


@register(
    "limit_offset_pagination",
    oracle="""
        SELECT o_orderkey, o_orderdate, o_totalprice
        FROM orders
        ORDER BY o_orderdate, o_orderkey
        LIMIT 200 OFFSET 300
    """,
)
def limit_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: LIMIT/OFFSET pagination (reference queries.py:25) over a
    deterministic total order. Spark 3.4+ has a native offset; the
    row_number fallback is documented in SURVEY §2.5."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
        .offset(300)
        .limit(200)
    )


@register(
    "window_functions",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice,
               CAST(row_number() OVER w AS BIGINT) AS order_seq,
               CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS BIGINT) AS price_rank,
               lag(o_totalprice) OVER w AS prev_price,
               lead(o_totalprice) OVER w AS next_price,
               CAST(sum(CAST(round(o_totalprice,2) AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function surface (rank/lag/lead/frames) — absent from the
    reference (SURVEY §2.5 not-present row), provided natively. One
    shuffle on the partition key serves all five functions."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wprice = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).cast("bigint").alias("order_seq"),
        F.rank().over(wprice).cast("bigint").alias("price_rank"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)"))
        .over(wrun)
        .cast("double")
        .alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.6): schema-harmonized union.
# ---------------------------------------------------------------------------


@register(
    "union_by_name_harmonized",
    oracle="""
        SELECT * FROM (
            SELECT c_custkey AS entity_key, c_name AS name, c_acctbal AS acctbal,
                   c_mktsegment AS mktsegment, 'customer' AS entity_kind
            FROM customer
            UNION ALL BY NAME
            SELECT s_suppkey AS entity_key, s_name AS name, s_acctbal AS acctbal,
                   NULL AS mktsegment, 'supplier' AS entity_kind
            FROM supplier
        )
    """,
)
def union_by_name_harmonized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6: the reference's cross-dataset union is structural (all
    sources share one long table); ``unionByName(allowMissingColumns)``
    is the engine's explicit equivalent when merging per-source frames
    (SURVEY §2.6, run_all.py:78-118)."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.lit("customer").alias("entity_kind"),
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("entity_kind"),
    )
    return c.unionByName(s, allowMissingColumns=True)


@register(
    "semi_join_urgent_customers",
    oracle="""
        SELECT c.c_custkey, c.c_name, c.c_mktsegment
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
        )
    """,
)
def semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join: customers with at least one urgent
    order. Complements anti_join_delete (J3's NOT EXISTS rewrite) —
    together they cover both halves of the reference's conditional-
    mutation pattern (reference app/ingestion/gie/service.py:40-48).
    The priority filter is pushed below the join so the build side
    carries only urgent orders (~20% of the table), and a semi join
    emits at most one probe row per customer — no post-join distinct."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "set_ops_repeat_buyers",
    oracle="""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            AND year(o_orderdate) = 1996
    """,
)
def set_ops_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT surface (SURVEY §2.6 lists set ops as absent
    from the reference — the engine provides them natively): customers
    active in both 1995 and 1996, minus those with a finalized 1996
    order. Spark rewrites both set ops to semi/anti hash joins over
    distinct inputs — three aggregates and two joins, all partitioned
    on the same key, so AQE coalesces them onto one exchange chain."""
    o = table(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    fin96 = o.filter(
        (F.col("o_orderstatus") == "F") & (F.year("o_orderdate") == 1996)
    ).select("o_custkey")
    return y95.intersect(y96).exceptAll(fin96.distinct())


@register(
    "decile_order_values",
    oracle="""
        SELECT decile,
               count(*) AS n,
               round(min(o_totalprice), 2) AS lo,
               round(max(o_totalprice), 2) AS hi,
               round(avg(o_totalprice), 4) AS avg_price
        FROM (
            SELECT o_totalprice,
                   CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey)
                        AS BIGINT) AS decile
            FROM orders
        )
        GROUP BY decile
    """,
)
def decile_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decile boundaries via ntile — a distribution-audit query.
    ntile over an unpartitioned window is a deliberate scale tradeoff:
    it needs a global sort (range exchange + per-partition rank fixup
    is how Spark plans it — it does NOT funnel to one task's memory,
    but it is a full sort of the column). For monitoring at 100 TB use
    percentiles_by_series' approx_percentile t-digest instead; this
    query is the exact cross-check run on samples. o_orderkey breaks
    price ties so both engines assign identical deciles."""
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_totalprice", F.ntile(10).over(w).cast("bigint").alias("decile")
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


_Q3_SQL = """
    SELECT o.o_orderkey,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 2)
                         AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           o.o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
"""


@register("sql_topn_revenue_report", oracle=_Q3_SQL)
def sql_topn_revenue_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL surface: the same ANSI text runs on Spark (over
    the catalog's registered views) and on DuckDB as its own oracle —
    zero translation, which is the reference's consumption model (its
    query layer is raw SQL, reference app/db/queries.py:3-26). TPC-H
    Q3 shape: segment filter -> 3-way join -> grouped revenue -> top
    10. Catalyst gets the full statement, so it broadcasts the
    filtered dims and plans TakeOrderedAndProject for the LIMIT; the
    decimal round keeps the float sum order-insensitive for the value
    hash."""
    from gas_data_pipeline_spark.catalog import load_tables

    load_tables(spark, sf_dir, register_views=True)
    # Spark needs TIMESTAMP literals in UTC session tz — identical text
    # works in both engines.
    return spark.sql(_Q3_SQL)


@register(
    "sql_q5_local_supplier_volume",
    oracle="""
        SELECT n.n_name AS nation,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(8,2))
                        * (CAST(1 AS DECIMAL(3,2))
                           - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                   AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        GROUP BY n.n_name
    """,
)
def sql_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — local supplier volume: the 6-table star/snake
    join (customer⋈orders⋈lineitem⋈supplier⋈nation⋈region) with a
    selective region filter and the customer-nation = supplier-nation
    equality that makes join ORDER matter. Declared as one SQL
    statement so Catalyst does the planning: the region/nation dims
    broadcast, the region filter prunes nation keys BEFORE the big
    fact joins, and the o_orderdate predicate pushes to the orders
    scan. Revenue in exact decimal, cast to double at the end (the
    `pricing_summary` discipline). At 100 TB only the
    orders⋈lineitem⋈(customer,supplier) joins shuffle — everything
    else rides broadcasts."""
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        table(spark, sf_dir, t).createOrReplaceTempView(f"q5_{t}")
    return spark.sql(
        """
        SELECT n.n_name AS nation,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(8,2))
                        * (CAST(1 AS DECIMAL(3,2))
                           - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                   AS revenue
        FROM q5_customer c
        JOIN q5_orders o ON c.c_custkey = o.o_custkey
        JOIN q5_lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN q5_supplier s ON l.l_suppkey = s.s_suppkey
                          AND c.c_nationkey = s.s_nationkey
        JOIN q5_nation n ON s.s_nationkey = n.n_nationkey
        JOIN q5_region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        GROUP BY n.n_name
        """
    )
