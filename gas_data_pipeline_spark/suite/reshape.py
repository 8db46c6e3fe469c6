"""Reshaping operators (SURVEY §2.8) + schema discovery (A4) — the
reference's most distinctive computation, re-expressed set-based.

The reference loops batch × series (run_all.py:91-118, O(series ×
batch)); every melt here is a single linear pass producing all series
rows at once (SURVEY R3: "do not loop").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from gas_data_pipeline_spark.catalog import spread_scan, table
from gas_data_pipeline_spark.functions import make_series_id, make_series_id_static
from gas_data_pipeline_spark.registry import register

# R2 exclusion set — stands in for the reference's EXCLUDED_KEYS
# (gie/constants.py:9-17): bookkeeping fields that never become series.
EXCLUDED_KEYS = ("o_orderkey", "o_orderdate")


def melt_numeric(
    df: DataFrame, id_cols: list[str], exclude: tuple[str, ...] = ()
) -> DataFrame:
    """R1: wide→long unpivot over *dynamically detected* numeric columns
    (reference series_autoregister.py:26-31 "numeric dtype only" rule —
    the column set comes from the schema, not a hardcoded list).
    ``melt`` is a zero-shuffle narrow transformation: each input row
    yields k output rows in place — but it therefore inherits the
    SCAN's split count, so a small table (1-3 parquet splits) would
    run its k× row expansion on 1-3 cores. Project down to the melt's
    input columns and spread_scan first: the round-robin moves only
    the narrow projection, no-ops once the scan has enough splits (the
    100 TB regime), and measured 2.4x on this query at sf0.1. Keyed
    (hash/range) shuffles stay forbidden — pinned in
    tests/test_plans.py."""
    value_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, DoubleType)
        and f.name not in id_cols
        and f.name not in exclude
    ]
    narrow = spread_scan(df.select(*id_cols, *sorted(value_cols)))
    return narrow.melt(
        ids=id_cols,
        values=sorted(value_cols),
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "melt_wide_to_long",
    oracle="""
        SELECT l_orderkey, l_linenumber, metric, value,
               'NG_LINEITEM_' || upper(metric) AS series_id
        FROM (
            SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax
            FROM lineitem
        ) UNPIVOT (value FOR metric IN (l_discount, l_extendedprice, l_quantity, l_tax))
    """,
)
def melt_wide_to_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1+S1: melt lineitem's numeric measures into the long observation
    format, deriving series_id from the melt keys in the same pass
    (exactly what replaces the reference's per-series loop R3). The
    metric domain is the dynamically-detected numeric column set — a
    plan-time constant — so the series slug is a map-literal lookup
    (`make_series_id_static`), not a per-row regex over the k×N melt
    output (the regex was 4x this query's runtime at the 8x probe)."""
    li = table(spark, sf_dir, "lineitem")
    id_cols = ["l_orderkey", "l_linenumber"]
    long = melt_numeric(li, id_cols=id_cols)
    domain = sorted(
        f.name
        for f in li.schema.fields
        if isinstance(f.dataType, DoubleType) and f.name not in id_cols
    )
    return long.withColumn(
        "series_id", make_series_id_static("LINEITEM", F.col("metric"), domain)
    )


@register(
    "json_key_melt",
    oracle="""
        SELECT o_orderkey, field AS variable, value
        FROM (
            SELECT o_orderkey,
                   o_orderstatus AS payload_status,
                   o_orderpriority AS payload_priority,
                   CAST(o_custkey AS VARCHAR) AS payload_custkey
            FROM orders
        ) UNPIVOT (value FOR field IN (payload_custkey, payload_priority, payload_status))
    """,
)
def json_key_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: key-driven melt of a JSON payload — every non-excluded key
    becomes a (entity, variable, value) row (reference
    gie/transformer.py:5-64). The key set is *data-driven*: the engine
    explodes ``map_entries(from_json(payload))`` rather than naming
    columns, so new upstream fields appear as new series automatically.
    """
    # JSON construct/parse are interpreted (non-codegen) expressions:
    # spread the 1-split scan so they run on every core, not one.
    o = spread_scan(table(spark, sf_dir, "orders"))
    payload = F.to_json(
        F.struct(
            "o_orderkey",
            "o_orderdate",
            "o_orderstatus",
            "o_orderpriority",
            F.col("o_custkey").cast("string").alias("o_custkey"),
        )
    )
    raw = o.select("o_orderkey", payload.alias("payload"))
    entries = raw.select(
        "o_orderkey",
        F.explode(
            F.map_entries(F.from_json("payload", "map<string,string>"))
        ).alias("kv"),
    )
    return (
        entries.filter(~F.col("kv.key").isin(*EXCLUDED_KEYS))
        .select(
            "o_orderkey",
            F.concat(F.lit("payload_"), F.regexp_replace("kv.key", "^o_order|^o_", "")).alias(
                "variable"
            ),
            F.col("kv.value").alias("value"),
        )
    )


@register(
    "json_key_melt_nested",
    oracle="""
        SELECT o_orderkey, variable, value FROM (
            SELECT o_orderkey, 'custkey' AS variable,
                   CAST(o_custkey AS DOUBLE) AS value FROM orders
            UNION ALL
            SELECT o_orderkey, 'pressure', CAST(NULL AS DOUBLE) FROM orders
            UNION ALL
            SELECT o_orderkey, 'storage_injection',
                   CAST(o_orderkey % 97 AS DOUBLE) FROM orders
            UNION ALL
            SELECT o_orderkey, 'storage_withdrawal', CAST(NULL AS DOUBLE) FROM orders
        )
    """,
)
def json_key_melt_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 (nested): one-level nested-dict flatten — map-valued payload
    entries fan out a second time with ``variable = key || '_' || subkey``
    (reference gie/transformer.py:25-43, the ALSI branch). Semantics kept
    from the reference: EXCLUDED_KEYS filtered before the fan-out,
    null-like values ('', ' ') become NULL *rows*, non-numeric values are
    dropped (the reference's ``continue``), everything else coerces to
    double. Single narrow pass: nested entries become an array of
    (variable, raw) structs via ``transform(map_entries(...))`` and
    scalars a 1-element array, so one ``explode`` handles both branches —
    no union, no shuffle."""
    o = spread_scan(table(spark, sf_dir, "orders"))
    payload = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("orderkey"),  # excluded bookkeeping key
            F.col("o_orderstatus").alias("status"),  # non-numeric -> dropped
            F.col("o_custkey").cast("string").alias("custkey"),
            F.lit(" ").alias("pressure"),  # null-like -> NULL row
            F.struct(
                (F.col("o_orderkey") % 97).cast("string").alias("injection"),
                F.lit("").alias("withdrawal"),  # null-like subvalue
                F.col("o_orderpriority").alias("note"),  # non-numeric -> dropped
            ).alias("storage"),
        )
    )
    from gas_data_pipeline_spark.functions.melt import melt_json_keys_nested

    raw = o.select("o_orderkey", payload.alias("payload"))
    return melt_json_keys_nested(
        raw, id_cols=["o_orderkey"], excluded_keys=("orderkey",)
    )


@register(
    "gie_rest_datasource_melt",
    oracle="""
        WITH days AS (
            SELECT unnest(generate_series(
                DATE '2024-03-01', DATE '2024-03-06', INTERVAL 1 DAY
            ))::DATE AS d
        ),
        countries(country) AS (VALUES ('germany'), ('france')),
        base AS (
            SELECT country, CAST(d AS TIMESTAMP) AS date,
                   CASE WHEN datediff('day', DATE '0000-12-31', d) % 5 = 0
                        THEN 'N' ELSE 'E' END AS quality,
                   datediff('day', DATE '0000-12-31', d) AS o,
                   length(country) AS cl
            FROM countries CROSS JOIN days
        )
        SELECT country, date, variable, value, quality FROM (
            SELECT country, date, 'gasInStorage' AS variable,
                   round(500.0 + 10 * cl + 0.25 * (o % 13), 4) AS value,
                   quality FROM base
            UNION ALL SELECT country, date, 'injection',
                   round(5.0 + cl + 0.1 * (o % 7), 4), quality FROM base
            UNION ALL SELECT country, date, 'withdrawal',
                   round(3.0 + cl + 0.05 * (o % 11), 4), quality FROM base
            UNION ALL SELECT country, date, 'full',
                   CAST(NULL AS DOUBLE), quality FROM base
            UNION ALL SELECT country, date, 'lng_inventory',
                   round(40.0 + cl + 0.2 * (o % 9), 4), quality FROM base
            UNION ALL SELECT country, date, 'lng_sendOut',
                   round(7.0 + cl + 0.02 * (o % 5), 4), quality FROM base
        )
    """,
)
def gie_rest_datasource_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRC6 as a native Spark 4 Python DataSource (VERDICT r11 #8):
    ``spark.read.format("gie_rest")`` plans one scan task PER COUNTRY
    (the GIE API's pagination unit — a 30-country backfill fans out as
    30 executor tasks instead of the reference's serial driver loop,
    gie/client.py analog), each task fetching its window under the
    shared retry policy and emitting entries with their raw JSON as a
    column. The R2 key-driven melt then runs as a normal downstream
    DataFrame pass (functions/melt.py): excluded bookkeeping keys
    filtered, null-like values -> NULL rows, non-numeric dropped,
    ALSI-style nested dicts fanning out as ``key_subkey`` — and the
    reference's no-gasDayStart skip (gie/transformer.py:12-13) is the
    explicit date filter here, not silent source-side dropping. The
    oracle replays the deterministic fixture payload entirely in SQL,
    so the WHOLE path — per-country partition planning, fetch,
    flatten — is value-checked."""
    from gas_data_pipeline_spark.sources.pyds import register_gie_source
    from gas_data_pipeline_spark.sources.rest import GIE_EXCLUDED_KEYS

    register_gie_source(spark)
    raw = (
        spark.read.format("gie_rest")
        .option("countries", "germany,france")
        .option("start", "2024-03-01")
        .option("end", "2024-03-06")
        .option("transport", "fixture")
        .load()
    )
    from gas_data_pipeline_spark.functions.melt import melt_json_keys_nested

    base = raw.select(
        "country",
        F.to_date("gas_day").alias("date"),
        F.col("status").alias("quality"),
        "payload",
    ).filter(F.col("date").isNotNull())
    melted = melt_json_keys_nested(
        base,
        id_cols=["country", "date", "quality"],
        # "trend" is deliberately NOT excluded: it is non-numeric and
        # must be dropped by the melt's try_cast rule, not by fiat.
        excluded_keys=GIE_EXCLUDED_KEYS + ("status",),
    )
    return melted.select(
        "country",
        F.col("date").cast("timestamp").alias("date"),
        "variable",
        "value",
        "quality",
    )


@register(
    "field_profile",
    oracle="""
        WITH cells AS (
            SELECT 'event_id' AS field, CAST(event_id AS VARCHAR) AS value FROM events
            UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
            UNION ALL SELECT 'event_type', event_type FROM events
            UNION ALL SELECT 'value', CAST(value AS VARCHAR) FROM events
            UNION ALL SELECT 'props', CASE WHEN event_type = 'error' THEN NULL ELSE props END FROM events
            UNION ALL SELECT 'is_error', CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END FROM events
            UNION ALL SELECT 'flag', CASE event_type WHEN 'click' THEN 'true'
                                                     WHEN 'view' THEN 'false'
                                                     ELSE CAST(user_id AS VARCHAR) END FROM events
        ),
        typed AS (
            SELECT field, value,
                   CASE
                     WHEN value IS NULL THEN NULL
                     WHEN value IN ('true','false') THEN 'boolean'
                     WHEN regexp_matches(value, '^-?\\d+$') THEN 'integer'
                     WHEN regexp_matches(value, '^-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$') THEN 'float'
                     WHEN regexp_matches(value, '^[\\[{]') THEN 'json'
                     ELSE 'string'
                   END AS value_type
            FROM cells
        )
        SELECT field AS field_name,
               count(*) AS n_rows,
               count(*) - count(value) AS n_nulls,
               substr(min(value), 1, 200) AS example_value,
               COALESCE(NULLIF(string_agg(DISTINCT value_type, ',' ORDER BY value_type), ''), 'null')
                 AS inferred_type
        FROM typed
        GROUP BY field
    """,
)
def field_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: schema-profiling aggregate — per field: row/null counts,
    deterministic example, inferred type from the reference's lattice
    ``null|boolean|integer|float|json|string``
    (field_discovery.py:5-16,30-48). The reference scans payload dicts
    row-at-a-time in Python; here it is melt + one hash aggregate
    (map-side combinable, one shuffle of ~|fields| groups).
    """
    e = spread_scan(table(spark, sf_dir, "events"))
    # Synthesize some nulls so the null-count path is exercised. The
    # melt is an explicit explode(array(struct...)) — null cells are
    # *kept* (SQL UNPIVOT would drop them), because a null is exactly
    # what the profiler counts.
    typed = e.select(
        F.col("event_id").cast("string").alias("event_id"),
        F.col("user_id").cast("string").alias("user_id"),
        "event_type",
        F.col("value").cast("string").alias("value"),
        # == / otherwise (not !=) so NULL event_type keeps props,
        # exactly like the oracle's CASE WHEN = 'error' THEN NULL.
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("props"))
        .alias("props"),
        # Exercises the pure-boolean path: both 'true' AND 'false' occur.
        F.when(F.col("event_type") == "error", F.lit("true"))
        .otherwise(F.lit("false"))
        .alias("is_error"),
        # Exercises the mixed-type union: reports "boolean,integer".
        F.when(F.col("event_type") == "click", F.lit("true"))
        .when(F.col("event_type") == "view", F.lit("false"))
        .otherwise(F.col("user_id").cast("string"))
        .alias("flag"),
    )
    fields = ["event_id", "user_id", "event_type", "value", "props", "is_error", "flag"]
    cells = typed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("field_name"), F.col(name).alias("cell")
                    )
                    for name in fields
                ]
            )
        ).alias("kv")
    ).select("kv.field_name", "kv.cell")
    from gas_data_pipeline_spark.functions.profiling import (
        infer_value_type,
        inferred_type_agg,
    )

    v = F.col("cell")
    return cells.groupBy("field_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count(v)).alias("n_nulls"),
        # Example truncated to 200 chars like the reference catalog
        # (field_discovery.py:62) and the engine's field registrar.
        F.substring(F.min(v), 1, 200).alias("example_value"),
        inferred_type_agg(infer_value_type(v)).alias("inferred_type"),
    )


@register(
    "nest_unnest_roundtrip",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def nest_unnest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5 + R4: group-to-nested (the API's points[] — routes.py:40-61)
    then nested-flatten back (the SRC1-5 explode chains). The roundtrip
    equals the flat join — proving both directions are lossless."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    nested = (
        o.groupBy("o_custkey")
        .agg(
            F.collect_list(F.struct("o_orderkey", "o_totalprice")).alias("orders")
        )
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey, "inner")
        .select("c_custkey", "c_name", "orders")
    )
    return nested.select(
        "c_custkey", "c_name", F.explode("orders").alias("o")
    ).select("c_custkey", "c_name", F.col("o.o_orderkey"), F.col("o.o_totalprice"))


@register(
    "pivot_long_to_wide",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               sum(CASE WHEN metric = 'l_quantity' THEN value END) AS qty,
               sum(CASE WHEN metric = 'l_extendedprice' THEN value END) AS price,
               sum(CASE WHEN metric = 'l_discount' THEN value END) AS discount,
               sum(CASE WHEN metric = 'l_tax' THEN value END) AS tax
        FROM (
            SELECT l_orderkey, l_linenumber, metric, value FROM (
                SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                       l_discount, l_tax
                FROM lineitem
            ) UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))
        )
        GROUP BY l_orderkey, l_linenumber
    """,
)
def pivot_long_to_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1-inverse: pivot the long observation format back to wide —
    melt and pivot round-trip the same rows. The pivot column values
    are DECLARED (not discovered), so Spark skips the extra
    distinct-scan job and plans a single hash aggregate with the pivot
    expressions as map-side combinable aggregates."""
    # melt_numeric spreads its narrow projection internally — no outer
    # spread_scan (that would round-robin the full-width scan twice).
    li = table(spark, sf_dir, "lineitem")
    long = melt_numeric(li, id_cols=["l_orderkey", "l_linenumber"])
    renames = {
        "l_quantity": "qty",
        "l_extendedprice": "price",
        "l_discount": "discount",
        "l_tax": "tax",
    }
    wide = (
        long.groupBy("l_orderkey", "l_linenumber")
        .pivot("metric", list(renames))
        .sum("value")
    )
    out = wide
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out


def _profile_sql(cells: str) -> str:
    """Profile a (field, value) relation: inferred-type lattice set +
    null rate — the same kernel as the ``field_profile`` oracle."""
    return f"""
            SELECT field,
                   COALESCE(NULLIF(string_agg(DISTINCT value_type,
                       ',' ORDER BY value_type), ''), 'null') AS inferred_type,
                   round((count(*) - count(value)) / count(*), 6) AS null_rate
            FROM (
                SELECT field, value,
                       CASE
                         WHEN value IS NULL THEN NULL
                         WHEN value IN ('true','false') THEN 'boolean'
                         WHEN regexp_matches(value, '^-?\\d+$') THEN 'integer'
                         WHEN regexp_matches(value, '^-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$') THEN 'float'
                         WHEN regexp_matches(value, '^[\\[{{]') THEN 'json'
                         ELSE 'string'
                       END AS value_type
                FROM {cells}
            ) GROUP BY field
"""


@register(
    "schema_drift_audit",
    oracle=f"""
        WITH base_cells AS (
            SELECT 'event_id' AS field, CAST(event_id AS VARCHAR) AS value
            FROM events WHERE event_id % 2 = 0
            UNION ALL SELECT 'value', CAST(value AS VARCHAR)
            FROM events WHERE event_id % 2 = 0
            UNION ALL SELECT 'props', props
            FROM events WHERE event_id % 2 = 0
            UNION ALL SELECT 'legacy_code', CAST(user_id AS VARCHAR)
            FROM events WHERE event_id % 2 = 0
        ),
        cur_cells AS (
            SELECT 'event_id' AS field, CAST(event_id AS VARCHAR) AS value
            FROM events WHERE event_id % 2 = 1
            UNION ALL SELECT 'value',
                CASE WHEN event_type = 'click' THEN 'oops'
                     ELSE CAST(value AS VARCHAR) END
            FROM events WHERE event_id % 2 = 1
            UNION ALL SELECT 'props',
                CASE WHEN event_type = 'error' THEN NULL ELSE props END
            FROM events WHERE event_id % 2 = 1
            UNION ALL SELECT 'new_field', event_type
            FROM events WHERE event_id % 2 = 1
        ),
        base_prof AS ({_profile_sql("base_cells")}),
        cur_prof AS ({_profile_sql("cur_cells")})
        SELECT coalesce(b.field, c.field) AS field_name,
               CASE WHEN b.field IS NULL THEN 'added'
                    WHEN c.field IS NULL THEN 'dropped'
                    WHEN b.inferred_type <> c.inferred_type THEN 'type_changed'
                    WHEN abs(c.null_rate - b.null_rate) > 0.1 THEN 'null_rate_shift'
                    ELSE 'stable' END AS status,
               b.inferred_type AS type_base,
               c.inferred_type AS type_cur,
               b.null_rate AS null_rate_base,
               c.null_rate AS null_rate_cur
        FROM base_prof b FULL OUTER JOIN cur_prof c ON b.field = c.field
    """,
)
def schema_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract audit between two snapshot profiles of the same
    feed — the discovery-layer complement to `drift_psi_features`
    (values drift there; SHAPE drifts here). Each snapshot is melted
    and profiled with the reference's type lattice (field_discovery.py
    5-48, same kernel as `field_profile`), then the two fields-sized
    profiles full-outer join into one verdict per field: `added` /
    `dropped` / `type_changed` / `null_rate_shift` (>10 points) /
    `stable`. The planted evolution exercises every verdict: a field
    dropped (`legacy_code`), added (`new_field`), type-widened
    (`value` gains string 'oops' cells), and null-degraded (`props`
    nulled on errors), with `event_id` the stable control.

    100 TB shape: the row-sized work is the two melt+aggregate passes
    (map-side combinable, one ~|fields|-group exchange each —
    `field_profile`'s own cost); the diff join and verdicts are
    fields-sized. Snapshot profiles are the mergeable summary a
    catalog would persist per ingest cycle, so in production the diff
    costs nothing but the two catalog reads."""
    from gas_data_pipeline_spark.functions.profiling import (
        infer_value_type,
        inferred_type_agg,
    )

    ev = spread_scan(table(spark, sf_dir, "events"))

    def melt(df: DataFrame, fields: dict[str, F.Column]) -> DataFrame:
        return df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(n).alias("field_name"), c.alias("cell"))
                        for n, c in fields.items()
                    ]
                )
            ).alias("kv")
        ).select("kv.field_name", "kv.cell")

    def profile(cells: DataFrame) -> DataFrame:
        return cells.groupBy("field_name").agg(
            inferred_type_agg(infer_value_type(F.col("cell"))).alias("inferred_type"),
            F.round(
                (F.count(F.lit(1)) - F.count("cell")) / F.count(F.lit(1)), 6
            ).alias("null_rate"),
        )

    base = profile(
        melt(
            ev.filter(F.col("event_id") % 2 == 0),
            {
                "event_id": F.col("event_id").cast("string"),
                "value": F.col("value").cast("string"),
                "props": F.col("props"),
                "legacy_code": F.col("user_id").cast("string"),
            },
        )
    )
    cur = profile(
        melt(
            ev.filter(F.col("event_id") % 2 == 1),
            {
                "event_id": F.col("event_id").cast("string"),
                "value": F.when(F.col("event_type") == "click", "oops").otherwise(
                    F.col("value").cast("string")
                ),
                # Mirror the oracle's CASE WHEN = 'error' THEN NULL
                # ELSE props exactly: the != form would also null props
                # for NULL event_type, a latent parity divergence.
                "props": F.when(
                    F.col("event_type") == "error", F.lit(None)
                ).otherwise(F.col("props")),
                "new_field": F.col("event_type"),
            },
        )
    )
    b = base.select(
        F.col("field_name"),
        F.col("inferred_type").alias("type_base"),
        F.col("null_rate").alias("null_rate_base"),
    )
    c = cur.select(
        F.col("field_name"),
        F.col("inferred_type").alias("type_cur"),
        F.col("null_rate").alias("null_rate_cur"),
    )
    diff = b.join(c, "field_name", "full_outer")
    status = (
        F.when(F.col("type_base").isNull(), "added")
        .when(F.col("type_cur").isNull(), "dropped")
        .when(F.col("type_base") != F.col("type_cur"), "type_changed")
        .when(
            F.abs(F.col("null_rate_cur") - F.col("null_rate_base")) > 0.1,
            "null_rate_shift",
        )
        .otherwise("stable")
    )
    return diff.select(
        "field_name",
        status.alias("status"),
        "type_base",
        "type_cur",
        "null_rate_base",
        "null_rate_cur",
    )
