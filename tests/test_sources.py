"""SRC1-SRC5 flattener tests on synthetic JSON fixtures shaped like the
reference's API envelopes (reference app/ingestion/national_gas_client.py
:106-116, :176-183, :207-218, :249-259; app/api/v2/ingestion.py:113-128).
No network — ``json_batch_to_df`` turns dicts into DataFrames."""

from __future__ import annotations

from gas_data_pipeline_spark.sources.rest import (
    flatten_entsog,
    flatten_gas_quality,
    flatten_instantaneous_flow,
    flatten_publication_catalogue,
    flatten_publications,
    json_batch_to_df,
)

GAS_QUALITY = {
    "sites": [
        {
            "siteId": 1,
            "siteName": "St Fergus",
            "areaName": "North",
            "siteGasQualityDetail": [
                {"applicableAt": "2024-01-01T00:00:00Z", "CV": 39.1, "WI": 51.2},
                {"applicableAt": "2024-01-01T01:00:00Z", "CV": 39.2, "WI": 51.1},
            ],
        },
        {
            "siteId": 2,
            "siteName": "Bacton",
            "areaName": "East",
            "siteGasQualityDetail": [
                {"applicableAt": "2024-01-01T00:00:00Z", "CV": 38.9, "WI": 50.8}
            ],
        },
    ]
}

ENTSOG = {
    "operationaldatas": [
        {"indicator": "Physical Flow", "pointKey": "P1", "value": 10.5},
        {"indicator": "Nomination", "pointKey": "P2", "value": 4.2},
    ]
}

INSTANTANEOUS = {
    "instantaneousFlow": [
        {
            "applicableAt": "2024-01-01T12:00:00Z",
            "sites": [
                {
                    "siteName": "St Fergus",
                    "siteGasDetail": [
                        {"flowRate": 12.3, "scheduledFlowRate": 12.0, "quality": "OK"},
                        {"flowRate": 12.4, "scheduledFlowRate": 12.0, "quality": "OK"},
                    ],
                },
                {
                    "siteName": "Bacton",
                    "siteGasDetail": [
                        {"flowRate": 5.0, "scheduledFlowRate": 5.5, "quality": "EST"}
                    ],
                },
            ],
        }
    ]
}

PUBLICATIONS = {
    "data": [
        {
            "publicationId": 101,
            "publicationName": "Demand Forecast",
            "publications": [
                {"applicableAt": "2024-01-01", "value": 250.0},
                {"applicableAt": "2024-01-02", "value": 255.0},
            ],
        }
    ]
}

CATALOGUE = {
    "data": [
        {
            "subCategory": [
                {
                    "catalogueEntries": [
                        {"publicationId": 101, "publicationName": "Demand Forecast"},
                        {"publicationId": None, "publicationName": "orphan"},
                        {"publicationId": 102, "publicationName": "Supply Forecast"},
                    ]
                }
            ]
        }
    ]
}


def test_flatten_gas_quality_carries_parent_attrs(spark):
    out = flatten_gas_quality(json_batch_to_df(spark, [GAS_QUALITY])).toPandas()
    assert len(out) == 3  # 2 + 1 detail rows
    assert set(out.columns) >= {"siteId", "siteName", "areaName", "CV", "WI"}
    fergus = out[out.siteId == 1]
    assert (fergus.siteName == "St Fergus").all()
    assert sorted(fergus.CV) == [39.1, 39.2]


def test_flatten_entsog_unwraps_and_normalizes(spark):
    out = flatten_entsog(json_batch_to_df(spark, [ENTSOG])).toPandas()
    assert len(out) == 2
    # "Physical Flow" -> "PhysicalFlow" (reference :163-165)
    assert set(out.indicator) == {"PhysicalFlow", "Nomination"}


def test_flatten_instantaneous_three_levels(spark):
    out = flatten_instantaneous_flow(
        json_batch_to_df(spark, [INSTANTANEOUS])
    ).toPandas()
    assert len(out) == 3  # 2 + 1 innermost rows
    assert (out.applicableAt == "2024-01-01T12:00:00Z").all()
    assert set(out.siteName) == {"St Fergus", "Bacton"}
    assert list(out.columns) == [
        "applicableAt", "siteName", "flowRate", "scheduledFlowRate", "quality",
    ]


def test_flatten_publications_carries_pub_id(spark):
    out = flatten_publications(json_batch_to_df(spark, [PUBLICATIONS])).toPandas()
    assert len(out) == 2
    assert (out.publicationId == 101).all()
    assert sorted(out.value) == [250.0, 255.0]


def test_flatten_catalogue_drops_null_ids(spark):
    out = flatten_publication_catalogue(
        json_batch_to_df(spark, [CATALOGUE])
    ).toPandas()
    assert sorted(out.publicationId) == [101, 102]  # null id dropped


GIE_ALSI = {
    "data": [
        {  # AGSI-shaped flat entry
            "name": "Germany",
            "code": "DE",
            "url": "https://agsi.gie.eu/de",
            "gasDayStart": "2024-01-05",
            "status": "E",
            "gasInStorage": "1024.5",
            "injection": "12.25",
            "withdrawal": " ",
            "trend": "-0.5",
            "info": "ignored",
        },
        {  # ALSI-shaped entry with one-level nested dicts
            "name": "France",
            "gasDayStart": "2024-01-05",
            "status": "C",
            "lngInventory": {"mcm": "350.75", "energy": "", "note": "n/a"},
            "sendOut": "88.125",
        },
        {  # no gasDayStart -> skipped entirely (transformer.py:12-13)
            "name": "Ghost",
            "status": "E",
            "gasInStorage": "1.0",
        },
    ]
}


def test_flatten_gie_agsi_flat_and_alsi_nested(spark):
    """SRC6 semantics from gie/transformer.py:5-64: flat numeric keys,
    nested key_subkey fan-out, null-like -> NULL row, non-numeric ->
    dropped, excluded bookkeeping keys never become series, entries
    without gasDayStart skipped."""
    from gas_data_pipeline_spark.sources.rest import flatten_gie

    out = flatten_gie(json_batch_to_df(spark, [GIE_ALSI])).toPandas()
    rows = {
        (r.country, str(r.date), r.variable): (
            None if r.value != r.value else r.value  # NaN -> None
        )
        for r in out.itertuples()
    }
    assert rows == {
        ("Germany", "2024-01-05", "gasInStorage"): 1024.5,
        ("Germany", "2024-01-05", "injection"): 12.25,
        ("Germany", "2024-01-05", "withdrawal"): None,
        ("Germany", "2024-01-05", "trend"): -0.5,
        ("France", "2024-01-05", "lngInventory_mcm"): 350.75,
        ("France", "2024-01-05", "lngInventory_energy"): None,
        ("France", "2024-01-05", "sendOut"): 88.125,
    }
    quality = {r.country: r.quality for r in out.itertuples()}
    assert quality == {"Germany": "E", "France": "C"}


def test_read_jsonl_quarantine_splits_good_and_bad(spark, tmp_path):
    """Malformed lines land in quarantine with their raw text; parsed
    rows carry the declared schema; nothing is lost."""
    from gas_data_pipeline_spark.sources.files import read_jsonl_quarantine

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "a"}\n'
        "not json at all\n"
        '{"id": 2, "name": null}\n'
        '{"id":\n'
    )
    good, bad = read_jsonl_quarantine(spark, str(p), "id bigint, name string")
    g = good.toPandas().sort_values("id").reset_index(drop=True)
    assert list(g.id) == [1, 2]
    assert g.name[0] == "a" and g.name[1] is None
    b = sorted(bad.toPandas().raw_line)
    assert b == ["not json at all", '{"id":']


def test_jdbc_roundtrip_with_embedded_derby(spark, tmp_path):
    """SRC7 exercised end-to-end against embedded Derby (the JDBC
    driver Spark ships for its metastore): write a dim over JDBC, read
    it back whole, filtered (predicate pushed into the remote WHERE),
    and as a partitioned parallel scan."""
    from pyspark.sql import functions as F

    from gas_data_pipeline_spark.sources.jdbc import (
        read_jdbc_table,
        write_jdbc_table,
    )

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    dim = spark.createDataFrame(
        [(i, f"s{i}", float(i) * 1.5) for i in range(20)],
        "k bigint, name string, val double",
    )
    write_jdbc_table(dim.coalesce(1), url, "meta_dim", mode="overwrite")

    back = read_jdbc_table(spark, url, "meta_dim")
    assert back.count() == 20

    filtered = back.filter(F.col("k") >= 15)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert filtered.count() == 5

    par = read_jdbc_table(
        spark, url, "meta_dim",
        partition_column="k", lower_bound=0, upper_bound=20, num_partitions=4,
    )
    assert par.rdd.getNumPartitions() == 4
    assert par.count() == 20


def test_gas_quality_python_datasource_matches_driver_path(spark):
    """SRC1 scale path: the Spark 4 Python DataSource fetches chunks
    as executor tasks and must yield exactly the rows of the
    driver-side route (RestSource.fetch_chunks + flatten_gas_quality)
    over the same windows — one task per 2-day chunk."""
    from gas_data_pipeline_spark.sources.pyds import (
        GasQualityRestReader,
        fixture_transport,
        register_gas_quality_source,
    )
    from gas_data_pipeline_spark.sources.rest import (
        RestSource,
        flatten_gas_quality,
        json_batch_to_df,
    )

    register_gas_quality_source(spark)
    df = (
        spark.read.format("gas_quality_rest")
        .option("start", "2024-01-01")
        .option("end", "2024-01-06")
        .option("transport", "fixture")
        .load()
    )
    # 6 days / 2-day windows -> 3 chunk partitions, scheduled as tasks.
    reader = GasQualityRestReader(
        {"start": "2024-01-01", "end": "2024-01-06", "transport": "fixture"}
    )
    chunks = reader.partitions()
    assert [c.chunk_start for c in chunks] == [
        "2024-01-01", "2024-01-03", "2024-01-05",
    ]

    got = sorted(
        (r.site_id, r.applicable_at, r.cv, r.wi) for r in df.collect()
    )

    src = RestSource(transport=fixture_transport, sleep=lambda s: None)
    payloads = src.fetch_chunks(
        "unused://",
        [
            {
                "applicableForStart": c.chunk_start,
                "applicableForEnd": c.chunk_end,
            }
            for c in chunks
        ],
    )
    flat = flatten_gas_quality(json_batch_to_df(spark, payloads))
    want = sorted(
        (r.siteId, r.applicableAt, r.CV, r.WI) for r in flat.collect()
    )
    assert got == want
    assert len(got) == 2 * 6  # 2 sites x 6 days, no dup across chunks


def test_gas_quality_stream_datasource_tails_the_window(spark, tmp_path):
    """SRC1 as a checkpointed streaming source: each trigger advances
    the day-offset frontier by one chunk, plans that window's chunks
    as executor tasks, and the union of all micro-batches equals the
    batch backfill over the same window — same rows, either route."""
    from gas_data_pipeline_spark.sources.pyds import (
        GasQualityRestStreamReader,
        register_gas_quality_source,
    )
    from gas_data_pipeline_spark.streaming.incremental import (
        await_processed_batches,
    )

    register_gas_quality_source(spark)
    opts = {
        "start": "2024-01-01",
        "end": "2024-01-06",
        "days": "2",
        "transport": "fixture",
    }
    sdf = spark.readStream.format("gas_quality_rest").options(**opts).load()
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("gq_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        await_processed_batches(
            q,
            lambda: spark.table("gq_stream").count() >= 12,
            timeout_sec=120.0,
        )
    finally:
        q.stop()

    got = sorted(
        (r.chunk_start, r.site_id, r.applicable_at, r.cv, r.wi)
        for r in spark.table("gq_stream").collect()
    )
    want = sorted(
        (r.chunk_start, r.site_id, r.applicable_at, r.cv, r.wi)
        for r in spark.read.format("gas_quality_rest").options(**opts).load().collect()
    )
    assert got == want and len(got) == 2 * 6

    # The frontier is bounded: offered offsets never pass end+1, and
    # batch planning is a pure function of the offset range (replay of
    # the same range refetches identical chunks; empty range -> []).
    r = GasQualityRestStreamReader(opts)
    assert r.initialOffset() == {"day": "2024-01-01"}
    offered = [r.latestOffset()["day"] for _ in range(5)]
    assert offered == [
        "2024-01-03", "2024-01-05", "2024-01-07", "2024-01-07", "2024-01-07",
    ]
    a, b = {"day": "2024-01-01"}, {"day": "2024-01-03"}
    p1 = [(c.chunk_start, c.chunk_end) for c in r.partitions(a, b)]
    p2 = [(c.chunk_start, c.chunk_end) for c in r.partitions(a, b)]
    assert p1 == p2 == [("2024-01-01", "2024-01-02")]
    assert r.partitions(a, a) == []
    rows = sorted(r.read(r.partitions(a, b)[0]))
    assert rows == sorted(r.read(r.partitions(a, b)[0]))
    assert len(rows) == 2 * 2  # 2 sites x 2 days in the chunk


def test_gas_quality_stream_restart_resumes_without_duplicates(spark, tmp_path):
    """Stop a checkpointed stream mid-window and resume it: the
    restarted reader's pacing pointer starts at `start`, so without
    the engine-offset ratchet (ADVICE r7) latestOffset offered offsets
    BEHIND the committed frontier and Spark re-planned + re-emitted
    already-committed windows. The resumed run must add ONLY new days
    — zero duplicate (site, timestamp) rows across both runs."""
    from gas_data_pipeline_spark.sources.pyds import (
        GasQualityRestStreamReader,
        register_gas_quality_source,
    )
    from gas_data_pipeline_spark.streaming.incremental import (
        await_processed_batches,
    )

    register_gas_quality_source(spark)
    opts = {
        "start": "2024-02-01",
        "end": "2024-02-12",
        "days": "2",
        "transport": "fixture",
    }
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def n_out() -> int:
        try:
            return spark.read.parquet(out).count()
        except Exception:  # sink path absent until the first commit
            return 0

    def run_until(n_rows):
        sdf = spark.readStream.format("gas_quality_rest").options(**opts).load()
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            await_processed_batches(
                q, lambda: n_out() >= n_rows, timeout_sec=120.0
            )
        finally:
            q.stop()
        q.awaitTermination()

    run_until(2 * 4)  # first run: at least 2 chunks (2 sites x 4 days)
    first = n_out()
    run_until(first + 2 * 2)  # resumed run: at least one NEW chunk

    got = spark.read.parquet(out).select(
        "site_id", "applicable_at"
    ).toPandas()
    assert len(got) > first  # the stream made progress after restart
    assert len(got) == len(got.drop_duplicates())  # and re-emitted nothing

    # Unit-level: engine-supplied offsets ratchet the pointer, so a
    # reader that saw a committed range never offers behind it.
    r = GasQualityRestStreamReader(opts)
    r.commit({"day": "2024-02-07"})  # restart resync path
    assert r.latestOffset() == {"day": "2024-02-09"}
    r2 = GasQualityRestStreamReader(opts)
    r2.partitions({"day": "2024-02-05"}, {"day": "2024-02-07"})
    assert r2.latestOffset() == {"day": "2024-02-09"}


def test_gie_python_datasource_matches_driver_flatten(spark):
    """SRC6 scale path: the gie_rest DataSource plans one scan task
    PER COUNTRY and its rows, melted downstream, must equal the
    driver-side route (fetch + flatten_gie) over the same fixture
    payloads — including the no-gasDayStart skip and the nested ALSI
    fan-out."""
    from pyspark.sql import functions as F

    from gas_data_pipeline_spark.functions.melt import melt_json_keys_nested
    from gas_data_pipeline_spark.sources.pyds import (
        GieRestReader,
        gie_fixture_transport,
        register_gie_source,
    )
    from gas_data_pipeline_spark.sources.rest import (
        GIE_EXCLUDED_KEYS,
        flatten_gie,
        json_batch_to_df,
    )

    register_gie_source(spark)
    opts = {
        "countries": "germany,france",
        "start": "2024-03-01",
        "end": "2024-03-04",
        "transport": "fixture",
    }
    reader = GieRestReader(opts)
    assert [p.country for p in reader.partitions()] == ["germany", "france"]

    raw = (
        spark.read.format("gie_rest")
        .option("countries", opts["countries"])
        .option("start", opts["start"])
        .option("end", opts["end"])
        .option("transport", "fixture")
        .load()
    )
    base = raw.select(
        "country",
        F.to_date("gas_day").alias("date"),
        F.col("status").alias("quality"),
        "payload",
    ).filter(F.col("date").isNotNull())
    got = sorted(
        (r.country, str(r.date), r.variable, r.value, r.quality)
        for r in melt_json_keys_nested(
            base,
            id_cols=["country", "date", "quality"],
            excluded_keys=GIE_EXCLUDED_KEYS + ("status",),
        ).collect()
    )

    payloads = [
        gie_fixture_transport(
            "unused://", {"country": c, "from": opts["start"], "to": opts["end"]}
        )
        for c in ("germany", "france")
    ]
    want = sorted(
        (r.country, str(r.date), r.variable, r.value, r.quality)
        for r in flatten_gie(json_batch_to_df(spark, payloads)).collect()
    )
    assert got == want
    # 2 countries x 4 days x 6 kept variables (trend dropped as
    # non-numeric, info entry skipped for missing gasDayStart).
    assert len(got) == 2 * 4 * 6


def test_gie_reader_paginates_until_last_page():
    """The GIE API pages its responses: the reader must loop
    page/last_page (ADVICE r12 medium) or a multi-day window silently
    truncates to the first page. Inject a paged transport by name and
    drive the reader's generator directly — no Spark needed."""
    from gas_data_pipeline_spark.sources.pyds import (
        GIE_TRANSPORT_FACTORIES,
        GieCountryPartition,
        GieRestReader,
    )

    calls = []

    def paged_transport(url, params):
        calls.append(dict(params))
        page = params["page"]
        return {
            "data": [
                {
                    "name": params["country"],
                    "gasDayStart": f"2024-03-0{page}",
                    "status": "E",
                    "gasInStorage": float(page),
                }
            ],
            "last_page": 3,
            "page": page,
        }

    GIE_TRANSPORT_FACTORIES["_test_paged"] = lambda options: paged_transport
    try:
        reader = GieRestReader(
            {
                "countries": "germany",
                "start": "2024-03-01",
                "end": "2024-03-03",
                "transport": "_test_paged",
            }
        )
        rows = list(reader.read(GieCountryPartition("germany", "2024-03-01", "2024-03-03")))
    finally:
        del GIE_TRANSPORT_FACTORIES["_test_paged"]
    assert [r[1] for r in rows] == ["2024-03-01", "2024-03-02", "2024-03-03"]
    assert [c["page"] for c in calls] == [1, 2, 3]
    # Every page fetch carries the full window params.
    assert all(c["from"] == "2024-03-01" and c["to"] == "2024-03-03" for c in calls)


def test_gie_http_transport_is_authed_get_and_fails_fast():
    """The real transport must be a GET with query params and the
    x-key header (reference gie/client.py:39-44) — not the gas-quality
    JSON POST — and an http reader without an api_key must refuse at
    PLAN time, not in an executor task."""
    import pytest

    from gas_data_pipeline_spark.sources.pyds import (
        GieRestReader,
        gie_http_transport,
    )
    from gas_data_pipeline_spark.sources.rest import HttpStatusError

    seen = {}

    class _Resp:
        status_code = 200

        def json(self):
            return {"data": [], "last_page": 1}

    def fake_get(url, params=None, headers=None, timeout=None):
        seen.update(url=url, params=params, headers=headers, timeout=timeout)
        return _Resp()

    import requests

    orig = requests.get
    requests.get = fake_get
    try:
        out = gie_http_transport("sekrit")(
            "https://agsi.gie.eu/api", {"country": "germany", "page": 1}
        )
    finally:
        requests.get = orig
    assert out == {"data": [], "last_page": 1}
    assert seen["headers"] == {"x-key": "sekrit"}
    assert seen["params"] == {"country": "germany", "page": 1}

    # >=400 raises the status-aware error so RestSource retries 429/5xx.
    class _Err(_Resp):
        status_code = 503
        text = "unavailable"

    requests.get = lambda *a, **k: _Err()
    try:
        with pytest.raises(HttpStatusError):
            gie_http_transport("sekrit")("https://agsi.gie.eu/api", {})
    finally:
        requests.get = orig

    base = {"countries": "germany", "start": "2024-03-01", "end": "2024-03-02"}
    with pytest.raises(ValueError, match="api_key"):
        GieRestReader(dict(base, transport="http"))
    r = GieRestReader(dict(base, transport="http", api_key="sekrit"))
    assert r.options == {"api_key": "sekrit"}
    with pytest.raises(ValueError, match="dataset"):
        GieRestReader(dict(base, transport="fixture", dataset="BOGUS"))
    from gas_data_pipeline_spark.sources.pyds import GIE_ALSI_URL

    assert GieRestReader(
        dict(base, transport="fixture", dataset="alsi")
    ).url == GIE_ALSI_URL
