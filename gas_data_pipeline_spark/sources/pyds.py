"""SRC1's scale path as a true Spark 4 Python DataSource
(``pyspark.sql.datasource``): executor-parallel chunked REST ingestion.

The reference fetches gas-quality JSON in a serial driver-side loop of
2-day windows (national_gas_client.py:61-66,89-116). ``RestSource``
already mirrors the retry/throttle policy for driver-side fetches;
this module moves the WHOLE fetch onto the cluster: each 2-day chunk
becomes an ``InputPartition``, Spark schedules chunks as scan tasks,
and each task fetches + flattens its own window — at 100 TB of history
the ingest is as parallel as the cluster, with no driver bottleneck
and no intermediate landing files.

Usage::

    spark.dataSource.register(GasQualityRestDataSource)
    df = (spark.read.format("gas_quality_rest")
          .option("start", "2024-01-01").option("end", "2024-01-31")
          .option("transport", "fixture")   # or "http" outside tests
          .load())

Transports resolve by NAME from :data:`TRANSPORT_FACTORIES` because
reader state must pickle to executors — a closure over a live session
would not. The "fixture" transport is a pure function of the request
params (deterministic on any executor); "http" builds the real
requests-backed transport lazily inside the task.

Equivalence with the driver-side path (``RestSource.fetch_chunks`` +
``flatten_gas_quality``) is pinned in tests/test_sources.py — same
rows, either route.
"""

from __future__ import annotations

from datetime import date, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from gas_data_pipeline_spark.sources.rest import (
    HttpStatusError,
    RestSource,
    requests_transport,
)

GAS_QUALITY_URL = "https://data.nationalgas.com/api/find-gas-quality-data"


def fixture_transport(url: str, params: dict) -> dict:
    """Deterministic synthetic payload — a pure function of the request
    params, so every executor (and the DuckDB-side test oracle)
    reproduces it exactly. Two sites, one detail row per day in the
    requested window."""
    start = date.fromisoformat(params["applicableForStart"])
    end = date.fromisoformat(params["applicableForEnd"])
    days = [
        start + timedelta(days=i) for i in range((end - start).days + 1)
    ]
    sites = []
    for sid, sname, aname in ((1, "St Fergus", "North"), (2, "Bacton", "East")):
        sites.append(
            {
                "siteId": sid,
                "siteName": sname,
                "areaName": aname,
                "siteGasQualityDetail": [
                    {
                        "applicableAt": f"{d.isoformat()}T00:00:00Z",
                        "CV": round(38.0 + sid + 0.1 * (d.toordinal() % 7), 4),
                        "WI": round(50.0 + sid + 0.05 * (d.toordinal() % 11), 4),
                    }
                    for d in days
                ],
            }
        )
    return {"sites": sites}


GIE_AGSI_URL = "https://agsi.gie.eu/api"
GIE_ALSI_URL = "https://alsi.gie.eu/api"


def gie_http_transport(api_key: str, timeout_s: float = 60.0):
    """Real GIE AGSI/ALSI transport, mirroring the reference client
    (app/ingestion/gie/client.py:27-44): GET with QUERY params and the
    ``x-key`` auth header — not the gas-quality JSON POST (the 'http'
    entry used to reuse ``requests_transport()``, which POSTed an
    unauthenticated JSON body the GIE API rejects; ADVICE r12 medium).
    Raises :class:`HttpStatusError` on >=400 so :class:`RestSource`
    applies the status-aware retry policy to each page fetch. The
    ``requests`` import is deferred and optional, same posture as the
    gas-quality transport."""

    def transport(url: str, params: dict) -> dict:
        try:
            import requests  # deferred: optional dependency
        except ImportError as e:  # pragma: no cover - env-dependent
            raise RuntimeError(
                "the GIE http transport needs the 'requests' package; "
                "use the 'fixture' transport or inject a custom one"
            ) from e

        resp = requests.get(
            url,
            params=params,
            headers={"x-key": api_key},
            timeout=timeout_s,
        )
        if resp.status_code >= 400:
            raise HttpStatusError(resp.status_code, url, resp.text[:200])
        return resp.json()

    return transport


def gie_fixture_transport(url: str, params: dict) -> dict:
    """Deterministic synthetic GIE AGSI/ALSI payload — a pure function
    of (country, from, to), replayable in SQL (the value formulas key
    on ``length(country)`` and the day ordinal). Each gas day yields
    one entry carrying scalar storage metrics, a null-like field, a
    non-numeric field (dropped by the melt), and an ALSI-style nested
    dict (fans out as ``lng_*``); one trailing entry has NO
    gasDayStart — the reference skips those (gie/transformer.py:12-13)
    and so must every consumer."""
    c = params["country"]
    cl = len(c)
    start = date.fromisoformat(params["from"])
    end = date.fromisoformat(params["to"])
    entries = []
    for i in range((end - start).days + 1):
        d = start + timedelta(days=i)
        o = d.toordinal()
        entries.append(
            {
                "name": c,
                "code": c[:2].upper(),
                "url": f"{url}?country={c}",
                "gasDayStart": d.isoformat(),
                "gasDayEnd": (d + timedelta(days=1)).isoformat(),
                "updatedAt": f"{d.isoformat()}T06:00:00Z",
                "status": "N" if o % 5 == 0 else "E",
                "gasInStorage": round(500.0 + 10 * cl + 0.25 * (o % 13), 4),
                "injection": round(5.0 + cl + 0.1 * (o % 7), 4),
                "withdrawal": round(3.0 + cl + 0.05 * (o % 11), 4),
                "full": "",
                "trend": "flat",
                "lng": {
                    "inventory": round(40.0 + cl + 0.2 * (o % 9), 4),
                    "sendOut": round(7.0 + cl + 0.02 * (o % 5), 4),
                },
            }
        )
    entries.append({"name": c, "info": "no gas day - skipped"})
    return {"data": entries}


TRANSPORT_FACTORIES = {
    "fixture": lambda: fixture_transport,
    "http": lambda: requests_transport(),
}

# GIE factories take the READER OPTIONS: the real transport needs the
# api_key option (the x-key header), and reader state must stay
# pickle-plain — a dict of strings ships to executors, a constructed
# session would not.
GIE_TRANSPORT_FACTORIES = {
    "fixture": lambda options: gie_fixture_transport,
    "http": lambda options: gie_http_transport(options["api_key"]),
}


def register_gie_source(spark) -> None:
    """Register the GIE DataSource by value — same deployment posture
    as :func:`register_gas_quality_source` (self-contained pickle, no
    repo import needed on workers)."""
    from pyspark import cloudpickle

    import gas_data_pipeline_spark.sources.pyds as _pyds
    import gas_data_pipeline_spark.sources.rest as _rest

    for mod in (_rest, _pyds):
        cloudpickle.register_pickle_by_value(mod)
    spark.dataSource.register(GieRestDataSource)


def register_gas_quality_source(spark) -> None:
    """Register the DataSource with the session, pickling this module
    and its ``rest`` dependency BY VALUE: Spark ships the reader class
    to Python workers via cloudpickle, which by default serializes a
    class as a module-name reference — that breaks the moment a worker
    process cannot import the repo package (different cwd, no
    PYTHONPATH). By-value registration makes the source self-contained
    in the pickle, so it runs on any executor with only pyspark
    installed — the deployment posture of a real cluster."""
    from pyspark import cloudpickle

    import gas_data_pipeline_spark.sources.pyds as _pyds
    import gas_data_pipeline_spark.sources.rest as _rest

    for mod in (_rest, _pyds):
        cloudpickle.register_pickle_by_value(mod)
    spark.dataSource.register(GasQualityRestDataSource)


class GasQualityChunk(InputPartition):
    """One 2-day fetch window == one Spark scan task."""

    def __init__(self, chunk_start: str, chunk_end: str):
        self.chunk_start = chunk_start
        self.chunk_end = chunk_end


class GasQualityRestReader(DataSourceReader):
    def __init__(self, options: dict):
        self.start = options["start"]
        self.end = options["end"]
        self.days = int(options.get("days", "2"))
        self.transport_name = options.get("transport", "http")
        if self.transport_name not in TRANSPORT_FACTORIES:
            raise ValueError(
                f"unknown transport {self.transport_name!r}; "
                f"one of {sorted(TRANSPORT_FACTORIES)}"
            )

    def partitions(self) -> list[InputPartition]:
        """The reference's ``_daterange_chunks`` loop as a partition
        list: [start, end] covered in ``days``-sized windows, last
        window clamped (same semantics as functions.date_chunks)."""
        return _chunk_list(
            date.fromisoformat(self.start),
            date.fromisoformat(self.end) + timedelta(days=1),
            self.days,
        )

    def read(self, partition: GasQualityChunk):
        """Runs ON AN EXECUTOR: fetch this chunk with the reference's
        retry policy, flatten sites x details, yield rows. The
        throttle that paced the reference's serial loop is obsolete
        here — chunks are separate tasks, so pacing is cluster
        scheduling, not sleeps."""
        transport = TRANSPORT_FACTORIES[self.transport_name]()
        src = RestSource(transport=transport)
        payload = src.fetch(
            GAS_QUALITY_URL,
            {
                "applicableForStart": partition.chunk_start,
                "applicableForEnd": partition.chunk_end,
            },
        )
        for site in payload.get("sites", []):
            for d in site.get("siteGasQualityDetail", []):
                yield (
                    partition.chunk_start,
                    site.get("siteId"),
                    site.get("siteName"),
                    site.get("areaName"),
                    d.get("applicableAt"),
                    d.get("CV"),
                    d.get("WI"),
                )


def _chunk_list(start: date, end_exclusive: date, days: int) -> list[InputPartition]:
    """[start, end_exclusive) covered in ``days``-sized windows — the
    shared chunking of the batch reader and the stream's per-batch
    partition planning (last window clamped, empty range -> [])."""
    out: list[InputPartition] = []
    cur = start
    while cur < end_exclusive:
        stop = min(cur + timedelta(days=days - 1), end_exclusive - timedelta(days=1))
        out.append(GasQualityChunk(cur.isoformat(), stop.isoformat()))
        cur = stop + timedelta(days=1)
    return out


class GieCountryPartition(InputPartition):
    """One country's window fetch == one Spark scan task (SRC6's unit
    of parallelism: the GIE API pages per country, so a 30-country
    backfill fans out as 30 tasks instead of a serial driver loop)."""

    def __init__(self, country: str, start: str, end: str):
        self.country = country
        self.start = start
        self.end = end


class GieRestReader(DataSourceReader):
    """SRC6 (GIE AGSI/ALSI) as an executor-parallel scan. Emits one
    row per API entry with the ENTRY's raw JSON as a column — the
    key-driven melt (R2, functions/melt.py) stays a downstream
    DataFrame transform, exactly like the driver-side
    ``flatten_gie`` route, so new upstream metrics flow through
    without a source release."""

    def __init__(self, options: dict):
        self.countries = [
            c.strip() for c in options["countries"].split(",") if c.strip()
        ]
        self.start = options["start"]
        self.end = options["end"]
        self.transport_name = options.get("transport", "http")
        if self.transport_name not in GIE_TRANSPORT_FACTORIES:
            raise ValueError(
                f"unknown transport {self.transport_name!r}; "
                f"one of {sorted(GIE_TRANSPORT_FACTORIES)}"
            )
        dataset = options.get("dataset", "AGSI").upper()
        if dataset not in ("AGSI", "ALSI"):
            raise ValueError(
                f"unknown GIE dataset {dataset!r}; one of ['AGSI', 'ALSI'] "
                "(reference gie/client.py:28-34)"
            )
        self.url = GIE_AGSI_URL if dataset == "AGSI" else GIE_ALSI_URL
        # Fail fast at PLAN time, not in an executor task: the real API
        # rejects unauthenticated requests, so an http read without a
        # key can never succeed (ADVICE r12 medium).
        if self.transport_name == "http" and not options.get("api_key"):
            raise ValueError(
                "the GIE 'http' transport requires the 'api_key' option "
                "(sent as the x-key header, reference gie/client.py:39-44)"
            )
        # Keep only the plain-string options the transport factory may
        # need — the reader pickles to executors.
        self.options = {
            k: options[k] for k in ("api_key",) if k in options
        }

    def partitions(self) -> list[InputPartition]:
        return [
            GieCountryPartition(c, self.start, self.end)
            for c in self.countries
        ]

    def read(self, partition: GieCountryPartition):
        """Runs ON AN EXECUTOR: fetch this country's window with the
        reference retry policy, emit (country, gas_day, status,
        payload-json) per entry. Entries without ``gasDayStart`` pass
        through with a NULL gas_day so the DOWNSTREAM filter decides —
        the source does not silently drop data.

        The GIE API PAGINATES (``last_page`` in every response): a
        multi-day window spans pages, and reading only the first would
        silently truncate the window even though the request succeeded
        (ADVICE r12 medium). Each page fetch goes through the retry
        policy independently; transports without a ``last_page`` key
        (the fixture returns the whole window at once) terminate after
        page 1."""
        import json

        transport = GIE_TRANSPORT_FACTORIES[self.transport_name](self.options)
        src = RestSource(transport=transport)
        page = 1
        while True:
            payload = src.fetch(
                self.url,
                {
                    "country": partition.country,
                    "from": partition.start,
                    "to": partition.end,
                    "page": page,
                },
            )
            for entry in payload.get("data", []):
                yield (
                    entry.get("name"),
                    entry.get("gasDayStart"),
                    entry.get("status"),
                    json.dumps(entry),
                )
            try:
                last_page = int(payload.get("last_page") or 1)
            except (TypeError, ValueError):
                last_page = 1
            if page >= last_page:
                break
            page += 1


class GieRestDataSource(DataSource):
    """``spark.read.format("gie_rest")`` — SRC6 as a native scan with
    per-country partitions. Options: ``countries`` (comma list),
    ``start``/``end`` (gas-day window), ``dataset`` (AGSI | ALSI,
    picking the endpoint like reference gie/client.py:28-34),
    ``transport`` (fixture | http), and ``api_key`` (required for
    http — the x-key header)."""

    @classmethod
    def name(cls) -> str:
        return "gie_rest"

    def schema(self) -> str:
        return "country string, gas_day string, status string, payload string"

    def reader(self, schema) -> DataSourceReader:
        return GieRestReader(dict(self.options))


class GasQualityRestStreamReader(DataSourceStreamReader):
    """SRC1's poll loop as a REAL streaming source: the reference
    re-runs its ingestion hourly from a scheduler
    (app/scheduler/scheduler.py:13-17) and tracks how far it has
    ingested implicitly via lookback re-fetch; here the "how far"
    is an explicit checkpointed OFFSET (``{"day": iso-date}``), each
    trigger advances the frontier by ``days`` and plans the new
    window's chunks as executor tasks, and exactly-once comes from
    the offset log instead of idempotent re-ingest.

    ``partitions(start, end)`` + ``read`` are pure functions of the
    offset range — a replayed micro-batch (crash between sink write
    and offset commit) refetches the identical window, which is the
    whole recovery contract. The driver-side frontier pointer only
    PACES what latestOffset offers; committed progress lives in
    Spark's offset log, and the pointer RATCHETS FORWARD from every
    engine-supplied offset (``partitions(start, end)``,
    ``commit(end)``). A restarted reader begins with the pointer at
    ``start``, but the engine replays/commits the checkpointed batch
    range before asking for new offsets, which syncs the pointer —
    without the ratchet, latestOffset after a restart offered offsets
    BEHIND the committed frontier and Spark (which compares offsets by
    JSON equality only) re-planned and re-emitted already-committed
    windows (duplicate rows — pinned by the stop/resume test in
    tests/test_sources.py)."""

    def __init__(self, options: dict):
        self.start = date.fromisoformat(options["start"])
        # bounded fixture windows end at `end` (inclusive); an open
        # live tail would instead derive end_exclusive from the clock.
        self.end_exclusive = date.fromisoformat(options["end"]) + timedelta(days=1)
        self.days = int(options.get("days", "2"))
        self.transport_name = options.get("transport", "http")
        if self.transport_name not in TRANSPORT_FACTORIES:
            raise ValueError(
                f"unknown transport {self.transport_name!r}; "
                f"one of {sorted(TRANSPORT_FACTORIES)}"
            )
        self._frontier = self.start

    def _ratchet(self, *offsets: dict) -> None:
        """Sync the pacing pointer forward to the engine's view — it
        must never fall behind an offset the engine has planned or
        committed, or latestOffset would offer backward offsets."""
        for off in offsets:
            day = date.fromisoformat(off["day"])
            if day > self._frontier:
                self._frontier = day

    def initialOffset(self) -> dict:
        return {"day": self.start.isoformat()}

    def latestOffset(self) -> dict:
        nxt = min(self._frontier + timedelta(days=self.days), self.end_exclusive)
        self._frontier = nxt
        return {"day": nxt.isoformat()}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        self._ratchet(start, end)
        return _chunk_list(
            date.fromisoformat(start["day"]),
            date.fromisoformat(end["day"]),
            self.days,
        )

    def read(self, partition: GasQualityChunk):
        """Runs ON AN EXECUTOR — same fetch+flatten as the batch
        reader, so stream and backfill produce identical rows for
        identical windows (pinned in tests/test_sources.py)."""
        transport = TRANSPORT_FACTORIES[self.transport_name]()
        src = RestSource(transport=transport)
        payload = src.fetch(
            GAS_QUALITY_URL,
            {
                "applicableForStart": partition.chunk_start,
                "applicableForEnd": partition.chunk_end,
            },
        )
        for site in payload.get("sites", []):
            for d in site.get("siteGasQualityDetail", []):
                yield (
                    partition.chunk_start,
                    site.get("siteId"),
                    site.get("siteName"),
                    site.get("areaName"),
                    d.get("applicableAt"),
                    d.get("CV"),
                    d.get("WI"),
                )

    def commit(self, end: dict) -> None:
        """Offsets <= ``end`` are durably processed: ratchet the
        pacing pointer (the restart-resync path — Spark re-commits the
        checkpointed batch to the source before planning new ones);
        the REST source holds no server-side state to release."""
        self._ratchet(end)


class GasQualityRestDataSource(DataSource):
    """``spark.read.format("gas_quality_rest")`` — SRC1 as a native
    scan. Spark plans this like any other source: the chunk list is
    the partitioning, so a month backfill fans out as 15 parallel
    tasks instead of the reference's 15 serial throttled fetches.
    ``spark.readStream`` on the same format tails the feed
    incrementally with checkpointed day offsets
    (:class:`GasQualityRestStreamReader`)."""

    @classmethod
    def name(cls) -> str:
        return "gas_quality_rest"

    def schema(self) -> str:
        return (
            "chunk_start string, site_id bigint, site_name string, "
            "area_name string, applicable_at string, cv double, wi double"
        )

    def reader(self, schema) -> DataSourceReader:
        return GasQualityRestReader(dict(self.options))

    def streamReader(self, schema) -> DataSourceStreamReader:
        return GasQualityRestStreamReader(dict(self.options))
