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


TRANSPORT_FACTORIES = {
    "fixture": lambda: fixture_transport,
    "http": lambda: requests_transport(),
}


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
