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
        start = date.fromisoformat(self.start)
        end = date.fromisoformat(self.end)
        out: list[InputPartition] = []
        cur = start
        while cur <= end:
            stop = min(cur + timedelta(days=self.days - 1), end)
            out.append(GasQualityChunk(cur.isoformat(), stop.isoformat()))
            cur = stop + timedelta(days=1)
        return out

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


class GasQualityRestDataSource(DataSource):
    """``spark.read.format("gas_quality_rest")`` — SRC1 as a native
    scan. Spark plans this like any other source: the chunk list is
    the partitioning, so a month backfill fans out as 15 parallel
    tasks instead of the reference's 15 serial throttled fetches."""

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
