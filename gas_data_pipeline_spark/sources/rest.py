"""REST ingestion sources (SRC1-SRC6) — Spark-first flattening.

The reference fetches JSON from National Gas / ENTSOG / GIE endpoints
and flattens with pandas loops (app/ingestion/national_gas_client.py).
Here the *fetch* stays a thin driver-side callable (injectable
transport; retry/backoff mirrors national_gas_client.py:23-34), and the
*flatten* is a Spark plan over ``spark.createDataFrame`` /
``spark.read.json`` output:

- SRC1 gas quality: ``explode(sites) -> explode(siteGasQualityDetail)``
  (reference :106-116 nested loops)
- SRC2 ENTSOG: envelope unwrap ``explode(operationaldatas)``
  (reference :176-183 + pd.json_normalize)
- SRC3 instantaneous flow: 3-level explode chain (reference :207-218)
- SRC4 publications: ``explode(publications)`` with parent pub carry
  (reference :249-259)
- SRC5 catalogue: 3-level explode + null-id filter (reference
  app/api/v2/ingestion.py:113-128)

At 100 TB the chunk loop (2-day windows, reference :61-66) becomes a
chunk DataFrame (functions.date_chunks) whose rows drive parallel
fetch tasks; fetched pages land as JSON files and ``spark.read.json``
takes over — the flatteners below are identical in both modes.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Transport = Callable[[str, dict], dict]

# The reference's urllib3 Retry status_forcelist
# (national_gas_client.py:24-28): retry THESE, fail fast on any other
# HTTP error (a 404 or 401 never heals by retrying).
RETRYABLE_STATUSES = frozenset({429, 500, 502, 503, 504})
RATE_LIMIT_PENALTY_S = 15.0  # national_gas_client.py:98-101


class HttpStatusError(Exception):
    """An HTTP error response, carrying the status so the retry policy
    can distinguish retryable (429/5xx) from permanent (other 4xx)."""

    def __init__(self, status: int, url: str, detail: str = ""):
        self.status = status
        super().__init__(f"HTTP {status} from {url}{': ' + detail if detail else ''}")


def requests_transport(timeout_s: float = 60.0, method: str = "post") -> Transport:
    """Default real-HTTP transport mirroring the reference client
    (national_gas_client.py:89-95: JSON POST, 60 s timeout). Raises
    :class:`HttpStatusError` on >=400 so :class:`RestSource` applies the
    status-aware retry policy. The ``requests`` import is deferred and
    optional — tests and air-gapped runs inject fake transports and
    never touch it."""

    def transport(url: str, params: dict) -> dict:
        try:
            import requests  # deferred: optional dependency
        except ImportError as e:  # pragma: no cover - env-dependent
            raise RuntimeError(
                "the default transport needs the 'requests' package; "
                "inject a custom Transport callable instead"
            ) from e

        resp = getattr(requests, method)(
            url,
            json=params,
            headers={"Content-Type": "application/json; charset=utf-8"},
            timeout=timeout_s,
        )
        if resp.status_code >= 400:
            raise HttpStatusError(resp.status_code, url, resp.text[:200])
        return resp.json()

    return transport


class RestSource:
    """Driver-side fetch with the reference's retry/backoff/throttle
    policy (national_gas_client.py:23-34,95-101,118): 5 tries with
    factor-2 backoff on 429/5xx ONLY (other 4xx raise immediately), a
    15 s penalty sleep on 429, 1.5 s inter-chunk throttle. Transport is
    injectable (network stays out of the correctness path); the default
    is :func:`requests_transport`."""

    def __init__(
        self,
        transport: Transport | None = None,
        retries: int = 5,
        backoff_factor: float = 2.0,
        throttle_s: float = 1.5,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.transport = transport if transport is not None else requests_transport()
        self.retries = retries
        self.backoff_factor = backoff_factor
        self.throttle_s = throttle_s
        self.sleep = sleep

    def fetch(self, url: str, params: dict) -> dict:
        last_err: Exception | None = None
        for attempt in range(self.retries):
            try:
                return self.transport(url, params)
            except HttpStatusError as e:
                if e.status not in RETRYABLE_STATUSES:
                    raise  # permanent client error: never retry
                last_err = e
                if e.status == 429:
                    # Rate limited: the reference hard-stops 15 s before
                    # touching the endpoint again.
                    self.sleep(RATE_LIMIT_PENALTY_S)
                self.sleep(self.backoff_factor**attempt)
            except Exception as e:  # connection-level: retryable
                last_err = e
                self.sleep(self.backoff_factor**attempt)
        raise RuntimeError(f"fetch failed after {self.retries} tries: {last_err}")

    def fetch_chunks(self, url: str, chunk_params: list[dict]) -> list[dict]:
        """Serial chunked fetch with throttle — the reference's loop.
        (At scale, prefer landing files + spark.read.json.)"""
        out = []
        for i, params in enumerate(chunk_params):
            if i:
                self.sleep(self.throttle_s)
            out.append(self.fetch(url, params))
        return out


def json_batch_to_df(spark: SparkSession, payloads: list[dict[str, Any]]) -> DataFrame:
    """Turn fetched JSON documents into a DataFrame with inferred
    schema — the boundary where driver-side data becomes distributed."""
    return spark.read.json(spark.sparkContext.parallelize([__import__("json").dumps(p) for p in payloads]))


def flatten_gas_quality(raw: DataFrame) -> DataFrame:
    """SRC1: sites[] × siteGasQualityDetail[] one-level flatten with
    parent attrs carried (reference national_gas_client.py:106-116)."""
    site = raw.select(F.explode("sites").alias("site"))
    detail = site.select(
        F.col("site.siteId").alias("siteId"),
        F.col("site.siteName").alias("siteName"),
        F.col("site.areaName").alias("areaName"),
        F.explode("site.siteGasQualityDetail").alias("d"),
    )
    return detail.select("siteId", "siteName", "areaName", "d.*")


def flatten_entsog(raw: DataFrame) -> DataFrame:
    """SRC2: unwrap the ``operationaldatas`` envelope; normalize
    ``Physical Flow`` -> ``PhysicalFlow`` (reference :163-165,176-183).
    """
    rows = raw.select(F.explode("operationaldatas").alias("r")).select("r.*")
    if "indicator" in rows.columns:
        rows = rows.withColumn(
            "indicator", F.regexp_replace("indicator", r"Physical Flow", "PhysicalFlow")
        )
    return rows


def flatten_instantaneous_flow(raw: DataFrame) -> DataFrame:
    """SRC3: 3-level unnest instantaneousFlow[] -> sites[] ->
    siteGasDetail[] projecting the 5 reference fields (:207-218)."""
    lvl1 = raw.select(F.explode("instantaneousFlow").alias("f"))
    lvl2 = lvl1.select(
        F.col("f.applicableAt").alias("applicableAt"),
        F.explode("f.sites").alias("s"),
    )
    lvl3 = lvl2.select(
        "applicableAt",
        F.col("s.siteName").alias("siteName"),
        F.explode("s.siteGasDetail").alias("d"),
    )
    return lvl3.select(
        "applicableAt",
        "siteName",
        F.col("d.flowRate").alias("flowRate"),
        F.col("d.scheduledFlowRate").alias("scheduledFlowRate"),
        F.col("d.quality").alias("quality"),
    )


def flatten_publications(raw: DataFrame) -> DataFrame:
    """SRC4: pub[] -> publications[] with publication id/name carried
    down (reference :249-259)."""
    pub = raw.select(F.explode("data").alias("p"))
    return pub.select(
        F.col("p.publicationId").alias("publicationId"),
        F.col("p.publicationName").alias("publicationName"),
        F.explode("p.publications").alias("row"),
    ).select("publicationId", "publicationName", "row.*")


# SRC6 — GIE AGSI/ALSI (reference app/ingestion/gie/constants.py:9-20).
GIE_EXCLUDED_KEYS = (
    "name",
    "code",
    "url",
    "updatedAt",
    "gasDayStart",
    "gasDayEnd",
    "info",
)


def flatten_gie(raw: DataFrame) -> DataFrame:
    """SRC6: GIE AGSI/ALSI key-driven melt (reference
    gie/transformer.py:5-64) — entries without ``gasDayStart`` are
    skipped (:12-13); every non-excluded key becomes a (country, date,
    variable, value, quality) row; ALSI's one-level nested dicts fan
    out as ``key_subkey`` (:25-43); null-like values ('', ' ') yield
    NULL rows, non-numeric values are dropped. The key set is
    data-driven via ``to_json`` -> map melt, so AGSI and ALSI payloads
    flow through the same plan and new upstream metrics auto-register.
    """
    from gas_data_pipeline_spark.functions.melt import melt_json_keys_nested

    entry = raw.select(F.explode("data").alias("e"))
    base = entry.select(
        F.col("e.name").alias("country"),
        F.to_date(F.col("e.gasDayStart")).alias("date"),
        F.col("e.status").alias("quality"),
        F.to_json("e").alias("payload"),
    ).filter(F.col("date").isNotNull())
    melted = melt_json_keys_nested(
        base,
        id_cols=["country", "date", "quality"],
        excluded_keys=GIE_EXCLUDED_KEYS + ("status",),
    )
    return melted.select("country", "date", "variable", "value", "quality")


def flatten_publication_catalogue(raw: DataFrame) -> DataFrame:
    """SRC5: data[] -> subCategory[] -> catalogueEntries[] to
    (publicationId, name), dropping null ids (reference
    app/api/v2/ingestion.py:113-128)."""
    cat = raw.select(F.explode("data").alias("c"))
    sub = cat.select(F.explode("c.subCategory").alias("s"))
    entries = sub.select(F.explode("s.catalogueEntries").alias("e"))
    return entries.select(
        F.col("e.publicationId").alias("publicationId"),
        F.col("e.publicationName").alias("publicationName"),
    ).filter(F.col("publicationId").isNotNull())
