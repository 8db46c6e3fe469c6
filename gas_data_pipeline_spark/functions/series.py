"""Series-identity and value-cleaning column helpers.

The reference derives series identity from data at ingest time
(``make_series_id`` — reference app/ingestion/series_autoregister.py:7-16:
upper-case each part, strip ``, ( )``, spaces to ``_``, join with ``_``,
prefix ``NG_``) and later *parses the id back* into components
(reference app/ingestion/transformer.py:17-19,49-56). The engine keeps
both directions as native expressions; at scale the parse direction is
usually avoidable (carry the melt keys as columns), but the surface is
provided for parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _slug_part(part: Column) -> Column:
    """upper + drop ``,()`` + collapse whitespace runs to ``_``."""
    up = F.upper(F.trim(part.cast("string")))
    cleaned = F.regexp_replace(up, r"[,()]", "")
    return F.regexp_replace(cleaned, r"\s+", "_")


def make_series_id(dataset: str | Column, *parts: Column) -> Column:
    """``NG_{DATASET}_{PART1}_{PART2}...`` slug (reference
    series_autoregister.py:7-16)."""
    ds = F.lit(dataset) if isinstance(dataset, str) else dataset
    return F.concat_ws("_", F.lit("NG"), *(_slug_part(p) for p in (ds, *parts)))


def make_series_id_static(
    dataset: str, metric_col: Column, domain: list[str]
) -> Column:
    """:func:`make_series_id` for a metric whose value DOMAIN is a
    plan-time constant (melted column names, a declared pivot list):
    the slug is precomputed per domain value in Python — same
    trim/upper/strip-``,()``/whitespace→``_`` rules, byte-identical on
    the ASCII identifiers a schema can contain — and applied as a
    map-literal lookup. The generic form runs TWO ``regexp_replace``
    per part per row; on a melt's k×N output rows that regex was 4x
    the whole query's runtime at the 8x scale probe, for a value the
    plan already knows. Keep the generic form for data-derived parts."""
    import re

    def slug(s: str) -> str:
        up = s.strip().upper()
        return re.sub(r"\s+", "_", re.sub(r"[,()]", "", up))

    pairs: list[Column] = []
    for val in domain:
        pairs.append(F.lit(val))
        pairs.append(F.lit(f"NG_{slug(dataset)}_{slug(val)}"))
    return F.element_at(F.create_map(*pairs), metric_col)


def parse_series_part(series_id: Column, index: int) -> Column:
    """Positional component of a ``_``-joined series id (1-based), the
    reverse-parse in reference transformer.py:17-19."""
    return F.element_at(F.split(series_id, "_"), index)


def clean_value(raw: Column) -> Column:
    """The reference's value gauntlet as one expression: blank-like
    strings to null (reference gie/constants.py:19 ``NULL_LIKE``), then
    permissive float cast that nulls instead of raising (reference
    transformer.py:83-86 try/except float())."""
    return F.nullif(F.trim(raw.cast("string")), F.lit("")).try_cast("double")


def date_chunks(start: Column, stop: Column, days: int = 2) -> Column:
    """Array of chunk-start timestamps covering [start, stop] in
    ``days``-sized steps — the set-based form of the reference's
    ``_daterange_chunks`` fetch loop (national_gas_client.py:61-66).
    ``explode`` the result to drive one fetch task per chunk in
    parallel instead of a serial driver-side loop."""
    return F.sequence(start, stop, F.expr(f"INTERVAL {days} DAYS"))
