"""File-format ingestion with zero-loss error handling.

The reference's ingestion treats every fetched payload as
must-not-lose (its bronze append stores raw JSON before any parsing —
``app/ingestion/pipeline.py`` store-then-transform order). The file
analog: when reading line-delimited JSON, malformed lines must be
QUARANTINED — kept, counted, attributable — never silently dropped
(Spark's default PERMISSIVE mode nulls them; DROPMALFORMED discards).

``read_jsonl_quarantine`` returns (parsed, quarantined) so the caller
lands good rows in silver and bad lines in a quarantine table for
replay once the producer is fixed.

Scale shape: one pass over the files, no shuffle — parsing is
per-line, the corrupt-record column is populated by the JSON reader
itself. The quarantine split is two narrow filters over the same scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CORRUPT = "_corrupt_line"


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON with declared ``schema``; return
    (parsed_rows, quarantined_lines).

    Parsed rows carry the declared columns; quarantined rows carry the
    raw offending line so nothing is lost. The reader is PERMISSIVE
    with an explicit corrupt-record column — Spark refuses to filter on
    that column straight off the scan (internal-column restriction), so
    the split goes through the raw text: a line is quarantined iff
    ``from_json`` of the full declared struct yields no fields.
    """
    raw = spark.read.text(path).withColumnRenamed("value", _CORRUPT)
    parsed = raw.withColumn("_p", F.from_json(F.col(_CORRUPT), schema))
    # from_json yields a struct of all-null fields for malformed input;
    # a line is good iff at least one declared field materialized.
    field_names = [f.strip().split()[0] for f in schema.split(",")]
    any_field = None
    for name in field_names:
        c = F.col("_p").getField(name).isNotNull()
        any_field = c if any_field is None else (any_field | c)
    good = parsed.filter(any_field).select("_p.*")
    bad = parsed.filter(~any_field).select(F.col(_CORRUPT).alias("raw_line"))
    return good, bad
