"""Interval-overlap join: large×large temporal theta-joins as equi-joins.

The reference's store serves point-in-time and range lookups
(reference app/services/data_service.py:61-74 filters a time band);
the natural extension for incident/impact analysis is "which intervals
on side A overlap which intervals on side B". Spark's only native plan
for an overlap predicate with NO equality key is
BroadcastNestedLoopJoin (fine when one side is tiny, fatal when both
sides are large — at 100 TB neither side broadcasts and the cross
product is quadratic).

This module makes the theta-join an EQUI-join by time bucketing:

- pick a bucket width ``bucket_seconds`` (ideally ~ the typical
  interval length, so each interval covers O(1) buckets);
- explode every interval into the bucket ids it covers
  (``sequence(floor(start/w), floor(end/w))`` — JVM-side, no UDF);
- equi-join on bucket id (+ any equality keys), then re-check the
  exact overlap predicate.

A pair of overlapping intervals shares every bucket in the overlap
region, so a naive bucket join emits duplicates. Rather than a
``distinct`` (an extra shuffle over the pair output), each pair is
emitted exactly once by keeping only the join row whose bucket equals
``max(bucket(l_start), bucket(r_start))``: both intervals contain the
instant ``max(l_start, r_start)`` (that is what overlapping means), so
both cover that instant's bucket, and it is unique per pair. This is
the standard dedup trick from distributed spatial joins (report a pair
only in the first shared grid cell).

Scale shape: shuffle is hash(bucket) — volume is ``rows x
avg_buckets_per_interval``, linear in data for bounded interval
length; per-bucket density bounds the join fan-out, and skewed buckets
(a hot hour) split fine under AQE skew-join because the join is a
plain equi-join. No driver-side state, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucketed(
    df: DataFrame, start: str, end: str, bucket_seconds: int, side: str
) -> DataFrame:
    """Explode one side into its covered bucket ids. Adds
    ``__{side}_bucket`` (one row per covered bucket) and
    ``__{side}_sb`` (the interval's start bucket) — side-distinct
    names so the downstream join never hits self-join lineage
    ambiguity when both sides derive from the same source."""
    w = F.lit(int(bucket_seconds) * 1_000_000)
    sb = F.floor(F.unix_micros(F.col(start)) / w)
    eb = F.floor(F.unix_micros(F.col(end)) / w)
    return (
        df.withColumn(f"__{side}_sb", sb)
        .withColumn(f"__{side}_bucket", F.explode(F.sequence(sb, eb)))
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_span: tuple[str, str],
    right_span: tuple[str, str],
    bucket_seconds: int = 1800,
    keys: list[str] | None = None,
) -> DataFrame:
    """All (left, right) pairs whose closed intervals overlap:
    ``l_start <= r_end AND r_start <= l_end`` (plus equality on
    ``keys`` when given), each pair exactly once, no cross join and no
    distinct. Column names must be disjoint across the two sides
    (``keys`` name left-side columns; pass the right side's matching
    columns pre-renamed into them via ``withColumnRenamed`` upstream,
    or keep them disjoint and let the caller add equality conditions).

    ``bucket_seconds`` trades shuffle volume (rows explode into
    ``length/bucket + 1`` buckets) against join fan-out (bucket width
    ~ co-bucketed row density); set it near the typical interval
    length.
    """
    l_start, l_end = left_span
    r_start, r_end = right_span
    lb = _bucketed(left, l_start, l_end, bucket_seconds, "l")
    rb = _bucketed(right, r_start, r_end, bucket_seconds, "r")
    if keys:
        # equality keys live on both sides under the same name: rename
        # the right side so the equi-join condition is unambiguous
        for k in keys:
            rb = rb.withColumnRenamed(k, f"__r_key_{k}")
    cond = F.col("__l_bucket") == F.col("__r_bucket")
    for k in keys or []:
        cond = cond & (F.col(k) == F.col(f"__r_key_{k}"))
    pairs = (
        lb.join(rb, cond)
        # exact overlap re-check (buckets over-approximate)
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
        )
        # emit each pair once: in the bucket of max(l_start, r_start),
        # which both intervals are guaranteed to cover
        .filter(
            F.col("__l_bucket") == F.greatest(F.col("__l_sb"), F.col("__r_sb"))
        )
    )
    drop = ["__l_bucket", "__r_bucket", "__l_sb", "__r_sb"] + [
        f"__r_key_{k}" for k in (keys or [])
    ]
    return pairs.drop(*drop)
