"""Small-file compaction — lakehouse table maintenance.

Streaming/incremental writers (the reference's hourly scheduler, our
``foreachBatch`` upsert) leave many small parquet files; at 100 TB the
small-file problem dominates scan cost (per-file open/footer overhead,
tiny row groups defeating column-stat pruning, task-per-file
scheduling). Compaction rewrites a table directory into files near a
target size, preserving content exactly.

Scale shape: one read + one write, no driver data. File sizing comes
from the filesystem listing (a metadata operation), not from the data;
the rewrite uses round-robin ``repartition(n)`` so output files are
uniform regardless of input skew. The rewrite lands in a fresh
directory and swaps in atomically-enough for a test harness; a real
deployment does this under a table format's transaction (Delta/Iceberg
rewrite-files action) — the partitioning/sizing logic is identical.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def dir_parquet_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of the parquet data files under ``path``
    — driver-side metadata listing, no data read."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> int:
    """Rewrite the parquet table at ``path`` into
    ``ceil(total_bytes / target_bytes)`` files of roughly equal size.
    Returns the output file count. Content is preserved exactly
    (round-robin repartition moves rows, never drops or alters them).

    The rewrite goes to a sibling temp directory first and replaces
    the original only after success, so a failed compaction leaves the
    table untouched.
    """
    _n, total = dir_parquet_stats(path)
    n_out = max(1, math.ceil(total / target_bytes))
    tmp = path.rstrip("/") + ".compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    spark.read.parquet(path).repartition(n_out).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return dir_parquet_stats(path)[0]


def write_fragmented(df: DataFrame, path: str, n_files: int) -> None:
    """Test helper: deliberately write ``df`` as ``n_files`` small
    files (the state an incremental writer leaves behind)."""
    df.repartition(n_files).write.mode("overwrite").parquet(path)
