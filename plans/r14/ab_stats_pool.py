"""Commit-path footer-stats A/B evidence (round 14, session 5).

Two experiments on the same freshly written store, interleaved in one
process:

1. POOL (rejected): _collect_stats' local path run serially vs through
   a driver ThreadPoolExecutor. Measured SLOWER with threads at every
   width (30 warm files: serial 274 ms median vs 255-328 ms for 2-16
   workers) — the per-file work is GIL-bound thrift parsing plus an
   arrow read that parallelizes internally, so threads only contend.
   The serial loop stays.

2. FP_THREADS (landed): the kernel's fingerprint column read with
   arrow's default use_threads=True vs use_threads=False. The
   single-threaded read wins (150 -> 81 ms median over 30 files):
   arrow's per-read thread dispatch dominates decoding one tiny
   dictionary column. It is also the correct setting for the Spark-job
   path, where each task must not spawn a nested arrow pool.

Usage: python plans/r14/ab_stats_pool.py [--reps N]
"""

from __future__ import annotations

import gc
import os
import statistics
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(os.path.dirname(_HERE))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    reps = 9
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from gas_data_pipeline_spark.catalog import table
    from gas_data_pipeline_spark.pipeline import versioned as V
    from gas_data_pipeline_spark.pipeline import _stats_kernel as K
    from gas_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ab-stats-fp")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="gas_pipeline_scratch_abstats_")
    e = table(spark, sf_dir, "events")
    page = e.select(
        F.concat(F.lit("NG_EVENTS_"), F.col("user_id").cast("string")).alias(
            "series_id"
        ),
        F.date_trunc("hour", F.col("ts")).alias("observation_time"),
        F.col("value").cast("double").alias("value"),
        F.col("ts").alias("ingestion_time"),
    )
    V.upsert_observations_versioned(spark, page, root)
    m = V.read_manifest(root, with_stats=False)
    pdirs = {d: os.path.join(root, rel) for d, rel in m["partitions"].items()}
    paths = []
    for pdir in pdirs.values():
        paths += [
            os.path.join(pdir, f)
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        ]
    print(f"store: {len(pdirs)} partitions, {len(paths)} files")

    # --- Experiment 2 (the landed change): fp read thread setting ---
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    def fp_threads(p, use_threads):
        pf = pq.ParquetFile(p)
        col = pf.read(columns=[K.KEY_FP_COL], use_threads=use_threads).column(0)
        return K.fp_from_values(
            pc.unique(pc.drop_null(col.combine_chunks())).to_pylist()
        )

    ref = [fp_threads(p, True) for p in paths]
    assert [fp_threads(p, False) for p in paths] == ref
    assert [
        K._file_stats(p)[K.FP_KEY] for p in paths
    ] == ref, "kernel fingerprint drifted from the reference read"
    print("fp value equality (threads on/off/kernel): OK")

    t: dict = {}
    for r in range(reps):
        order = [True, False] if r % 2 == 0 else [False, True]
        for ut in order:
            gc.collect()
            s = time.perf_counter()
            for p in paths:
                fp_threads(p, ut)
            t.setdefault(ut, []).append(time.perf_counter() - s)
    for ut in (True, False):
        xs = sorted(t[ut])
        print(
            f"fp use_threads={ut}: median {statistics.median(xs)*1000:.1f} ms"
            f" (min {xs[0]*1000:.1f})"
        )

    # --- Experiment 1 (rejected): serial vs thread-pool local path ---
    from concurrent.futures import ThreadPoolExecutor

    def stats_serial():
        return [K._file_stats(p) for p in paths]

    def stats_pool(nw):
        with ThreadPoolExecutor(max_workers=nw) as ex:
            return list(ex.map(K._file_stats, paths))

    assert stats_pool(8) == stats_serial()
    tp: dict = {}
    for r in range(reps):
        for label, fn in (
            ("serial", stats_serial),
            ("pool4", lambda: stats_pool(4)),
            ("pool16", lambda: stats_pool(16)),
        ):
            gc.collect()
            s = time.perf_counter()
            fn()
            tp.setdefault(label, []).append(time.perf_counter() - s)
    for label in ("serial", "pool4", "pool16"):
        xs = sorted(tp[label])
        print(
            f"local path {label}: median {statistics.median(xs)*1000:.1f} ms"
            f" (min {xs[0]*1000:.1f})"
        )

    import shutil

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
