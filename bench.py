"""Benchmark harness (driver contract).

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the ``noop`` sink (full pipeline runs, nothing
is collected to the driver) so timings measure the distributed plan,
not result transfer. One warm-up query runs first so JVM/codegen
startup isn't billed to the first measured query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(sf_dir.rstrip("/")))
    return float(m.group(1)) if m else float("nan")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from gas_data_pipeline_spark.registry import all_queries
    from gas_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="gas-pipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # Warm-up: touch every table + JIT/codegen paths once.
    for t in ("lineitem", "orders", "customer", "documents", "embeddings"):
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).count()
    # Start the Python UDF worker pool so the first Arrow-UDF query
    # isn't billed its cold-start.
    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def _warm(x):
        return x

    spark.range(1000).select(_warm(F.col("id").cast("double"))).count()
    # Grouped-map (applyInPandas) workers warm separately.
    (
        spark.range(1000)
        .withColumn("g", F.col("id") % 4)
        .groupBy("g")
        .applyInPandas(lambda pdf: pdf[["id"]], schema="id bigint")
        .count()
    )

    def run_pass() -> dict[str, float]:
        out: dict[str, float] = {}
        for name in sorted(queries):
            fn = queries[name]
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - start, 4)
        return out

    # Host-level noise on shared machines swings identical suite runs
    # 2x (observed 97s vs 212s back-to-back), which made single-digit
    # round-over-round deltas pure noise (VERDICT r2 #4). Run >= 3
    # passes and report the per-query MEDIAN — the steady-state cost
    # of the plan — degrading to fewer passes only if the suite is so
    # slow that extra passes would risk the harness window.
    passes = [run_pass()]
    while len(passes) < 3 and sum(passes[0].values()) < 200:
        passes.append(run_pass())

    def median(xs: list[float]) -> float:
        xs = sorted(xs)
        mid = len(xs) // 2
        return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2

    timings = {k: round(median([p[k] for p in passes]), 4) for k in passes[0]}
    n_passes = len(passes)

    total = round(sum(timings.values()), 4)
    sf = _sf_of(sf_dir)
    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "passes": n_passes,
            }
        )
    )
    # The per-query line above can exceed the driver's tail capture
    # (BENCH_r01.json recorded "parsed": null). Repeat the headline as a
    # compact LAST line so tail-truncation always leaves a parseable
    # summary.
    print(
        json.dumps({"metric": "suite_seconds", "value": total, "unit": "sec", "sf": sf})
    )
    sys.stdout.flush()


if __name__ == "__main__":
    main()
