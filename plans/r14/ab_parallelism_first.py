"""Round-14 A/B: AQE coalescing target — parallelismFirst (default,
coalesce only down to defaultParallelism) vs advisory-size-first
(`spark.sql.adaptive.coalescePartitions.parallelismFirst=false`).

Guide §2.2/§9 recommend letting the advisory size govern reduce
partition sizing; Spark's default instead maximizes parallelism. The
8-core bench (plans/r14/bench_8cpu.json) showed the suite is FASTER
with 4x fewer tasks at sf0.1, i.e. reduce-task constants dominate —
this A/B measures whether advisory-first coalescing harvests the same
win at full width without serializing the compute-dense kernels.

Both are runtime SQL confs, so modes alternate inside ONE process
(the round's standard interleaved-A/B discriminator; this box's
run-to-run noise is +/-30%). Usage::

    python plans/r14/ab_parallelism_first.py [--reps N] [q ...]
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(os.path.dirname(_HERE))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

DEFAULT_QUERIES = [
    # shuffle/window/write heavy
    "silver_upsert_idempotent",
    "pivot_long_to_wide",
    "melt_wide_to_long",
    "funnel_conversion",
    "entity_resolution_e2e",
    # iterative joins
    "graph_pagerank",
    # text/token pipelines (many exchanges)
    "text_unigram_logprob",
    "tfidf_top_terms",
    "curation_end_to_end",
    "dedup_incremental_batch",
    "dedup_minhash_lsh",
    "dedup_prefix_jaccard",
    # compute-dense kernels (the serialization risk)
    "dedup_char_jaccard",
    "coreset_kcenter_select",
    "dsir_importance_select",
    "ann_cosine_topk",
    # bounded-aggregate analytics
    "drift_psi_features",
    "heavy_hitters_exact",
]

CONF = "spark.sql.adaptive.coalescePartitions.parallelismFirst"


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    names = names or DEFAULT_QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from gas_data_pipeline_spark.registry import all_queries
    from gas_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="r14-ab-parallelism-first")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    base = spark.conf.get(CONF, "true")

    def run(name: str, mode: str) -> float:
        spark.conf.set(CONF, "false" if mode == "advisory" else base)
        gc.collect()
        spark.sparkContext.setJobDescription(f"ab:{name}:{mode}")
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        spark.conf.set(CONF, base)
        return round(dt, 4)

    out: dict[str, dict] = {}
    for name in names:
        if name not in queries:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        run(name, "default")  # unmeasured warmup (codegen, seams)
        a: list[float] = []
        b: list[float] = []
        for r in range(reps):
            # alternate order each rep so io drift cancels
            order = ("advisory", "default") if r % 2 == 0 else (
                "default", "advisory")
            for mode in order:
                dt = run(name, mode)
                (b if mode == "advisory" else a).append(dt)
        med_a, med_b = statistics.median(a), statistics.median(b)
        out[name] = {
            "default": a,
            "advisory": b,
            "median_default": med_a,
            "median_advisory": med_b,
            "ratio": round(med_b / med_a, 3) if med_a else None,
        }
        print(
            f"{name}: default={med_a:.2f}s advisory={med_b:.2f}s "
            f"ratio={out[name]['ratio']}",
            flush=True,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
