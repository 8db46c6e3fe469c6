"""Round-14 red-flag sweep over EVERY registered query's physical plan.

Builds each query's DataFrame (running its setup side effects) and
greps the formatted plan for the anti-patterns guide §3/§4/§7 warns
about: row-at-a-time Python evaluation (BatchEvalPython), cartesian
products, and BroadcastNestedLoopJoin. Prints one line per query with
the flags found (empty = clean) plus Exchange / Python-node counts, so
the whole suite's plan surface is auditable in one artifact.

Usage::

    python plans/r14/plan_sweep.py [query ...]   # default: all
"""

from __future__ import annotations

import io
import json
import os
import sys
import traceback
from contextlib import redirect_stdout

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(os.path.dirname(_HERE))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

FLAGS = (
    "BatchEvalPython",  # row-at-a-time Python UDF (guide §4.1)
    "CartesianProduct",  # accidental cross join (guide §3)
    "BroadcastNestedLoopJoin",  # non-equi fallback — fine only when one side is bounded
)
COUNTS = ("Exchange", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas", "SortMergeJoin")


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from gas_data_pipeline_spark.registry import all_queries, reset_model_seams
    from gas_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="r14-plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    todo = names or sorted(queries)
    out: dict[str, dict] = {}
    for name in todo:
        if name not in queries:
            print(f"!! unknown query: {name}", file=sys.stderr)
            continue
        try:
            reset_model_seams()
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            print(f"{name}: ERROR {type(exc).__name__}: {exc}", flush=True)
            traceback.print_exc(limit=3, file=sys.stderr)
            out[name] = {"error": str(exc)}
            continue
        # Count operator NODES from the formatted plan's detail list
        # ("(9) Exchange"), not raw substrings (which would double-count
        # BroadcastExchange under Exchange and match prose in details).
        import re

        nodes = re.findall(r"^\(\d+\) (\w+)", plan, flags=re.MULTILINE)
        flags = [f for f in FLAGS if f in nodes]
        counts = {c: nodes.count(c) for c in COUNTS}
        rec = {"flags": flags, **{c: n for c, n in counts.items() if n}}
        out[name] = rec
        tag = " ".join(flags) if flags else "clean"
        extras = " ".join(f"{c}={n}" for c, n in counts.items() if n)
        print(f"{name}: {tag} [{extras}]", flush=True)
    with open(os.path.join(_HERE, "plan_sweep.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    n_flagged = sum(1 for r in out.values() if r.get("flags"))
    print(f"\n{len(out)} plans swept, {n_flagged} flagged", flush=True)


if __name__ == "__main__":
    main()
