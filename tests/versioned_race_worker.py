"""Out-of-process driver for the versioned store's commit protocol.

The in-process fence test (test_versioned_concurrent_commit_fenced)
interleaves writers via a mocked ``read_manifest``; this worker makes
the concurrency claims EMPIRICAL (VERDICT r10 #3): two real OS
processes race :func:`publish_version` against one root, and a third
mode holds the commit flock until SIGKILLed so the parent can prove
the kernel releases it on process death.

No Spark: the protocol under test (stage → fence-read → CAS publish)
is pure filesystem, and the merge plan it wraps is covered by the
Spark-side tests. Modes:

``race <root> <vtag>``
    mkdir ``<root>/<vtag>`` (the staging step, outside the lock),
    touch ``<vtag>.staged``, spin until ``<root>/go`` exists, then
    publish version 1 owning 2024-01-01. Exit 0 on publish, 7 on
    :class:`ConcurrentCommitError` — any other exit is a test bug.

``hold-lock <root>``
    acquire the commit flock, touch ``<root>/locked``, sleep forever
    (until the parent SIGKILLs this process mid-"commit").

``race-retry <root> <vtag> <date>``
    the Iceberg client loop ACROSS processes: stage ``<date>`` under
    ``<vtag>``, wait for ``go``, then publish-with-rebase — on a fence,
    re-read the winner's manifest, re-apply this writer's partition on
    top, and retry the next version. Both racers must eventually
    publish (exit 0; 5 = retries exhausted), leaving a final manifest
    that carries BOTH writers' partitions.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gas_data_pipeline_spark.pipeline.versioned import (  # noqa: E402
    ConcurrentCommitError,
    _commit_lock,
    publish_version,
    read_manifest,
)


def main() -> int:
    mode, root = sys.argv[1], sys.argv[2]
    if mode == "race":
        vtag = sys.argv[3]
        os.makedirs(os.path.join(root, vtag, "__pdate=2024-01-01"))
        open(os.path.join(root, f"{vtag}.staged"), "w").close()
        deadline = time.time() + 30
        while not os.path.exists(os.path.join(root, "go")):
            if time.time() > deadline:
                return 3
            time.sleep(0.001)
        try:
            publish_version(
                root, 1, {"2024-01-01": f"{vtag}/__pdate=2024-01-01"}
            )
            return 0
        except ConcurrentCommitError:
            return 7
    if mode == "race-retry":
        vtag, date = sys.argv[3], sys.argv[4]
        os.makedirs(os.path.join(root, vtag, f"__pdate={date}"))
        open(os.path.join(root, f"{vtag}.staged"), "w").close()
        deadline = time.time() + 30
        while not os.path.exists(os.path.join(root, "go")):
            if time.time() > deadline:
                return 3
            time.sleep(0.001)
        for _attempt in range(5):
            cur = read_manifest(root)
            version = (cur["version"] + 1) if cur else 1
            parts = dict(cur["partitions"]) if cur else {}
            parts[date] = f"{vtag}/__pdate={date}"
            try:
                publish_version(root, version, parts)
                return 0
            except ConcurrentCommitError:
                continue  # rebase: re-read the winner's manifest
        return 5
    if mode == "hold-lock":
        with _commit_lock(root):
            open(os.path.join(root, "locked"), "w").close()
            time.sleep(120)
        return 4  # unreachable: the parent kills us inside the sleep
    return 2


if __name__ == "__main__":
    sys.exit(main())
