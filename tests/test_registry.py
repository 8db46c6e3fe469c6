"""Driver-contract integrity: the window and probe lists reference
real registrations, in the order the external driver will see."""

from __future__ import annotations


def test_driver_window_is_the_first_fifty():
    from gas_data_pipeline_spark.registry import _DRIVER_WINDOW, all_queries

    names = list(all_queries())
    assert len(_DRIVER_WINDOW) == 50
    assert names[:50] == list(_DRIVER_WINDOW)
    assert len(set(_DRIVER_WINDOW)) == 50  # no duplicate slots


def test_window_entries_carry_oracles_unless_documented_rows_only():
    from gas_data_pipeline_spark.registry import _DRIVER_WINDOW, all_oracles

    # The only window entries allowed to run rows-only are the four
    # approximations whose ground-truth bounds live in pytest: ANN
    # recall floors (tests/test_northstar.py: test_ivf_topk_... >=0.5,
    # test_pq_topk_... >=0.4), HLL relative error <=2%
    # (tests/test_plans.py:test_approx_distinct_accuracy), t-digest
    # quantile error <=1%
    # (tests/test_layout.py:test_approx_percentiles_close_to_exact).
    rows_only_allowed = {
        "ann_ivf",
        "ann_pq",
        "approx_distinct_users",
        "approx_percentiles_tdigest",
    }
    oracles = all_oracles()
    missing = {n for n in _DRIVER_WINDOW if n not in oracles}
    assert missing == rows_only_allowed


def test_scale_probe_names_are_registered():
    import bench
    from gas_data_pipeline_spark.registry import all_queries

    assert set(bench.SCALE_PROBE_QUERIES) <= set(all_queries())
