"""The shared probe plumbing (tools/probekit) and its consumers: the
r8 consolidation must be behavior-neutral, so pin the timing contract
(min-of-N, rounded, full run list preserved) and that every consumer
still imports cleanly — an import error in bench.py would take out the
driver's per-round BENCH artifact."""

from __future__ import annotations

from tools.probekit import WARM_DIR, timed_count


def test_timed_count_returns_min_rows_and_all_runs():
    calls = []

    def fn():
        calls.append(1)
        return 42

    best, n, runs = timed_count(fn, runs=3)
    assert len(calls) == 3
    assert n == 42
    assert len(runs) == 3
    assert best == min(runs)
    # rounded to ms like the inline loops it replaced
    assert all(r == round(r, 3) for r in runs)


def test_warm_dir_is_the_smallest_fixture():
    assert WARM_DIR.endswith("sf0.001")


def test_consumers_import_without_a_session():
    # module import must not build a SparkSession (bench_session is lazy)
    import bench
    import tools.probe_skew
    import tools.run_registry_scale

    assert callable(bench.main)
    assert callable(tools.probe_skew.main)
    assert callable(tools.run_registry_scale.main)
