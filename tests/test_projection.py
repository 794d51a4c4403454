"""Config-#5 scaling projection model (VERDICT r4 #5)."""

import pytest

from tpusparse.bench.projection import STEP_LAT_US, project


def test_project_compute_bound():
    # bucket compute far above comm: T(d) = d * t_bucket
    r = project(8, 50e-6, 0.8e-3, 32768, 8, 45.0)
    assert r["bound"] == "compute"
    assert r["t_total_us"] == pytest.approx(8 * 50.0, rel=1e-6)
    assert r["projected_efficiency"] == pytest.approx(
        0.8e-3 / (8 * 8 * 50e-6), rel=1e-3)


def test_project_comm_bound():
    # tiny bucket: per-step time floors at chunk_bytes/ICI + latency
    d, n, kt, ici = 8, 32768, 8, 45.0
    r = project(d, 1e-6, 0.8e-3, n, kt, ici)
    assert r["bound"] == "comm"
    t_comm = (n // d) * kt * 4 / (ici * 1e9) + STEP_LAT_US * 1e-6
    assert r["t_total_us"] == pytest.approx(d * t_comm * 1e6, rel=1e-3)


def test_project_speedup_consistency():
    r = project(4, 30e-6, 0.6e-3, 32768, 8, 90.0)
    assert r["projected_speedup"] == pytest.approx(
        4 * r["projected_efficiency"], rel=1e-2)


def test_scaling_harness_field_name_on_cpu():
    """On a CPU backend the harness must NOT emit a perf-shaped
    'efficiency' field (VERDICT r4 weak #7)."""
    from tpusparse.bench.scaling import measure_scaling

    rows = measure_scaling(m=512, n=512, k=8, avg_nnz_per_row=4.0,
                           device_counts=[1, 2], iters=2)
    for r in rows:
        assert "efficiency" not in r
        assert "wallclock_ratio_cpu_interpret_NOT_PERF" in r
