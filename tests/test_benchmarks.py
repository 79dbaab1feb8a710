"""FDM + sampling benchmark tests (analog of reference tests/unit_tests/
test_benchmarks.py: L2 gates, stability guards, seed reproducibility, CSV)."""

import numpy as np
import pytest

from pinnrl_tpu.benchmarks.fdm import solve_heat_1d, solve_wave_1d
from pinnrl_tpu.benchmarks.sampling import (
    results_to_csv,
    run_sampling_benchmark,
)


def test_fdm_heat_l2_gate():
    """Heat FDM L2 < 1e-3 vs analytic (reference: test_benchmarks.py:20-25)."""
    r = solve_heat_1d(nx=51, nt=2001, t_max=0.5)
    assert r.l2_error < 1e-3
    assert r.stability <= 0.5
    assert r.u.shape == (2001, 51)


def test_fdm_wave_l2_gate():
    """Wave FDM L2 < 1e-1 vs analytic (reference: test_benchmarks.py:31-34)."""
    r = solve_wave_1d(nx=101, nt=2001, t_max=0.5)
    assert r.l2_error < 1e-1
    assert r.stability <= 1.0


def test_fdm_heat_instability_raises():
    with pytest.raises(ValueError, match="unstable"):
        solve_heat_1d(alpha=1.0, nx=201, nt=11, t_max=1.0)


def test_fdm_wave_cfl_raises():
    with pytest.raises(ValueError, match="CFL"):
        solve_wave_1d(c=10.0, nx=1001, nt=11, t_max=1.0)


@pytest.fixture(scope="module")
def bench_results():
    return run_sampling_benchmark(
        pde="heat", strategies=["uniform", "stratified"], epochs=5, batch=64, seed=0
    )


def test_sampling_benchmark_rows(bench_results):
    assert len(bench_results) == 2
    for r in bench_results:
        assert np.isfinite(r.final_loss)
        assert r.points_per_sec > 0
        assert r.epochs == 5


def test_sampling_benchmark_seed_reproducible():
    """Same seed -> same L2 within rel 1e-6 (reference: test_benchmarks.py:61-64)."""
    a = run_sampling_benchmark(pde="heat", strategies=["uniform"], epochs=3, batch=32, seed=7)
    b = run_sampling_benchmark(pde="heat", strategies=["uniform"], epochs=3, batch=32, seed=7)
    np.testing.assert_allclose(a[0].l2_error, b[0].l2_error, rtol=1e-5)


def test_csv_schema(bench_results):
    csv = results_to_csv(bench_results)
    lines = csv.strip().split("\n")
    assert lines[0] == (
        "pde,architecture,strategy,final_loss,l2_error,rel_l2,"
        "wall_time_s,points_per_sec,epochs,seed"
    )
    assert len(lines) == 3
    assert lines[1].startswith("heat,fourier,uniform,")


def test_invalid_pde_and_strategy():
    with pytest.raises(ValueError):
        run_sampling_benchmark(pde="maxwell")
    with pytest.raises(ValueError):
        run_sampling_benchmark(pde="heat", strategies=["sobol"])


def test_heat_fdm_wrapper():
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.numerical_solvers import HeatEquationFDM
    from pinnrl_tpu.pdes import create_pde
    from tests.test_utils import tiny_config

    cfg = tiny_config(pde_type="heat")
    pde = create_pde(cfg)
    model = PINNModel(cfg)
    fdm = HeatEquationFDM(pde, nx=21, nt=101, t_max=0.1)
    metrics = fdm.compare_with_pinn(model.apply, model.params)
    assert np.isfinite(metrics["fdm_vs_pinn_l2"])


def test_adaptive_rl_variants_run_and_label():
    """Round-4 DQN regime probes: resfeat / improve variants train and tag
    their rows so paired studies can separate them (VERDICT r3 item 4)."""
    rs = run_sampling_benchmark(
        pde="heat",
        strategies=["adaptive[resfeat]", "adaptive[improve]"],
        epochs=3, batch=32, seed=0,
    )
    assert [r.strategy for r in rs] == ["adaptive[resfeat]", "adaptive[improve]"]
    assert all(np.isfinite(r.final_loss) for r in rs)


def test_adaptive_unknown_variant_raises():
    import pytest

    with pytest.raises(ValueError, match="variant"):
        run_sampling_benchmark(pde="heat", strategies=["adaptive[bogus]"],
                               epochs=2, batch=32)


def test_sampling_windows_curriculum_runs_all_strategies():
    """Round-5 non-stationary regime: windows=2 expanding-horizon
    curriculum runs every strategy class (uniform / RAR / DQN variant)
    with agent+optimizer carried across phases and finite results."""
    import numpy as np

    rs = run_sampling_benchmark(
        pde="burgers", strategies=["uniform", "residual_based",
                                   "adaptive[resfeat]"],
        epochs=6, batch=32, seed=0, windows=2,
    )
    assert len(rs) == 3
    for r in rs:
        assert r.epochs == 6
        assert np.isfinite(r.final_loss)
        assert np.isfinite(r.rel_l2)
