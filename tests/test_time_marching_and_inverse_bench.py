"""Smoke + semantics tests for the time-marching harness and the
inverse-problem benchmark (reference ships neither; these are new
capabilities layered on the reference's convergence/inverse workflows,
reference: pinnrl/benchmarks/cli.py:31-183, docs/inverse_problems.md:123)."""

import numpy as np
import pytest


# ---------------------------------------------------------------- time-marching


def test_time_marching_smoke_and_naming():
    from pinnrl_tpu.benchmarks.convergence import run_time_marching

    r = run_time_marching("heat", seed=0, n_windows=2, epochs_per_window=2)
    assert r.pde == "heat_tm2"
    assert r.epochs == 4  # n_windows * epochs_per_window
    assert np.isfinite(r.rel_l2) and r.rel_l2 >= 0
    assert np.isfinite(r.final_train_loss)
    assert r.points_per_sec > 0


def test_time_marching_inherits_ic_between_windows(monkeypatch):
    """Window 1's initial condition must come from window 0's trained model,
    not the analytic IC: capture the pde objects and compare the registered
    'initial' BC against the true problem IC."""
    from pinnrl_tpu.benchmarks import convergence as conv

    captured = []
    orig_create = conv.create_pde

    def spy_create(cfg):
        pde = orig_create(cfg)
        captured.append(pde)
        return pde

    monkeypatch.setattr(conv, "create_pde", spy_create)
    conv.run_time_marching("heat", seed=0, n_windows=2, epochs_per_window=1)
    assert len(captured) == 2
    first, second = captured
    # Window 0 keeps the analytic IC; window 1's must be the inherited closure.
    import jax.numpy as jnp

    x = jnp.linspace(0.0, 1.0, 8).reshape(-1, 1)
    t = jnp.zeros((8, 1))
    ic0 = np.asarray(first.boundary_conditions["initial"](x, t))
    ic1 = np.asarray(second.boundary_conditions["initial"](x, t))
    assert ic0.shape == ic1.shape == (8, 1)
    # A 1-epoch model does not reproduce the analytic IC exactly.
    assert not np.allclose(ic0, ic1, atol=1e-6)


def test_time_marching_windows_partition_time_domain(monkeypatch):
    from pinnrl_tpu.benchmarks import convergence as conv

    domains = []
    orig_create = conv.create_pde

    def spy_create(cfg):
        domains.append(tuple(cfg.pde.time_domain))
        return orig_create(cfg)

    monkeypatch.setattr(conv, "create_pde", spy_create)
    conv.run_time_marching("heat", seed=0, n_windows=3, epochs_per_window=1)
    assert len(domains) == 3
    # Contiguous, ordered windows covering the full recipe horizon.
    full = conv.build_recipe_config("heat").pde.time_domain
    assert domains[0][0] == pytest.approx(full[0])
    assert domains[-1][1] == pytest.approx(full[1])
    for (_, hi), (lo, _) in zip(domains[:-1], domains[1:]):
        assert hi == pytest.approx(lo)


# ------------------------------------------------------------ inverse benchmark


@pytest.fixture(scope="module")
def heat_inverse_results():
    from pinnrl_tpu.benchmarks.inverse import run_inverse

    return run_inverse("heat", seed=0, epochs=2)


def test_inverse_bench_result_fields(heat_inverse_results):
    (r,) = heat_inverse_results
    assert r.pde == "heat" and r.parameter == "alpha"
    assert r.true_value == pytest.approx(0.01)
    assert r.initial_guess == pytest.approx(0.1)
    assert np.isfinite(r.identified)
    assert r.rel_error >= 0
    assert r.epochs == 2 and r.seed == 0


def test_inverse_bench_rel_error_definition(heat_inverse_results):
    (r,) = heat_inverse_results
    assert r.rel_error == pytest.approx(
        abs(r.identified - r.true_value) / abs(r.true_value), rel=1e-9
    )


def test_inverse_bench_csv(heat_inverse_results):
    from pinnrl_tpu.benchmarks.inverse import results_to_csv

    csv = results_to_csv(heat_inverse_results)
    lines = csv.strip().split("\n")
    assert lines[0].startswith("pde,parameter,true_value,initial_guess")
    assert lines[1].startswith("heat,alpha,0.01,0.1,")
    assert len(lines) == 2


def test_inverse_cli_smoke(tmp_path, capsys):
    from pinnrl_tpu.benchmarks import cli

    rc = cli.main(["inverse", "--pde", "heat", "--epochs", "2",
                   "--csv", str(tmp_path / "inv.csv")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "identified" in out
    assert (tmp_path / "inv.csv").read_text().startswith("pde,parameter")


def test_time_marching_cli_smoke(monkeypatch, capsys):
    """--time-marching N routes to run_time_marching (patched tiny)."""
    from pinnrl_tpu.benchmarks import cli
    from pinnrl_tpu.benchmarks import convergence as conv

    orig = conv.run_time_marching

    def tiny(pde_key, seed=0, n_windows=4, epochs_per_window=None):
        return orig(pde_key, seed=seed, n_windows=n_windows, epochs_per_window=1)

    monkeypatch.setattr(conv, "run_time_marching", tiny)
    rc = cli.main(["convergence", "--pde", "heat", "--time-marching", "2"])
    assert rc == 0
    assert "heat_tm2" in capsys.readouterr().out


def test_black_scholes_sigma_canonical_sign():
    """sigma enters the BS residual only as sigma^2 (identifiable up to
    sign); canonicalize_coeffs maps the negative root to the canonical
    non-negative volatility, other keys untouched."""
    from pinnrl_tpu.config import load_config
    from pinnrl_tpu.pdes import create_pde

    cfg = load_config(pde_type="black_scholes", architecture="feedforward")
    pde = create_pde(cfg)
    out = pde.canonicalize_coeffs({"sigma": -0.1996, "r": 0.05})
    assert out["sigma"] == 0.1996
    assert out["r"] == 0.05
    # base PDEs: identity
    cfg2 = load_config(pde_type="heat", architecture="feedforward")
    pde2 = create_pde(cfg2)
    assert pde2.canonicalize_coeffs({"alpha": -0.01}) == {"alpha": -0.01}


def test_time_marching_mutate_hook_applies_per_window():
    """Round-5 probe support: the mutate hook rewrites every window config
    (model/training overrides) while preserving the window-specific
    time_domain and epochs (scripts/probe_recipe.py tm=N path)."""
    import numpy as np

    from pinnrl_tpu.benchmarks.convergence import run_time_marching

    seen = []

    def mutate(wcfg):
        wcfg.model.hidden_dims = [8, 8]
        wcfg.model.arch_params["mapping_size"] = 4
        seen.append((tuple(wcfg.pde.time_domain), wcfg.training.num_epochs))

    r = run_time_marching(
        "heat", seed=0, n_windows=2, epochs_per_window=2, mutate=mutate
    )
    assert len(seen) == 2
    (td0, ep0), (td1, ep1) = seen
    assert td0[1] == td1[0]          # windows abut
    assert ep0 == 2 and ep1 == 2     # per-window epochs preserved
    assert np.isfinite(r.rel_l2)
