"""Driver entry points and convergence harness smoke tests."""

import jax
import numpy as np


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 1)
    assert bool(np.isfinite(np.asarray(out)).all())


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally


def test_convergence_harness_smoke():
    from pinnrl_tpu.benchmarks.convergence import results_to_csv, run_convergence

    r = run_convergence("heat", seed=0, epochs=2)
    assert np.isfinite(r.final_train_loss)
    assert r.points_per_sec > 0
    csv = results_to_csv([r])
    assert csv.startswith("pde,architecture,epochs,rel_l2")
    assert "heat,fourier,2," in csv


def test_convergence_cli(tmp_path, capsys):
    from pinnrl_tpu.benchmarks import cli

    rc = cli.main(["convergence", "--pde", "heat", "--epochs", "2",
                   "--csv", str(tmp_path / "c.csv")])
    assert rc == 0
    assert "rel_l2" in capsys.readouterr().out
    assert (tmp_path / "c.csv").exists()

def test_convergence_multistage_recipe(monkeypatch):
    """A RECIPES entry with ``stages`` routes through run_multistage and
    reports the total epoch budget."""
    from pinnrl_tpu.benchmarks import convergence as C

    tiny = dict(
        arch="feedforward",
        model=dict(hidden_dims=[8, 8]),
        training=dict(
            num_epochs=2, num_collocation_points=32, batch_size=32,
            num_boundary_points=8, num_initial_points=8,
            learning_rate=1e-3, weight_decay=0.0,
        ),
        stages=[dict(epochs=2)],
    )
    monkeypatch.setitem(C.RECIPES, "heat", tiny)
    r = C.run_convergence("heat", seed=0)
    assert r.epochs == 4  # 2 base + 2 correction
    assert np.isfinite(r.rel_l2)
    assert r.points_per_sec > 0
