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