"""Causal residual weighting + misc coverage."""

import jax
import jax.numpy as jnp
import numpy as np

from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from tests.test_utils import tiny_config


def test_causal_weighting_downweights_late_residuals():
    cfg = tiny_config(pde_type="wave")
    cfg.training.causal_eps = 1000.0  # aggressive: late-time nearly ignored
    pde = create_pde(cfg)
    # Residuals equal at all points: causal loss ~ plain mse regardless.
    t_sorted = jnp.linspace(0, 1, 64).reshape(-1, 1)
    r_uniform = jnp.ones((64, 1))
    causal = pde._residual_loss(r_uniform, t_sorted)
    assert 0 < float(causal) <= 1.0 + 1e-5
    # Early residual zero, late residual big: with huge eps the late part is
    # masked once accumulated error appears, so loss << plain mse.
    r_late = jnp.concatenate([jnp.zeros((32, 1)), 10.0 * jnp.ones((32, 1))])
    causal_late = pde._residual_loss(r_late, t_sorted)
    plain = float(jnp.mean(r_late**2))
    assert float(causal_late) < plain


def test_causal_disabled_matches_plain_loss():
    cfg = tiny_config(pde_type="heat")
    assert cfg.training.causal_eps == 0.0
    pde = create_pde(cfg)
    r = jnp.array([[1.0], [2.0], [3.0]])
    t = jnp.array([[0.1], [0.2], [0.3]])
    np.testing.assert_allclose(
        float(pde._residual_loss(r, t)), float(jnp.mean(r**2)), rtol=1e-6
    )


def test_causal_training_step_runs():
    from pinnrl_tpu.training import PDETrainer

    cfg = tiny_config(pde_type="wave", num_epochs=2)
    cfg.training.causal_eps = 1.0
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    res = PDETrainer(model, pde, cfg).train()
    assert res["status"] == "completed"
    assert np.isfinite(res["final_train_loss"])


def test_boundary_skeleton_covers_all_faces_2d():
    cfg = tiny_config(pde_type="heat_2d")
    pde = create_pde(cfg)
    x_b, t_b = pde._boundary_skeleton(n_time=50)
    x = np.asarray(x_b)
    (x0_lo, x0_hi), (x1_lo, x1_hi) = pde.domain
    on_face = (
        np.isclose(x[:, 0], x0_lo) | np.isclose(x[:, 0], x0_hi)
        | np.isclose(x[:, 1], x1_lo) | np.isclose(x[:, 1], x1_hi)
    )
    assert on_face.all()
    # Every face represented.
    for d, (lo, hi) in enumerate(pde.domain):
        assert np.isclose(x[:, d], lo).any()
        assert np.isclose(x[:, d], hi).any()


def test_dashboard_report_endpoint(tmp_path):
    import json
    import threading
    import urllib.request

    from pinnrl_tpu.dashboard.server import DashboardServer

    exp = tmp_path / "run1"
    exp.mkdir()
    (exp / "metadata.json").write_text(json.dumps({"status": "completed"}))
    (exp / "history.json").write_text(json.dumps({"train_loss": [1.0, 0.1]}))
    srv = None
    for port in range(18100, 18120):
        try:
            srv = DashboardServer(results_dir=str(tmp_path), port=port)
            break
        except OSError:
            continue
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        with urllib.request.urlopen(
            f"http://localhost:{srv.port}/api/experiment/run1/report", timeout=10
        ) as r:
            body = r.read()
        assert b"<svg" in body  # generated on demand, self-contained
    finally:
        srv.shutdown()
