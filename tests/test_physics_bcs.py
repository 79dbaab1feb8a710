"""Tests for the keyed BC/IC sampling + structural periodic/Neumann BCs
(VERDICT round-1 items 5 and 6): fresh points each step, configured counts
honored exactly, endpoint mismatch entering the periodic loss, Neumann
matching the normal derivative, and generic smoothness."""

import jax
import jax.numpy as jnp
import numpy as np

from pinnrl_tpu.config import PDESettings, TrainingConfig, load_config
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.pdes.base import PDEBase


def _make_pde(pde_type="kdv", bcs=None, n_b=64, n_i=48, dimension=1, domain=None):
    settings = PDESettings(
        pde_type=pde_type,
        dimension=dimension,
        domain=domain or [[0.0, 1.0]] * dimension,
        time_domain=[0.0, 1.0],
        boundary_conditions=bcs or {"dirichlet": {"value": 0.0}},
        initial_condition={"type": "sine", "amplitude": 1.0, "frequency": 1.0},
    )
    training = TrainingConfig(
        num_boundary_points=n_b, num_initial_points=n_i, num_epochs=1
    )
    return PDEBase.create(pde_type, settings, training)


def test_boundary_points_fresh_per_key():
    pde = _make_pde()
    x1, t1 = pde._sample_boundary_points(jax.random.PRNGKey(0), 32)
    x2, t2 = pde._sample_boundary_points(jax.random.PRNGKey(1), 32)
    assert x1.shape == x2.shape
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_initial_points_fresh_per_key():
    pde = _make_pde()
    x1, _ = pde._sample_initial_points(jax.random.PRNGKey(0), 32)
    x2, _ = pde._sample_initial_points(jax.random.PRNGKey(1), 32)
    assert not np.allclose(np.asarray(x1), np.asarray(x2))


def test_compute_loss_uses_fresh_bc_points_per_step():
    """Two loss evaluations with different keys on an asymmetric net must see
    different boundary samples (different boundary loss)."""
    pde = _make_pde(bcs={"dirichlet": {"value": 0.0}})
    apply_fn = lambda p, z: (jnp.sin(3.0 * z[..., 0]) * z[..., 1]).reshape(-1, 1)
    x = jnp.linspace(0, 1, 16).reshape(-1, 1)
    t = jnp.linspace(0, 1, 16).reshape(-1, 1)
    l1 = pde.compute_loss(apply_fn, {}, x, t, key=jax.random.PRNGKey(0))
    l2 = pde.compute_loss(apply_fn, {}, x, t, key=jax.random.PRNGKey(7))
    assert float(l1["boundary"]) != float(l2["boundary"])


def test_bc_counts_honored_below_200():
    """Configured counts below the old 200-point floor must take effect."""
    pde = _make_pde(n_b=24, n_i=12)
    n_b, n_i = pde._bc_counts(1024)
    assert (n_b, n_i) == (24, 12)
    x_b, _ = pde._sample_boundary_points(jax.random.PRNGKey(0), n_b)
    assert x_b.shape[0] == (24 // 2) * 2  # per-face split, 2 faces in 1D
    x_i, t_i = pde._sample_initial_points(jax.random.PRNGKey(0), n_i)
    assert x_i.shape == (12, 1) and float(jnp.max(jnp.abs(t_i))) == 0.0


def test_periodic_mismatch_enters_loss():
    """A non-periodic field must produce a positive periodic BC loss; a
    periodic one (value AND derivative) must be ~zero."""
    pde = _make_pde(bcs={"periodic": {}})
    u_bad = lambda z: z[0] * 1.0  # u=x: endpoint values differ
    u_good = lambda z: jnp.sin(2 * jnp.pi * z[0])  # period-1 in x
    bad = float(pde._periodic_loss(u_bad, jax.random.PRNGKey(0), 64))
    good = float(pde._periodic_loss(u_good, jax.random.PRNGKey(0), 64))
    assert bad > 1e-2
    assert good < 1e-8


def test_periodic_derivative_mismatch_detected():
    """Value-periodic but derivative-mismatched field must still be penalized
    (true periodicity matches values AND first derivatives)."""
    pde = _make_pde(bcs={"periodic": {}})
    # u = x(1-x): u(0)=u(1)=0 but u'(0)=1, u'(1)=-1.
    u = lambda z: z[0] * (1.0 - z[0])
    loss = float(pde._periodic_loss(u, jax.random.PRNGKey(0), 64))
    assert loss > 1e-2


def test_neumann_matches_normal_derivative():
    """du/dn targets: for u = x on [0,1], outward normal derivative is -1 at
    x=0 and +1 at x=1; a target of 0 gives loss 1, a matching closure ~0."""
    pde = _make_pde(bcs={"neumann": {"value": 0.0}})
    u = lambda z: z[0] * 1.0
    zero_target = lambda x, t: jnp.zeros_like(x[:, 0:1])
    loss_zero = float(pde._neumann_loss(u, zero_target, jax.random.PRNGKey(0), 32))
    # Per-face mse summed over both faces: (−1−0)^2 + (+1−0)^2 = 2.
    assert abs(loss_zero - 2.0) < 1e-5
    matching = lambda x, t: jnp.where(x[:, 0:1] < 0.5, -1.0, 1.0)
    loss_match = float(pde._neumann_loss(u, matching, jax.random.PRNGKey(0), 32))
    assert loss_match < 1e-10


def test_generic_smoothness_active_when_weighted():
    settings = PDESettings(
        pde_type="kdv", dimension=1, domain=[[0.0, 1.0]], time_domain=[0.0, 1.0],
        boundary_conditions={"dirichlet": {"value": 0.0}},
        initial_condition={"type": "sine"},
    )
    training = TrainingConfig(
        num_boundary_points=16, num_initial_points=16,
        loss_weights={"residual": 1.0, "boundary": 1.0, "initial": 1.0,
                      "smoothness": 0.5, "data": 0.0},
    )
    pde = PDEBase.create("kdv", settings, training)
    apply_fn = lambda p, z: jnp.sin(8.0 * z[..., 0:1])
    x = jnp.linspace(0.01, 0.99, 32).reshape(-1, 1)
    t = jnp.full_like(x, 0.5)
    losses = pde.compute_loss(apply_fn, {}, x, t, key=jax.random.PRNGKey(0))
    assert float(losses["smoothness"]) > 0.0


def test_random_ic_is_function_of_coordinates():
    """The random IC must be a fixed function: same x -> same target,
    regardless of batch composition."""
    pde = _make_pde()
    ic = pde._create_initial_condition({"type": "random", "amplitude": 0.1, "seed": 3})
    x_a = jnp.array([[0.25], [0.5], [0.75]])
    x_b = jnp.array([[0.5]])  # same point inside a different batch
    t = jnp.zeros((3, 1))
    v_a = np.asarray(ic(x_a, t))
    v_b = np.asarray(ic(x_b, jnp.zeros((1, 1))))
    np.testing.assert_allclose(v_a[1], v_b[0], rtol=1e-6)
    assert np.std(v_a) > 0  # not constant


def test_periodic_config_trains_against_periodicity_kdv():
    """KdV with periodic BCs in config: compute_loss must include a positive
    boundary term for a non-periodic net (the old base used a sine proxy)."""
    pde = _make_pde(pde_type="kdv", bcs={"periodic": {}}, domain=[[-1.0, 1.0]])
    apply_fn = lambda p, z: (z[..., 0] ** 2).reshape(-1, 1)  # even, non-periodic deriv
    x = jnp.linspace(-1, 1, 16).reshape(-1, 1)
    t = jnp.linspace(0, 1, 16).reshape(-1, 1)
    losses = pde.compute_loss(apply_fn, {}, x, t, key=jax.random.PRNGKey(0))
    # x^2 has equal endpoint VALUES on [-1,1] but derivative -2 vs +2.
    assert float(losses["boundary"]) > 1e-2


def test_boundary_faces_all_covered_2d():
    pde = _make_pde(dimension=2, domain=[[0.0, 1.0], [0.0, 2.0]], n_b=80)
    x_b, t_b = pde._sample_boundary_points(jax.random.PRNGKey(0), 80)
    x_np = np.asarray(x_b)
    per_face = 80 // 4
    # Pinned coordinates per face block.
    assert np.all(x_np[0 * per_face : 1 * per_face, 0] == 0.0)
    assert np.all(x_np[1 * per_face : 2 * per_face, 0] == 1.0)
    assert np.all(x_np[2 * per_face : 3 * per_face, 1] == 0.0)
    assert np.all(x_np[3 * per_face : 4 * per_face, 1] == 2.0)
    # Free coordinates actually sweep their ranges.
    assert np.std(x_np[:per_face, 1]) > 0.1


def test_heat_stratified_boundary_time():
    cfg = load_config(pde_type="heat", architecture="feedforward")
    pde = create_pde(cfg)
    t = np.asarray(pde._sample_boundary_time(jax.random.PRNGKey(0), 400)).reshape(-1)
    t_max = pde.time_domain[1]
    frac_early = float(np.mean(t <= 0.01 * t_max))
    assert 0.2 <= frac_early <= 0.3  # ~25% in the first 1% of the horizon


def test_burgers_traveling_wave_residual_is_zero():
    """The traveling-wave exact solution must satisfy the PDE: interpolate it
    with the residual operator applied to the analytic field."""
    settings = PDESettings(
        pde_type="burgers", dimension=1, domain=[[-1.0, 1.0]], time_domain=[0.0, 1.0],
        parameters={"nu": 0.05},
        exact_solution={"type": "traveling_wave", "amplitude": 0.4, "speed": 0.3,
                        "center": -0.2},
    )
    pde = PDEBase.create("burgers", settings, TrainingConfig())
    nu, a, c, x0 = 0.05, 0.4, 0.3, -0.2

    def u_exact_fn(p, z):
        xi = a * (z[..., 0:1] - x0 - c * z[..., 1:2]) / (2 * nu)
        return c - a * jnp.tanh(xi)

    x = jnp.linspace(-0.9, 0.9, 64).reshape(-1, 1)
    t = jnp.linspace(0.05, 0.95, 64).reshape(-1, 1)
    res = pde.compute_residual(u_exact_fn, {}, x, t)
    assert float(jnp.max(jnp.abs(res))) < 1e-3  # f32 AD noise only


def test_burgers_traveling_wave_bc_ic_consistent():
    settings = PDESettings(
        pde_type="burgers", dimension=1, domain=[[-1.0, 1.0]], time_domain=[0.0, 1.0],
        parameters={"nu": 0.01},
        boundary_conditions={"dirichlet": {"value": 0.0}},
        initial_condition={"type": "traveling_wave"},
        exact_solution={"type": "traveling_wave", "amplitude": 0.5, "speed": 0.5,
                        "center": -0.25},
    )
    pde = PDEBase.create("burgers", settings, TrainingConfig())
    x = jnp.linspace(-1, 1, 32).reshape(-1, 1)
    t0 = jnp.zeros_like(x)
    ic = pde.boundary_conditions["initial"](x, t0)
    np.testing.assert_allclose(
        np.asarray(ic), np.asarray(pde.exact_solution(x, t0)), atol=1e-6
    )
    bc = pde.boundary_conditions["dirichlet"]
    t_line = jnp.linspace(0, 1, 16).reshape(-1, 1)
    x_hi = jnp.ones_like(t_line)
    np.testing.assert_allclose(
        np.asarray(bc(x_hi, t_line)),
        np.asarray(pde.exact_solution(x_hi, t_line)),
        atol=1e-6,
    )


def test_wave_velocity_ic_uses_fresh_points():
    cfg = load_config(pde_type="wave", architecture="feedforward")
    cfg.training.num_boundary_points = 32
    cfg.training.num_initial_points = 16
    pde = create_pde(cfg)
    apply_fn = lambda p, z: jnp.sin(z[..., 0:1] + z[..., 1:2])
    x = jnp.linspace(0, 1, 8).reshape(-1, 1)
    t = jnp.linspace(0, 1, 8).reshape(-1, 1)
    l1 = pde.compute_loss(apply_fn, {}, x, t, key=jax.random.PRNGKey(0))
    l2 = pde.compute_loss(apply_fn, {}, x, t, key=jax.random.PRNGKey(5))
    assert float(l1["initial"]) != float(l2["initial"])
    assert np.isfinite(float(l1["total"]))


def test_pendulum_velocity_ic_pins_phase():
    """theta_t(0)=0 must enter the initial loss: a phase-drifted solution
    theta0*cos(wt) + B*sin(wt) has zero linearized residual and a matching
    value IC, so only the velocity IC can reject it."""
    cfg = load_config(pde_type="pendulum", architecture="feedforward")
    cfg.pde.parameters["linearized"] = True
    cfg.training.num_boundary_points = 32
    cfg.training.num_initial_points = 32
    pde = create_pde(cfg)
    omega = jnp.sqrt(9.81)
    theta0 = 0.5

    def make_apply(B):
        return lambda p, z: (
            theta0 * jnp.cos(omega * z[..., 1:2]) + B * jnp.sin(omega * z[..., 1:2])
        )

    x = jnp.linspace(0, 3.14, 16).reshape(-1, 1)
    t = jnp.linspace(0, 10, 16).reshape(-1, 1)
    key = jax.random.PRNGKey(0)
    l_exact = pde.compute_loss(make_apply(0.0), {}, x, t, key=key)
    l_drift = pde.compute_loss(make_apply(0.3), {}, x, t, key=key)
    # velocity IC of the drifted solution: theta_t(0) = B*omega = 0.94
    assert float(l_drift["initial"]) > float(l_exact["initial"]) + 0.1
    assert float(l_exact["initial"]) < 1e-4


def test_hard_ic_transform_pins_value_and_velocity():
    """model.hard_ic composes u = u0 + (t-t0) v0 + tanh^2(tau) net: at t0 the
    value equals the IC target and (for 2nd-order-in-time PDEs) the time
    derivative equals d/dt exact, independent of the network."""
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.ops.derivatives import directional_derivative

    cfg = load_config(pde_type="pendulum", architecture="feedforward")
    cfg.pde.parameters["linearized"] = True
    cfg.model.hard_ic = True
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=3)
    model.output_transform = pde.hard_ic_transform()
    x = jnp.linspace(0, 3.14, 9).reshape(-1, 1)
    z0 = jnp.concatenate([x, jnp.zeros_like(x)], axis=1)
    np.testing.assert_allclose(np.asarray(model.apply(model.params, z0)), 0.5, atol=1e-6)
    u = pde._scalar_u(model.apply, model.params)
    vel = jax.vmap(lambda zz: directional_derivative(u, zz, 1, 1)[0])(z0)
    np.testing.assert_allclose(np.asarray(vel), 0.0, atol=1e-5)


def test_hard_ic_first_order_and_trainer_wiring():
    """1st-order PDEs get a tanh ramp (value-only pin); PDETrainer wires the
    transform from model.hard_ic and the stacked-jet fast path stands down."""
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.training.trainer import PDETrainer

    cfg = load_config(pde_type="heat", architecture="fourier")
    cfg.model.hard_ic = True
    cfg.model.hidden_dims = [16, 16]
    cfg.model.arch_params["mapping_size"] = 8
    t = cfg.training
    t.num_epochs = 2; t.batch_size = 32; t.num_collocation_points = 64
    t.num_boundary_points = 16; t.num_initial_points = 16
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    trainer = PDETrainer(model, pde, cfg)
    assert model.output_transform is not None
    assert not trainer.fast_bundle_active
    x = jnp.linspace(0, 2, 5).reshape(-1, 1)
    z0 = jnp.concatenate([x, jnp.zeros_like(x)], axis=1)
    ic = pde.boundary_conditions["initial"](x, jnp.zeros_like(x))
    np.testing.assert_allclose(
        np.asarray(model.apply(model.params, z0)), np.asarray(ic), atol=1e-5
    )
    res = trainer.train(seed=0)
    assert res["status"] == "completed"


def test_hard_ic_rejects_vector_output():
    cfg = load_config(pde_type="kdv", architecture="feedforward")
    cfg.pde.output_dim = 3
    pde = create_pde(cfg)
    try:
        pde.hard_ic_transform()
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "scalar" in str(e)
