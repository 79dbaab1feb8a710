"""Round-2 regression tests: RL reward wiring + epsilon schedule, config
snapshot round-trip, and the dashboard solution explorer."""

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from pinnrl_tpu.config import Config, load_config
from pinnrl_tpu.rl import RLAgent


def _agent(**kw):
    defaults = dict(state_dim=2, hidden_dim=16, memory_size=128, batch_size=8)
    defaults.update(kw)
    return RLAgent(**defaults)


def test_update_does_not_decay_epsilon():
    agent = _agent()
    st = agent.init(jax.random.PRNGKey(0))
    pts = jnp.zeros((4, 2))
    r = jnp.ones((4,))
    st2 = agent.update(st, pts, r, pts, jnp.ones(()), jax.random.PRNGKey(1))
    assert float(st2.epsilon) == float(st.epsilon)
    st3 = agent.update_epsilon(st2)
    assert float(st3.epsilon) < float(st2.epsilon)


def test_reward_weights_are_load_bearing():
    """Changing reward_weights must change the computed rewards."""
    res = jnp.array([0.1, 0.5])
    a1 = _agent(reward_weights={"residual": 1.0, "boundary": 0.0,
                                "initial": 0.0, "exploration": 0.0})
    a2 = _agent(reward_weights={"residual": 2.0, "boundary": 0.0,
                                "initial": 0.0, "exploration": 0.0})
    r1 = np.asarray(a1.compute_reward(res, 0.0, 0.0))
    r2 = np.asarray(a2.compute_reward(res, 0.0, 0.0))
    np.testing.assert_allclose(r2, 2 * r1, rtol=1e-6)
    # Elementwise: per-point residuals produce per-point rewards.
    assert r1.shape == (2,)
    # Global boundary/initial losses shift every reward equally.
    a3 = _agent(reward_weights={"residual": 1.0, "boundary": 1.0,
                                "initial": 1.0, "exploration": 0.0})
    r3 = np.asarray(a3.compute_reward(res, 0.25, 0.25))
    np.testing.assert_allclose(r3, r1 - 0.5, rtol=1e-6)


def test_score_fn_adapter_signature():
    """score_fn(state, key) must return a grid -> scores closure usable by
    sample_adaptive."""
    from pinnrl_tpu.sampling import sample_adaptive

    agent = _agent()
    st = agent.init(jax.random.PRNGKey(0))
    fn = agent.score_fn(st, jax.random.PRNGKey(1))
    grid = jnp.zeros((32, 2))
    scores = fn(grid)
    assert scores.shape == (32,)
    x, t = sample_adaptive(
        jax.random.PRNGKey(2), 16, [(0.0, 1.0)], (0.0, 1.0),
        score_fn=fn, points_per_axis=10,
    )
    assert x.shape == (16, 1) and t.shape == (16, 1)


def test_buffer_push_casts_dtypes():
    agent = _agent()
    st = agent.init(jax.random.PRNGKey(0))
    pts = jnp.zeros((4, 2))
    st2 = agent.push(st, pts, jnp.ones((4,)), pts, jnp.ones(()))
    assert st2.buf_reward.dtype == st.buf_reward.dtype
    assert int(st2.size) == 4


def test_config_snapshot_roundtrip():
    cfg = load_config(pde_type="burgers", architecture="fourier")
    cfg.model.hidden_dims = [48, 48]
    cfg.training.num_epochs = 7
    cfg.training.residual_dtype = "float64"
    d = cfg.to_dict()
    d2 = yaml.safe_load(yaml.safe_dump(d, default_flow_style=False))
    back = Config.from_snapshot(d2)
    assert back.pde_type == "burgers"
    assert back.model.architecture == "fourier"
    assert back.model.hidden_dims == [48, 48]
    assert back.training.num_epochs == 7
    assert back.training.residual_dtype == "float64"
    assert back.pde.domain == cfg.pde.domain
    assert back.training.lr_scheduler.scheduler_type == cfg.training.lr_scheduler.scheduler_type


def test_residual_dtype_validation():
    import pytest

    cfg = load_config(pde_type="heat")
    cfg.training.residual_dtype = "float32"  # attribute assignment is fine
    from pinnrl_tpu.config import TrainingConfig

    with pytest.raises(ValueError):
        TrainingConfig(residual_dtype="bfloat16")


def test_solution_explorer_from_tiny_run(tmp_path):
    """Train 2 epochs, then rebuild model+PDE from the experiment snapshot and
    serve the exact-vs-predicted payload (the dashboard explorer path)."""
    from pinnrl_tpu.dashboard.server import load_solution
    from pinnrl_tpu.models import PINNModel
    from pinnrl_tpu.pdes import create_pde
    from pinnrl_tpu.training import PDETrainer

    cfg = load_config(pde_type="heat", architecture="feedforward")
    cfg.model.hidden_dims = [16, 16]
    t = cfg.training
    t.num_epochs = 2
    t.batch_size = 32
    t.num_collocation_points = 32
    t.num_boundary_points = 16
    t.num_initial_points = 16
    t.validation_frequency = 1
    cfg.evaluation.save_plots = False

    exp = tmp_path / "exp1"
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    trainer = PDETrainer(model, pde, cfg)
    result = trainer.train(experiment_dir=str(exp), seed=0)
    assert result["status"] == "completed"
    (exp / "config.yaml").write_text(
        yaml.safe_dump(cfg.to_dict(), default_flow_style=False)
    )
    sol = load_solution(exp, grid=16, n_times=3)
    assert sol is not None and sol["dimension"] == 1
    assert len(sol["times"]) == 3
    assert len(sol["u_pred"]) == 3 and len(sol["u_pred"][0]) == 16
    assert sol["u_exact"] is not None
    assert np.isfinite(np.asarray(sol["u_pred"])).all()


def test_buffer_wraparound():
    agent = _agent(memory_size=16)
    st = agent.init(jax.random.PRNGKey(0))
    pts = jnp.arange(20, dtype=jnp.float32).reshape(10, 2)
    st = agent.push(st, pts, jnp.ones((10,)), pts, jnp.ones(()))
    st = agent.push(st, pts + 100, jnp.ones((10,)) * 2, pts, jnp.ones(()))
    assert int(st.size) == 16  # capped at capacity
    assert int(st.ptr) == 4  # wrapped around
    # Newest transitions overwrote the oldest slots.
    assert float(st.buf_state[0, 0]) >= 100.0


def test_target_sync_cadence():
    agent = _agent(target_update=2, batch_size=4)
    st = agent.init(jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(1), (8, 2))
    r = jnp.ones((8,))
    k = jax.random.PRNGKey(2)
    st1 = agent.update(st, pts, r, pts, jnp.ones(()), k)  # steps=1: no sync, trains
    diff_after_1 = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), jax.tree_util.tree_map(
            lambda p, t: p - t, st1.policy_params, st1.target_params), 0.0)
    assert diff_after_1 > 0  # policy trained, target stale
    st2 = agent.update(st1, pts, r, pts, jnp.ones(()), k)  # steps=2: sync BEFORE train
    assert int(st2.steps) == 2


def test_select_action_explore_vs_exploit():
    agent = _agent()
    st = agent.init(jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    st_greedy = st.replace(epsilon=jnp.zeros(()))
    q1 = agent.select_action(st_greedy, pts, jax.random.PRNGKey(2))
    q2 = agent.select_action(st_greedy, pts, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2))  # greedy: key-free
    st_explore = st.replace(epsilon=jnp.ones(()))
    r1 = agent.select_action(st_explore, pts, jax.random.PRNGKey(2))
    r2 = agent.select_action(st_explore, pts, jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(r1), np.asarray(r2))  # random scores


def test_epsilon_floor():
    agent = _agent(epsilon_end=0.25, epsilon_decay=0.1)
    st = agent.init(jax.random.PRNGKey(0))
    for _ in range(10):
        st = agent.update_epsilon(st)
    assert abs(float(st.epsilon) - 0.25) < 1e-6


def test_agent_state_save_load_roundtrip(tmp_path):
    agent = _agent()
    st = agent.init(jax.random.PRNGKey(0))
    st = agent.update_epsilon(st)
    path = str(tmp_path / "agent.msgpack")
    agent.save_state(path, st)
    st2 = agent.load_state(path, agent.init(jax.random.PRNGKey(1)))
    assert float(st2.epsilon) == float(st.epsilon)
    a = jax.tree_util.tree_leaves(st.policy_params)
    b = jax.tree_util.tree_leaves(st2.policy_params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
