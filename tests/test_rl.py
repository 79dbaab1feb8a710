"""On-device DQN tests (analog of reference tests/unit_tests/test_rl_agent.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pinnrl_tpu.rl import CollocationAgent, RLAgent


def make_agent(**kw):
    defaults = dict(state_dim=2, hidden_dim=16, memory_size=256, batch_size=16, target_update=5)
    defaults.update(kw)
    return RLAgent(**defaults)


def test_init_state_shapes():
    agent = make_agent()
    st = agent.init(jax.random.PRNGKey(0))
    assert st.buf_state.shape == (256, 2)
    assert float(st.epsilon) == 1.0
    assert int(st.size) == 0


def test_select_action_epsilon_greedy():
    agent = make_agent(epsilon_start=0.0)  # always greedy
    st = agent.init(jax.random.PRNGKey(0))
    pts = jnp.zeros((10, 2))
    q = agent.select_action(st, pts, jax.random.PRNGKey(1))
    assert q.shape == (10,)
    # Greedy scores on identical states must be identical.
    assert float(jnp.std(q)) < 1e-6

    agent2 = make_agent(epsilon_start=1.0)  # always random
    st2 = agent2.init(jax.random.PRNGKey(0))
    q2 = agent2.select_action(st2, pts, jax.random.PRNGKey(1))
    assert float(jnp.std(q2)) > 1e-3


def test_push_ring_buffer_wraps():
    agent = make_agent(memory_size=32)
    st = agent.init(jax.random.PRNGKey(0))
    s = jnp.ones((20, 2))
    st = agent.push(st, s, jnp.ones((20,)), s, jnp.zeros(()))
    assert int(st.size) == 20 and int(st.ptr) == 20
    st = agent.push(st, 2 * s, jnp.ones((20,)), s, jnp.zeros(()))
    assert int(st.size) == 32  # capped at capacity
    assert int(st.ptr) == 8  # wrapped


def test_update_trains_and_decays_epsilon():
    agent = make_agent(batch_size=8, epsilon_decay=0.9)
    st = agent.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    s = jax.random.normal(key, (16, 2))
    p0 = st.policy_params
    st = agent.update(st, s, jnp.ones((16,)), s, jnp.zeros(()), key)
    # update() itself must NOT decay epsilon (the trainer decays it once per
    # epoch via update_epsilon).
    assert float(st.epsilon) == 1.0
    st = agent.update_epsilon(st)
    assert float(st.epsilon) < 1.0
    # Buffer >= batch_size -> a TD update must have changed the policy.
    changed = any(
        not np.allclose(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(st.policy_params)
        )
    )
    assert changed


def test_target_sync():
    agent = make_agent(target_update=2, batch_size=4)
    st = agent.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    s = jax.random.normal(key, (8, 2))
    st = agent.update(st, s, jnp.ones((8,)), s, jnp.zeros(()), key)  # steps=1
    st = agent.update(st, s, jnp.ones((8,)), s, jnp.zeros(()), key)  # steps=2 -> sync
    # After sync the target tracked the (pre-train) policy: they can't still
    # equal the initial params while policy has trained twice.
    assert int(st.steps) == 2


def test_update_jittable():
    agent = make_agent()
    st = agent.init(jax.random.PRNGKey(0))
    f = jax.jit(agent.update)
    s = jnp.zeros((8, 2))
    st2 = f(st, s, jnp.ones((8,)), s, jnp.zeros(()), jax.random.PRNGKey(2))
    assert int(st2.steps) == 1


def test_compute_reward():
    agent = make_agent()
    r = agent.compute_reward(1.0, 2.0, 3.0, exploration_bonus=10.0)
    assert float(r) == -1.0 - 2.0 - 3.0 + 0.1 * 10.0


def test_save_load_roundtrip(tmp_path):
    agent = make_agent()
    st = agent.init(jax.random.PRNGKey(0))
    path = tmp_path / "agent.msgpack"
    agent.save_state(str(path), st)
    st2 = agent.load_state(str(path), agent.init(jax.random.PRNGKey(9)))
    np.testing.assert_allclose(
        jax.tree_util.tree_leaves(st.policy_params)[0],
        jax.tree_util.tree_leaves(st2.policy_params)[0],
    )


def test_collocation_agent():
    agent = CollocationAgent(state_dim=2, hidden_dim=8, num_layers=2)
    st = agent.init(jax.random.PRNGKey(0))
    pts = jnp.zeros((5, 2))
    a = agent.get_action(st, pts, jax.random.PRNGKey(1))
    assert a.shape == (5, 1)
    st2 = agent.update(st, pts, jnp.ones((5, 1)), pts)
    assert st2 is not st
    st3 = agent.update_epsilon(st2)
    assert float(st3.epsilon) < float(st2.epsilon)
