"""On-device DQN for adaptive collocation sampling.

TPU-native redesign of the reference RL layer (reference: pinnrl/rl/
rl_agent.py:15-748). The reference keeps a Python ``deque`` replay buffer and
steps the DQN on host; here the **entire sample -> reward -> push -> train
loop lives in HBM** as fixed-shape pytrees inside jit:

- ``RLAgentState`` is a flax struct: policy/target params, optimizer state,
  ring-buffer arrays, pointers, epsilon, step counter.
- The replay buffer is a preallocated ``(capacity, ...)`` array set with a
  wrap-around dynamic slice; "enough samples to train" is a ``lax.cond``.
- epsilon-greedy scoring, the smooth-L1 TD update, gradient clipping and the
  periodic target sync all compile into the training step — no host round
  trips (this is the BASELINE.json north-star requirement).

Two agents are provided for reference parity:
- ``RLAgent``: full DQN (policy+target nets, replay, eps decay) —
  reference: rl_agent.py:140-566.
- ``CollocationAgent``: the lighter scorer with a naive Q update and no
  replay/target net — reference: rl_agent.py:644-748.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import optax


class DQNNetwork(nn.Module):
    """3-layer MLP: Dense -> LayerNorm -> ReLU (x2) -> Dense(action_dim)
    (reference: rl_agent.py:15-88)."""

    action_dim: int = 1
    hidden_dim: int = 512

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.Dense(self.hidden_dim, kernel_init=nn.initializers.xavier_uniform())(x)
            x = nn.LayerNorm()(x)
            x = nn.relu(x)
        return nn.Dense(self.action_dim, kernel_init=nn.initializers.xavier_uniform())(x)


@flax.struct.dataclass
class RLAgentState:
    policy_params: dict
    target_params: dict
    opt_state: tuple
    # Ring replay buffer (per-point transitions)
    buf_state: jax.Array  # (capacity, state_dim)
    buf_reward: jax.Array  # (capacity,)
    buf_next: jax.Array  # (capacity, state_dim)
    buf_done: jax.Array  # (capacity,)
    ptr: jax.Array  # int32
    size: jax.Array  # int32
    epsilon: jax.Array  # float32
    steps: jax.Array  # int32
    episode_reward: jax.Array  # float32


class RLAgent:
    """Functional DQN agent; all methods are pure and jittable."""

    def __init__(
        self,
        state_dim: int = 2,
        action_dim: int = 1,
        hidden_dim: int = 512,
        learning_rate: float = 1e-3,
        gamma: float = 0.99,
        epsilon_start: float = 1.0,
        epsilon_end: float = 0.01,
        epsilon_decay: float = 0.995,
        memory_size: int = 10000,
        batch_size: int = 124,
        target_update: int = 100,
        reward_weights: Optional[Dict[str, float]] = None,
    ):
        self.state_dim = state_dim
        self.action_dim = action_dim
        self.hidden_dim = hidden_dim
        self.gamma = gamma
        self.epsilon_end = epsilon_end
        self.epsilon_decay = epsilon_decay
        self.epsilon_start = epsilon_start
        self.memory_size = memory_size
        self.batch_size = batch_size
        self.target_update = target_update
        self.reward_weights = reward_weights or {
            "residual": 1.0,
            "boundary": 1.0,
            "initial": 1.0,
            "exploration": 0.1,
        }
        self.network = DQNNetwork(action_dim=action_dim, hidden_dim=hidden_dim)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(1.0), optax.adam(learning_rate)
        )

    def init(self, key: jax.Array) -> RLAgentState:
        dummy = jnp.zeros((1, self.state_dim))
        params = self.network.init(key, dummy)["params"]
        cap = self.memory_size
        return RLAgentState(
            policy_params=params,
            target_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=self.optimizer.init(params),
            buf_state=jnp.zeros((cap, self.state_dim)),
            buf_reward=jnp.zeros((cap,)),
            buf_next=jnp.zeros((cap, self.state_dim)),
            buf_done=jnp.zeros((cap,)),
            ptr=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
            epsilon=jnp.asarray(self.epsilon_start, jnp.float32),
            steps=jnp.zeros((), jnp.int32),
            episode_reward=jnp.zeros(()),
        )

    # ------------------------------------------------------------------ #
    # Acting
    # ------------------------------------------------------------------ #

    def select_action(self, state: RLAgentState, points: jax.Array, key: jax.Array) -> jax.Array:
        """epsilon-greedy scores over a batch of candidate points
        (reference: rl_agent.py:214-229): policy Q-values with prob 1-eps,
        random scores with prob eps — branch resolved on device.

        Grid scoring is a pure forward pass (scores feed a categorical draw,
        no gradient), so it routes through the fused Pallas MLP kernel on TPU
        (pinnrl_tpu.ops.kernels.mlp) when shapes allow.
        """
        k_bern, k_rand = jax.random.split(key)
        explore = jax.random.uniform(k_bern) < state.epsilon
        try:
            from pinnrl_tpu.ops.kernels.mlp import fused_mlp_score

            q = fused_mlp_score(points, state.policy_params)[..., 0]
        except Exception:
            q = self.network.apply({"params": state.policy_params}, points)[..., 0]
        r = jax.random.uniform(k_rand, q.shape)
        return jnp.where(explore, r, q)

    def score_fn(self, state: RLAgentState, key: jax.Array):
        """Adapter matching ``sample_adaptive``'s ``score_fn(grid)`` hook:
        returns a closure scoring a grid with this state's policy + epsilon."""
        return lambda grid: self.select_action(state, grid, key)

    def compute_reward(
        self,
        residual_loss,
        boundary_loss,
        initial_loss,
        exploration_bonus=0.0,
    ):
        """reward = -sum(w_i * loss_i) + w_explore * bonus
        (reference: rl_agent.py:251-276).

        Elementwise-safe: the trainer passes per-point |residual| as
        ``residual_loss`` and the scalar boundary/initial losses, so each
        transition's reward carries the point's own residual plus a global
        physics-misfit offset. Sampling draws points with probability
        proportional to |Q| — early in training the large BC/IC offset
        flattens the draw (exploration), and as those losses vanish the
        distribution sharpens onto residual peaks. ``reward_weights`` from
        the RL config scale each term, making them load-bearing.
        """
        w = self.reward_weights
        return (
            -w["residual"] * residual_loss
            - w["boundary"] * boundary_loss
            - w["initial"] * initial_loss
            + w["exploration"] * exploration_bonus
        )

    # ------------------------------------------------------------------ #
    # Learning
    # ------------------------------------------------------------------ #

    def push(
        self,
        state: RLAgentState,
        s: jax.Array,
        r: jax.Array,
        s_next: jax.Array,
        done: jax.Array,
    ) -> RLAgentState:
        """Insert a fixed-size batch of per-point transitions into the ring
        buffer (replaces the Python deque, reference: rl_agent.py:91-137)."""
        n = s.shape[0]
        cap = self.memory_size
        idx = (state.ptr + jnp.arange(n)) % cap
        # astype: transitions may arrive in f64 during an f64 polish phase;
        # the buffer stays in its allocated dtype.
        return state.replace(
            buf_state=state.buf_state.at[idx].set(s.astype(state.buf_state.dtype)),
            buf_reward=state.buf_reward.at[idx].set(
                jnp.broadcast_to(r, (n,)).astype(state.buf_reward.dtype)
            ),
            buf_next=state.buf_next.at[idx].set(s_next.astype(state.buf_next.dtype)),
            buf_done=state.buf_done.at[idx].set(
                jnp.broadcast_to(done, (n,)).astype(state.buf_done.dtype)
            ),
            ptr=(state.ptr + n) % cap,
            size=jnp.minimum(state.size + n, cap),
        )

    def _td_loss(self, policy_params, target_params, batch):
        s, r, s_next, done = batch
        q = self.network.apply({"params": policy_params}, s)[..., 0]
        q_next = self.network.apply({"params": target_params}, s_next)
        q_next = jnp.max(q_next, axis=-1)
        target = r + (1.0 - done) * self.gamma * jax.lax.stop_gradient(q_next)
        return optax.huber_loss(q, target).mean()

    def _train(self, state: RLAgentState, key: jax.Array) -> RLAgentState:
        idx = jax.random.randint(key, (self.batch_size,), 0, jnp.maximum(state.size, 1))
        batch = (
            state.buf_state[idx],
            state.buf_reward[idx],
            state.buf_next[idx],
            state.buf_done[idx],
        )
        grads = jax.grad(self._td_loss)(state.policy_params, state.target_params, batch)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.policy_params)
        return state.replace(
            policy_params=optax.apply_updates(state.policy_params, updates),
            opt_state=opt_state,
        )

    def update(
        self,
        state: RLAgentState,
        s: jax.Array,
        reward: jax.Array,
        s_next: jax.Array,
        done: jax.Array,
        key: jax.Array,
    ) -> RLAgentState:
        """push -> target sync every ``target_update`` steps -> train when the
        buffer holds >= batch_size (reference: rl_agent.py:278-317).

        Epsilon does NOT decay here: the trainer decays it once per EPOCH via
        ``update_epsilon`` so the exploration schedule tracks the training
        horizon instead of collapsing after ~920 scan steps regardless of it.

        On transitions: the trainer pushes bandit-style ``done=1`` per-point
        transitions, under which the TD target reduces to the reward and
        Q(s) -> E[reward(s)] with no bootstrapping. The target network is
        still synced and used in ``_td_loss`` — it is load-bearing whenever a
        caller pushes ``done=0`` sequential transitions (the reference's
        episode formulation, rl_agent.py:278-317), and a deliberate no-op in
        the bandit setting.
        """
        state = self.push(state, s, reward, s_next, done)
        state = state.replace(
            steps=state.steps + 1,
            episode_reward=state.episode_reward + jnp.mean(reward),
        )
        sync = (state.steps % self.target_update) == 0
        state = state.replace(
            target_params=jax.tree_util.tree_map(
                lambda t, p: jnp.where(sync, p, t), state.target_params, state.policy_params
            )
        )
        return jax.lax.cond(
            state.size >= self.batch_size,
            lambda st: self._train(st, key),
            lambda st: st,
            state,
        )

    def update_epsilon(self, state: RLAgentState) -> RLAgentState:
        """Standalone epsilon decay (reference: rl_agent.py:557-566)."""
        return state.replace(
            epsilon=jnp.maximum(self.epsilon_end, state.epsilon * self.epsilon_decay)
        )

    def get_statistics(self, state: RLAgentState) -> Dict[str, float]:
        """(reference: rl_agent.py:383-396)"""
        return {
            "epsilon": float(state.epsilon),
            "steps": int(state.steps),
            "buffer_size": int(state.size),
            "episode_reward": float(state.episode_reward),
        }

    # ------------------------------------------------------------------ #
    # Persistence
    # ------------------------------------------------------------------ #

    def save_state(self, path: str, state: RLAgentState) -> None:
        from flax import serialization

        with open(path, "wb") as f:
            f.write(serialization.to_bytes(state))

    def load_state(self, path: str, template: RLAgentState) -> RLAgentState:
        from flax import serialization

        with open(path, "rb") as f:
            return serialization.from_bytes(template, f.read())


# ---------------------------------------------------------------------- #
# Lighter variant
# ---------------------------------------------------------------------- #


@flax.struct.dataclass
class CollocationAgentState:
    params: dict
    opt_state: tuple
    epsilon: jax.Array


class CollocationAgent:
    """Plain MLP point scorer with a naive Q update — no replay or target
    network (reference: rl_agent.py:644-748)."""

    def __init__(
        self,
        state_dim: int = 2,
        action_dim: int = 1,
        hidden_dim: int = 64,
        num_layers: int = 3,
        learning_rate: float = 1e-3,
        gamma: float = 0.99,
        epsilon_start: float = 1.0,
        epsilon_end: float = 0.01,
        epsilon_decay: float = 0.995,
    ):
        class _MLP(nn.Module):
            @nn.compact
            def __call__(self, x):
                for _ in range(num_layers):
                    x = nn.Dense(hidden_dim)(x)
                    x = nn.relu(x)
                return nn.Dense(action_dim)(x)

        self.network = _MLP()
        self.state_dim = state_dim
        self.gamma = gamma
        self.epsilon_end = epsilon_end
        self.epsilon_decay = epsilon_decay
        self.epsilon_start = epsilon_start
        self.optimizer = optax.adam(learning_rate)

    def init(self, key: jax.Array) -> CollocationAgentState:
        params = self.network.init(key, jnp.zeros((1, self.state_dim)))["params"]
        return CollocationAgentState(
            params=params,
            opt_state=self.optimizer.init(params),
            epsilon=jnp.asarray(self.epsilon_start, jnp.float32),
        )

    def get_action(self, state: CollocationAgentState, points: jax.Array, key: jax.Array):
        explore = jax.random.uniform(key) < state.epsilon
        q = self.network.apply({"params": state.params}, points)
        r = jax.random.normal(key, q.shape)
        return jnp.where(explore, r, q)

    def update(
        self,
        state: CollocationAgentState,
        s: jax.Array,
        reward: jax.Array,
        s_next: jax.Array,
    ) -> CollocationAgentState:
        def loss_fn(p):
            q = self.network.apply({"params": p}, s)
            q_next = jax.lax.stop_gradient(self.network.apply({"params": p}, s_next))
            target = reward + self.gamma * q_next
            return jnp.mean((q - target) ** 2)

        grads = jax.grad(loss_fn)(state.params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state)
        return state.replace(
            params=optax.apply_updates(state.params, updates), opt_state=opt_state
        )

    def update_epsilon(self, state: CollocationAgentState) -> CollocationAgentState:
        return state.replace(
            epsilon=jnp.maximum(self.epsilon_end, state.epsilon * self.epsilon_decay)
        )
