"""PDETrainer: the fused TPU training loop.

TPU-native redesign of the reference trainer (reference: pinnrl/training/
trainer.py:27-1693). The reference runs a Python epoch loop where every step
does host-side sampling, several autograd passes and an optimizer step; here
**one epoch is a single XLA program**: a jitted ``jax.lax.scan`` over steps,
each step fusing sample -> loss (residual/BC/IC/data) -> grad -> optax update
-> (optionally) the DQN agent's replay push + TD update. A whole validation
interval of epochs is fused into one device call; the host syncs once per
chunk and handles only I/O, validation cadence, early stopping, and the
Adam->L-BFGS phase switch.

Feature parity checklist (reference lines):
- optimizers adam | lbfgs | adam_lbfgs with switch_ratio (trainer.py:281-389)
- cosine / reduce-on-plateau schedules (trainer.py:311-332)
- gradient clipping (trainer.py:690-693)
- adaptive loss weights LRW/RBW (trainer.py:580-684) — LRW's per-component
  gradient norms come from one jacrev, not N backward passes
- validation + early stopping (trainer.py:140-162, 788-801)
- inverse-mode coefficient tracking param_<name> (trainer.py:444-454)
- experiment-dir file protocol: .running, metadata.json, history.json,
  metrics.json, live_snapshot.npz, final model (trainer.py:474-963)
"""

from __future__ import annotations

import json
import logging
import time
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pinnrl_tpu.config import Config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes.base import PDEBase
from pinnrl_tpu.rl.dqn import RLAgent
from pinnrl_tpu.training.adaptive_weights import AdaptiveLossWeights
from pinnrl_tpu.utils.io import save_live_snapshot, save_training_metrics

logger = logging.getLogger(__name__)


class PDETrainer:
    """Trains a PINN on a PDE problem with the full reference feature set."""

    def __init__(
        self,
        model: PINNModel,
        pde: PDEBase,
        config: Config,
        rl_agent: Optional[RLAgent] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ) -> None:
        self.model = model
        self.pde = pde
        self.config = config
        self.tcfg = config.training
        self.rl_agent = rl_agent
        self.mesh = mesh

        # Strategy: attaching an agent forces adaptive sampling
        # (reference: trainer.py:549-553).
        self.strategy = (
            "adaptive" if rl_agent is not None else self.tcfg.collocation_distribution
        )

        # Hard initial-condition imposition (model.hard_ic): compose
        # u = u0(x) [+ (t-t0) v0(x)] + ramp(t) * net so the IC (and for
        # 2nd-order-in-time PDEs the velocity IC) holds exactly by
        # construction. Must run BEFORE attach_fast_bundle: the stacked-jet
        # path declares itself unsupported when an output transform is set.
        if getattr(config.model, "hard_ic", False) and model.output_transform is None:
            model.output_transform = pde.hard_ic_transform()

        # Stacked-jet residual fast path (ops/jet_mlp.py): one matmul per
        # layer transports all derivative streams. "auto" (default) attaches
        # whenever the PDE/model pair supports it; exact same numerics as the
        # per-point path (see tests/test_jet_fastpath.py).
        self.fast_bundle_active = pde.attach_fast_bundle(
            model, enable=self.tcfg.get("stacked_jet", "auto")
        )
        # Fused fwd+bwd Pallas residual-loss kernel (TPU only): the residual
        # term's forward AND backward run in one VMEM-resident program per
        # batch tile (ops/kernels/fused_step.py). Auto-gated off for causal
        # weighting, non-mse losses, inverse mode, or off-TPU backends.
        # Never attached under a device mesh: pallas_call has no SPMD
        # partitioning rule outside shard_map, so a NamedSharding-annotated
        # batch would fail to partition (advisor round 4).
        fused_enable = self.tcfg.get("fused_residual_kernel", "auto")
        if self.mesh is not None:
            if fused_enable in (True, "on"):
                raise ValueError(
                    "fused_residual_kernel cannot be combined with a device "
                    "mesh: the Pallas program does not partition under "
                    "NamedSharding (wrap in shard_map to lift this)"
                )
            fused_enable = "off"
        self.fused_kernel_active = pde.attach_fused_residual_kernel(
            model, enable=fused_enable
        )

        self.optimizer_name = self.tcfg.optimizer
        self._ema_decay = float(getattr(self.tcfg, "param_ema", 0.0))
        self.switch_epoch = (
            int(self.tcfg.adam_lbfgs_switch_ratio * self.tcfg.num_epochs)
            if self.optimizer_name == "adam_lbfgs"
            else None
        )

        # Adaptive weights (disabled under pure L-BFGS, reference: trainer.py:464-468).
        aw_cfg = self.tcfg.adaptive_weights
        self.aw_enabled = bool(aw_cfg.enabled and self.optimizer_name != "lbfgs")
        self.adaptive_weights = AdaptiveLossWeights(
            strategy=aw_cfg.strategy,
            alpha=aw_cfg.alpha,
            eps=float(aw_cfg.eps),
            initial_weights=list(aw_cfg.initial_weights)[:3]
            if aw_cfg.initial_weights
            else None,
            num_components=3,
        )

        self.history: Dict[str, list] = {
            "train_loss": [],
            "val_loss": [],
            "learning_rate": [],
            "epoch_time": [],
            "loss_components": {
                k: [] for k in ("residual", "boundary", "initial", "smoothness", "data")
            },
            "adaptive_weights": [],
        }
        for name in self.pde.trainable_parameters:
            self.history[f"param_{name}"] = []

    # ------------------------------------------------------------------ #
    # Optimizer construction
    # ------------------------------------------------------------------ #

    def _make_lr_schedule(self, num_epochs: int, steps_per_epoch: int):
        oc = self.tcfg.optimizer_config
        sched = self.tcfg.lr_scheduler
        if self.tcfg.scheduler_type == "cosine":
            return optax.cosine_decay_schedule(
                init_value=oc.learning_rate,
                decay_steps=max(num_epochs * steps_per_epoch, 1),
                alpha=sched.eta_min / max(oc.learning_rate, 1e-12),
            )
        return oc.learning_rate  # constant; plateau handled via transform

    def _make_adam(self, num_epochs: int, steps_per_epoch: int):
        oc = self.tcfg.optimizer_config
        lr = self._make_lr_schedule(num_epochs, steps_per_epoch)
        chain = [optax.clip_by_global_norm(self.tcfg.gradient_clip_norm)]
        if oc.weight_decay and oc.weight_decay > 0:
            chain.append(
                optax.adamw(lr, b1=oc.beta1, b2=oc.beta2, weight_decay=oc.weight_decay)
            )
        else:
            chain.append(optax.adam(lr, b1=oc.beta1, b2=oc.beta2))
        if self.tcfg.scheduler_type == "reduce_lr":
            sched = self.tcfg.lr_scheduler
            chain.append(
                optax.contrib.reduce_on_plateau(
                    factor=sched.factor,
                    patience=sched.patience,
                    accumulation_size=1,
                )
            )
        return optax.chain(*chain)

    def _make_lbfgs(self):
        lb = self.tcfg.lbfgs
        return optax.lbfgs(
            memory_size=lb.history_size,
            linesearch=optax.scale_by_zoom_linesearch(
                max_linesearch_steps=25, verbose=False
            ),
        )

    # ------------------------------------------------------------------ #
    # Loss plumbing
    # ------------------------------------------------------------------ #

    def _loss_components(self, params: Dict, x, t, key):
        """params = {"net": ..., "coeffs": {...}} -> component dict."""
        return self.pde.compute_loss(
            self.model.apply, params["net"], x, t, coeffs=params["coeffs"], key=key
        )

    def _weighted_total(self, losses: Dict, weights: jnp.ndarray):
        """Adaptive-weight total: w . [residual, boundary, initial] plus the
        statically-weighted smoothness/data terms (reference: trainer.py:631-644)."""
        lw = self.pde._loss_weights()
        smooth_w = float(lw.get("smoothness", 0.0))
        data_w = float(lw.get("data", 1.0))
        mode = self.pde._training_mode()
        physics = 0.0 if mode == "data_only" else 1.0
        if mode in ("inverse", "data_only", "data_augmented") and data_w <= 0.0:
            data_w = 1.0
        return (
            physics * weights[0] * losses["residual"]
            + physics * weights[1] * losses["boundary"]
            + physics * weights[2] * losses["initial"]
            + smooth_w * losses["smoothness"]
            + physics * float(lw.get("gpinn", 0.0)) * losses.get("gpinn", 0.0)
            + physics * float(lw.get("mass", 0.0)) * losses.get("mass", 0.0)
            + physics * float(lw.get("mu_h2", 0.0)) * losses.get("mu_h2", 0.0)
            + data_w * losses["data"]
        )

    # ------------------------------------------------------------------ #
    # Step builders
    # ------------------------------------------------------------------ #

    def _sample(self, key, n, params, rl_state):
        strategy = self.strategy
        if strategy == "residual_based":
            residual_fn = lambda xx, tt: self.pde.residual_score(
                self.model.apply, params["net"], xx, tt, params["coeffs"]
            )
            return self.pde.generate_collocation_points(
                key, n, "residual_based", residual_fn=residual_fn
            )
        if strategy == "adaptive" and self.rl_agent is not None:
            k_score, k_samp = jax.random.split(key)
            return self.pde.generate_collocation_points(
                k_samp, n, "adaptive",
                score_fn=self.rl_agent.score_fn(rl_state, k_score),
            )
        return self.pde.generate_collocation_points(key, n, strategy)

    def _build_epoch_fn(
        self,
        optimizer,
        batch_size: int,
        steps_per_epoch: int,
        lbfgs: bool,
        f64: Optional[bool] = None,
    ):
        """One jitted epoch: lax.scan over fused train steps."""
        agent = self.rl_agent
        aw_on = self.aw_enabled
        lrw = aw_on and self.adaptive_weights.strategy == "lrw"
        n_push = min(128, batch_size)  # per-step transitions pushed into the DQN buffer
        # f64 polish: during the phase-2 polish the residual (and the whole
        # objective) can be evaluated in float64 to get past the f32 noise
        # floor of 3rd/4th-order forward-mode derivatives (the KdV and
        # Cahn-Hilliard accuracy ceiling). Params are cast at the phase
        # switch in train(); here the sampled batch follows them. Callers
        # pass f64 explicitly for the phase-2 adam variant (fresh batches).
        if f64 is None:
            f64 = lbfgs and self.tcfg.residual_dtype == "float64"

        def loss_total(params, x, t, key):
            losses = self._loss_components(params, x, t, key)
            return losses["total"], losses

        def step(carry, _):
            state = carry
            if lbfgs:
                # L-BFGS needs a deterministic objective: fresh resampling
                # every step destroys its curvature history and line search.
                # Use one fixed batch for the whole phase (the reference also
                # evaluates the closure on a fixed per-step batch). The batch
                # derives from state["lbfgs_key"], which train() refreshes —
                # together with an optimizer restart — every
                # lbfgs.resample_every epochs (deterministic WITHIN a round).
                key, k_rl = jax.random.split(state["key"], 2)
                k_samp = jax.random.fold_in(state["lbfgs_key"], 0x5EED)
                k_loss = jax.random.fold_in(state["lbfgs_key"], 0x10E5)
            else:
                key, k_samp, k_loss, k_rl = jax.random.split(state["key"], 4)
            if lbfgs:
                # Fixed uniform batch: RAR/adaptive draws depend on the
                # CURRENT params' residual field, so even a fixed key gives a
                # drifting objective that breaks the line search and
                # curvature history.
                x, t = self.pde.generate_collocation_points(
                    k_samp, batch_size, "uniform"
                )
            else:
                x, t = self._sample(k_samp, batch_size, state["params"], state["rl"])
            if f64:
                x, t = x.astype(jnp.float64), t.astype(jnp.float64)
            if self.mesh is not None:
                # Shard the collocation batch across the data axis; params
                # stay replicated, so XLA emits the gradient psum over ICI.
                from pinnrl_tpu.parallel.mesh import shard_batch

                x, t = shard_batch(self.mesh, x, t)

            # --- gradient computation ---
            if not aw_on:
                if lbfgs:
                    (total, losses), grads = jax.value_and_grad(
                        lambda p: loss_total(p, x, t, k_loss), has_aux=True
                    )(state["params"])
                    updates, opt_state = optimizer.update(
                        grads,
                        state["opt_state"],
                        state["params"],
                        value=total,
                        grad=grads,
                        value_fn=lambda p: loss_total(p, x, t, k_loss)[0],
                    )
                else:
                    (total, losses), grads = jax.value_and_grad(
                        lambda p: loss_total(p, x, t, k_loss), has_aux=True
                    )(state["params"])
                    try:
                        updates, opt_state = optimizer.update(
                            grads, state["opt_state"], state["params"], value=total
                        )
                    except TypeError:
                        updates, opt_state = optimizer.update(
                            grads, state["opt_state"], state["params"]
                        )
                params = optax.apply_updates(state["params"], updates)
                aw_state = state["aw"]
                weights = self.adaptive_weights.get_weights(aw_state)
            else:
                def stacked_fn(p):
                    losses = self._loss_components(p, x, t, k_loss)
                    return jnp.stack(
                        [losses["residual"], losses["boundary"], losses["initial"]]
                    ), losses

                comp_vals, losses = stacked_fn(state["params"])
                if lrw:
                    # One jacrev sweep -> per-component grads -> global norms
                    # (reference does N separate backward passes, trainer.py:607-626).
                    jac = jax.jacrev(lambda p: stacked_fn(p)[0])(state["params"])
                    norms = jnp.sqrt(
                        sum(
                            jnp.sum(leaf.reshape(3, -1) ** 2, axis=1)
                            for leaf in jax.tree_util.tree_leaves(jac)
                        )
                    )
                    aw_state = self.adaptive_weights.update(state["aw"], norms)
                else:
                    aw_state = self.adaptive_weights.update(state["aw"], comp_vals)
                weights = jax.lax.stop_gradient(
                    self.adaptive_weights.get_weights(aw_state)
                )
                total, grads = jax.value_and_grad(
                    lambda p: self._weighted_total(
                        self._loss_components(p, x, t, k_loss), weights
                    )
                )(state["params"])
                try:
                    updates, opt_state = optimizer.update(
                        grads, state["opt_state"], state["params"], value=total
                    )
                except TypeError:
                    updates, opt_state = optimizer.update(
                        grads, state["opt_state"], state["params"]
                    )
                params = optax.apply_updates(state["params"], updates)

            # --- RL agent update: reference reward shaping
            # (-sum w_i * loss_i, rl_agent.py:251-276) with the residual term
            # evaluated PER POINT so the DQN learns the residual landscape it
            # should concentrate on. Bandit-style transitions (done=1): each
            # sampled point is its own state, Q(s) -> E[reward(s)] with no
            # bootstrapping mismatch; sampling draws by |Q|. ---
            rl_state = state["rl"]
            if agent is not None:
                pts = jnp.concatenate([x[:n_push], t[:n_push]], axis=-1)
                res = self.pde.residual_score(
                    self.model.apply, params["net"], x[:n_push], t[:n_push], params["coeffs"]
                )
                reward = agent.compute_reward(
                    res, losses["boundary"], losses["initial"]
                )
                rl_state = agent.update(
                    rl_state, pts, reward, pts, jnp.ones(()), k_rl
                )

            metrics = {
                "total": total,
                "residual": losses["residual"],
                "boundary": losses["boundary"],
                "initial": losses["initial"],
                "smoothness": losses["smoothness"],
                "data": losses["data"],
                "weights": weights,
                # Downsampled collocation points for the evolution plots
                # (reference points_history: trainer.py:564-566).
                "pts": jnp.concatenate([x[:64], t[:64]], axis=-1),
            }
            # Polyak/EMA weight averaging on adam phases (the deterministic
            # L-BFGS polish keeps the EMA frozen — it starts from it instead,
            # see train()). Elementwise, so it fuses into the update.
            ema = state["ema"]
            if self._ema_decay > 0.0 and not lbfgs:
                # Zero-initialized shadow with Adam-style bias correction at
                # read time (train() divides by 1 - d^n): an init-seeded
                # shadow would keep d^n of the RANDOM init in the average —
                # measured 1.8e-1 rel-L2 on KdV before the debias.
                d = float(self._ema_decay)  # python float: weak-typed, keeps leaf dtype
                shadow, n = ema
                shadow = jax.tree_util.tree_map(
                    lambda e, p: d * e + (1.0 - d) * p, shadow, params["net"]
                )
                ema = (shadow, n + 1)
            new_state = {
                "params": params,
                "opt_state": opt_state,
                "aw": aw_state,
                "rl": rl_state,
                "ema": ema,
                "key": key,
                "lbfgs_key": state["lbfgs_key"],
            }
            return new_state, metrics

        def epoch_fn(state, _=None):
            state, metrics = jax.lax.scan(step, state, None, length=steps_per_epoch)
            if agent is not None:
                # Epsilon decays once per EPOCH so exploration anneals over
                # the configured horizon (a per-step decay inside the scan
                # hits epsilon_min after ~920 steps regardless of it).
                state = {**state, "rl": agent.update_epsilon(state["rl"])}
            pts = metrics.pop("pts")[-1]  # last step's sampled points
            out = jax.tree_util.tree_map(lambda m: jnp.mean(m, axis=0), metrics)
            out["pts"] = pts
            return state, out

        ens = 1 if lbfgs else int(self.tcfg.ensemble_size)

        def chunk_fn(state, n_epochs_in_chunk):
            # Fuse a whole validation interval of epochs into ONE device
            # call: the host syncs once per chunk instead of 7+ times per
            # epoch (each transfer over the TPU tunnel costs ~10s of ms).
            def run(st):
                return jax.lax.scan(epoch_fn, st, None, length=n_epochs_in_chunk)

            if ens > 1:
                # Deep ensemble: vmap the WHOLE fused chunk over the stacked
                # member axis — E independent trainings (independent batches,
                # grads, optimizer states) execute as one batched XLA
                # program. History metrics report the member mean.
                st, metrics = jax.vmap(run)(state)
                pts = metrics.pop("pts")[0]
                metrics = jax.tree_util.tree_map(
                    lambda m: jnp.mean(m, axis=0), metrics
                )
                metrics["pts"] = pts
                return st, metrics
            return run(state)

        # Buffer donation re-enabled (round 3): the round-2 axon backend
        # returned a final scan carry inconsistent with in-scan metrics
        # under donation (params silently diverged); the minimal repro
        # (scripts/test_buffer_donation.py) now passes bit-identically on
        # the current backend, and donating the state pytree saves a full
        # params+opt_state copy per chunk.
        return jax.jit(chunk_fn, static_argnums=1, donate_argnums=0)

    def _maybe_promote_f64(self, params):
        """Cast the optimized pytree's floats to float64 for the L-BFGS phase
        when ``training.residual_dtype == "float64"``. Enables jax x64 on the
        fly (a config read at trace time, so already-compiled f32 programs
        are unaffected; the phase's fresh jit traces in f64)."""
        if self.tcfg.residual_dtype != "float64":
            return params
        jax.config.update("jax_enable_x64", True)
        dev = self._f64_device()
        if dev is not None:
            params = jax.device_put(params, dev)
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
            else a,
            params,
        )

    def _f64_device(self):
        """Device for the f64 polish phase: the host CPU backend (native f64)
        when the default backend is a TPU. XLA:TPU has no native f64 — its
        X64-rewriting pass decomposes every f64 op into f32 pairs, which
        explodes compile time on the 3rd/4th-order jet HLO (measured: a
        single KdV loss+grad did not finish compiling in 9 min, and the
        full-batch program OOMs at 22G). The CPU backend compiles the same
        program in ~15s and runs a 2048-point eval in ~2s, which is plenty
        for a short deterministic polish. Committing the phase's state to CPU
        devices routes the jitted epoch there (computation follows data).
        Returns None when no move is needed (already CPU, or mesh-sharded)."""
        if self.tcfg.residual_dtype != "float64" or self.mesh is not None:
            return None
        if jax.default_backend() == "cpu":
            return None
        try:
            return jax.devices("cpu")[0]
        except RuntimeError:
            return None

    def _maybe_commit_f64_state(self, state):
        """Commit the full phase state to the f64 device (see _f64_device)."""
        dev = self._f64_device()
        if dev is None:
            return state
        logger.info("f64 L-BFGS polish runs on the host CPU backend")
        return jax.device_put(state, dev)

    @staticmethod
    def _demote_f32(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.float64)
            else a,
            tree,
        )

    # ------------------------------------------------------------------ #
    # Validation
    # ------------------------------------------------------------------ #

    def _ema_init(self, net):
        """(zero shadow, update count) — or () when EMA is disabled."""
        if self._ema_decay <= 0.0:
            return ()
        return (
            jax.tree_util.tree_map(jnp.zeros_like, net),
            jnp.zeros((), jnp.int32),
        )

    def _ema_read(self, ema):
        """Debiased EMA params (shadow / (1 - d^n)); None before any update.
        Handles both plain and ensemble-stacked (n of shape (E,)) shadows."""
        shadow, n = ema
        n = jnp.asarray(n)
        if not bool(jnp.all(n > 0)):
            return None
        denom = 1.0 - jnp.power(self._ema_decay, n.astype(jnp.float32))

        def fix(s):
            dn = denom.reshape(denom.shape + (1,) * (s.ndim - denom.ndim))
            return s / dn

        return jax.tree_util.tree_map(fix, shadow)

    def _build_val_fn(self, num_points: int = 1000):
        ens = int(self.tcfg.ensemble_size)

        def val_fn(params, key):
            x, t = self.pde.generate_collocation_points(key, num_points, "uniform")
            if ens > 1:
                # Mean member loss on a SHARED validation batch.
                totals = jax.vmap(
                    lambda p: self._loss_components(p, x, t, key)["total"]
                )(params)
                return jnp.mean(totals)
            losses = self._loss_components(params, x, t, key)
            return losses["total"]

        return jax.jit(val_fn)

    # ------------------------------------------------------------------ #
    # Deep ensemble (training.ensemble_size > 1)
    # ------------------------------------------------------------------ #

    def _validate_ensemble(self) -> None:
        """Constraint check for vmapped ensemble training. The vmap wraps the
        plain-adam fused chunk; stateful host-side phases (L-BFGS switch,
        plateau scheduler), the on-device DQN, adaptive loss weights, the
        device mesh, and the f64 CPU polish are out of scope and raise
        loudly rather than train something subtly different."""
        t = self.tcfg
        bad = []
        if self.optimizer_name != "adam":
            bad.append("optimizer must be 'adam'")
        if t.collocation_distribution == "adaptive":
            bad.append("collocation_distribution 'adaptive' (DQN) unsupported")
        if self.aw_enabled:
            bad.append("adaptive_weights must be disabled")
        if self.mesh is not None:
            bad.append("device-mesh data parallelism unsupported")
        if t.scheduler_type not in ("cosine", "constant"):
            bad.append(f"scheduler_type {t.scheduler_type!r} unsupported")
        if t.residual_dtype != "float32":
            bad.append("residual_dtype must be float32")
        if bad:
            raise ValueError(
                "training.ensemble_size > 1 constraints violated: " + "; ".join(bad)
            )

    def _stack_ensemble_state(self, state: Dict, optimizer, seed: int) -> Dict:
        """Build the stacked (leading member axis) training state: fresh
        per-member network inits, per-member optimizer state and PRNG keys,
        and tiled copies of everything else."""
        E = int(self.tcfg.ensemble_size)
        dummy = jnp.zeros((1, self.model.config.input_dim), jnp.float32)
        member_keys = jax.vmap(
            lambda m: jax.random.fold_in(jax.random.PRNGKey(seed), m)
        )(jnp.arange(E))
        net = jax.vmap(lambda k: self.model.module.init(k, dummy)["params"])(
            member_keys
        )

        def tile(a):
            a = jnp.asarray(a)
            return jnp.stack([a] * E)

        params = {
            "net": net,
            "coeffs": jax.tree_util.tree_map(tile, state["params"]["coeffs"]),
        }
        return {
            "params": params,
            "opt_state": jax.vmap(optimizer.init)(params),
            "aw": jax.tree_util.tree_map(tile, state["aw"]),
            "rl": state["rl"],  # () — the DQN is excluded by _validate_ensemble
            # Stacked EMA: zero shadow per member, per-member update count.
            "ema": (
                (
                    jax.tree_util.tree_map(jnp.zeros_like, net),
                    jnp.zeros((E,), jnp.int32),
                )
                if self._ema_decay > 0.0
                else ()
            ),
            "key": jax.vmap(
                lambda m: jax.random.fold_in(state["key"], m)
            )(jnp.arange(E)),
            "lbfgs_key": jax.vmap(
                lambda m: jax.random.fold_in(state["lbfgs_key"], m)
            )(jnp.arange(E)),
        }

    # ------------------------------------------------------------------ #
    # Train driver
    # ------------------------------------------------------------------ #

    def train(
        self,
        num_epochs: Optional[int] = None,
        batch_size: Optional[int] = None,
        num_points: Optional[int] = None,
        experiment_dir: Optional[str] = None,
        seed: int = 0,
        resume_from: Optional[str] = None,
    ) -> Dict[str, Any]:
        t = self.tcfg
        num_epochs = num_epochs or t.num_epochs
        batch_size = batch_size or t.batch_size
        num_points = num_points or t.num_collocation_points
        # L-BFGS runs one fixed batch per phase: the full collocation set by
        # default (reference: trainer.py:456-462), capped by
        # training.lbfgs.batch_size when the full-batch objective would not
        # fit in HBM (the f64 polish on 40k KdV points needs ~22G on a 16G
        # chip — the zoom linesearch holds several live value_fn copies).
        lbfgs_bs = min(t.lbfgs.batch_size or num_points, num_points)
        if self.optimizer_name == "lbfgs":
            batch_size = lbfgs_bs
        batch_size = min(batch_size, num_points)
        # Recompute the phase switch against the ACTUAL horizon (train() args
        # may override the config the constructor saw).
        if self.optimizer_name == "adam_lbfgs":
            self.switch_epoch = int(self.tcfg.adam_lbfgs_switch_ratio * num_epochs)
        if self.mesh is not None:
            from pinnrl_tpu.parallel.mesh import pad_to_multiple

            batch_size = pad_to_multiple(batch_size, self.mesh.size)
        steps_per_epoch = max(num_points // batch_size, 1)

        exp = Path(experiment_dir) if experiment_dir else None
        self._fh = None
        if exp:
            exp.mkdir(parents=True, exist_ok=True)
            (exp / "visualizations").mkdir(exist_ok=True)
            (exp / ".running").touch()
            if not (exp / "config.yaml").exists():
                # Config snapshot: the dashboard's solution explorer rebuilds
                # the exact model/PDE from it (Config.from_snapshot) — owned
                # by the trainer so every entry path gets one, not just the
                # CLI (reference infers hyperparams from tensor shapes
                # instead, dashboard.py:2428-2501).
                try:
                    import yaml

                    (exp / "config.yaml").write_text(
                        yaml.safe_dump(self.config.to_dict(), default_flow_style=False)
                    )
                except Exception:
                    logger.exception("config snapshot failed")
            self._write_metadata(exp, status="running", num_epochs=num_epochs)
            self._fh = logging.FileHandler(exp / "experiment.log")
            logger.addHandler(self._fh)

        key = jax.random.PRNGKey(seed)
        key, k_rl = jax.random.split(key)

        params = {"net": self.model.params, "coeffs": self.pde.init_coeffs()}
        rl_state = self.rl_agent.init(k_rl) if self.rl_agent is not None else ()

        # Phase-1 adam anneals over ITS OWN phase, not the whole horizon:
        # switching mid-cosine hands phase 2 an un-annealed (noisy) iterate.
        adam_opt = self._make_adam(self.switch_epoch or num_epochs, steps_per_epoch)
        lbfgs_opt = self._make_lbfgs() if self.optimizer_name in ("lbfgs", "adam_lbfgs") else None

        if self.optimizer_name == "lbfgs":
            optimizer, lbfgs_mode = lbfgs_opt, True
        else:
            optimizer, lbfgs_mode = adam_opt, False
        if lbfgs_mode:
            params = self._maybe_promote_f64(params)

        state = {
            "params": params,
            "opt_state": optimizer.init(params),
            "aw": self.adaptive_weights.init(),
            "rl": rl_state,
            # EMA shadow of params["net"] + update count (empty pytree when
            # disabled so the scan carry stays structure-stable). The shadow
            # starts at ZERO and is debiased by 1 - d^n at read time.
            "ema": self._ema_init(params["net"]),
            "key": key,
            # Round key for the fixed L-BFGS batch (see _build_epoch_fn);
            # refreshed every lbfgs.resample_every epochs during the phase.
            "lbfgs_key": jax.random.PRNGKey(0xF1EED ^ seed),
        }
        # Break any buffer aliasing (e.g. L-BFGS init referencing param
        # buffers) before handing the state to the compiled epoch function.
        state = jax.tree_util.tree_map(jnp.array, state)
        if lbfgs_mode:
            state = self._maybe_commit_f64_state(state)
        if int(t.ensemble_size) > 1:
            self._validate_ensemble()
            state = self._stack_ensemble_state(state, optimizer, seed)

        start_epoch = 0
        if resume_from:
            state, start_epoch = self._load_checkpoint(resume_from, state)
            logger.info("Resumed from %s at epoch %d", resume_from, start_epoch)
            # The checkpoint restores lbfgs_key wholesale; fold the run's
            # seed back in so resumed runs launched with DIFFERENT seeds
            # draw fresh fixed L-BFGS batches (multi-round SAA across
            # resumed segments — scripts/ch_lbfgs_bites.py), while crash
            # retries with the SAME seed keep the deterministic batch.
            state = {
                **state,
                "lbfgs_key": jax.random.fold_in(state["lbfgs_key"], seed),
            }
        self.points_history: list = getattr(self, "points_history", [])
        epoch_fn = self._build_epoch_fn(optimizer, batch_size, steps_per_epoch, lbfgs_mode)
        val_fn = self._build_val_fn(self.config.evaluation.num_points)

        es = t.early_stopping
        best_val = float("inf")
        patience_count = 0
        val_key = jax.random.PRNGKey(10_000 + seed)
        start_time = time.time()
        status = "completed"
        oc_lr = t.optimizer_config.learning_rate

        lr_sched = (
            self._make_lr_schedule(self.switch_epoch or num_epochs, steps_per_epoch)
            if t.scheduler_type == "cosine"
            else None
        )
        stop = False
        epoch = start_epoch
        self._profiled = False
        switched = lbfgs_mode or self.switch_epoch is None
        try:
            while epoch < num_epochs and not stop:
                # Two-phase switch (reference: trainer.py:357-361,849-859):
                # adam -> lbfgs (fixed-batch quasi-Newton polish), or
                # adam -> adam (phase2_optimizer="adam": fresh batches at
                # phase2_learning_rate — with residual_dtype=float64 this is
                # the f64 fine-tune that generalizes; see TrainingConfig).
                if (
                    self.switch_epoch is not None
                    and epoch >= self.switch_epoch
                    and not switched
                ):
                    switched = True
                    phase2_lbfgs = t.phase2_optimizer == "lbfgs"
                    logger.info(
                        "Switching optimizer: adam -> %s at epoch %d",
                        t.phase2_optimizer, epoch,
                    )
                    if phase2_lbfgs:
                        optimizer, lbfgs_mode = lbfgs_opt, True
                    else:
                        # Cosine-to-zero over the phase: a CONSTANT phase-2
                        # lr only sets a stochastic equilibrium (measured on
                        # KdV: loss rose from ~2e-6 to 1.3e-5); the decaying
                        # schedule walks the equilibrium down instead.
                        phase_len = max(num_epochs - epoch, 1)
                        optimizer = optax.chain(
                            optax.clip_by_global_norm(t.gradient_clip_norm),
                            optax.adam(
                                optax.cosine_decay_schedule(
                                    t.phase2_learning_rate, phase_len
                                )
                            ),
                        )
                    steps_per_epoch = 1
                    if self._ema_decay > 0.0:
                        # Phase 2 polishes the AVERAGED iterate: the EMA sits
                        # closer to the basin center than the last noisy
                        # adam step.
                        avg = self._ema_read(state["ema"])
                        if avg is not None:
                            state = {
                                **state,
                                "params": {**state["params"], "net": avg},
                            }
                    promoted = self._maybe_promote_f64(state["params"])
                    state = {
                        **state,
                        "params": promoted,
                        "ema": self._ema_init(promoted["net"]),
                        "opt_state": jax.tree_util.tree_map(
                            jnp.array, optimizer.init(promoted)
                        ),
                    }
                    state = self._maybe_commit_f64_state(state)
                    epoch_fn = self._build_epoch_fn(
                        optimizer, lbfgs_bs, 1, phase2_lbfgs,
                        f64=self.tcfg.residual_dtype == "float64",
                    )

                # Multi-round polish: refresh the fixed L-BFGS batch and
                # restart the optimizer every resample_every epochs so a
                # small fixed batch is never overfit (each round is a fresh
                # sample-average approximation of the true objective).
                resample = t.lbfgs.resample_every
                if lbfgs_mode and resample:
                    phase_start = self.switch_epoch or start_epoch
                    done_in_phase = epoch - phase_start
                    if done_in_phase > 0 and done_in_phase % resample == 0:
                        state = {
                            **state,
                            "lbfgs_key": jax.random.fold_in(
                                state["lbfgs_key"], done_in_phase // resample
                            ),
                            "opt_state": jax.tree_util.tree_map(
                                jnp.array, optimizer.init(state["params"])
                            ),
                        }
                        state = self._maybe_commit_f64_state(state)

                # Chunk = one validation interval of epochs fused into a single
                # device call; clipped at the lbfgs switch and the horizon.
                chunk = min(t.validation_frequency, num_epochs - epoch)
                if self.switch_epoch is not None and not switched:
                    chunk = min(chunk, max(self.switch_epoch - epoch, 1))
                if lbfgs_mode and resample:
                    phase_start = self.switch_epoch or start_epoch
                    next_round = (
                        phase_start
                        + ((epoch - phase_start) // resample + 1) * resample
                    )
                    chunk = min(chunk, max(next_round - epoch, 1))

                t0 = time.time()
                if (
                    t.profile_dir
                    and not self._profiled
                    and epoch > start_epoch  # chunk 1 = compile + warmup
                ):
                    # One profiler trace of a steady-state chunk (new
                    # capability beyond the reference; SURVEY §5.1).
                    self._profiled = True
                    with jax.profiler.trace(t.profile_dir):
                        state, metrics = epoch_fn(state, chunk)
                        jax.block_until_ready(metrics)
                    logger.info("Profiler trace written to %s", t.profile_dir)
                else:
                    state, metrics = epoch_fn(state, chunk)
                metrics = jax.device_get(metrics)  # ONE host transfer per chunk
                chunk_time = time.time() - t0

                for i in range(chunk):
                    self.history["train_loss"].append(float(metrics["total"][i]))
                    self.history["epoch_time"].append(chunk_time / chunk)
                    for k in ("residual", "boundary", "initial", "smoothness", "data"):
                        self.history["loss_components"][k].append(float(metrics[k][i]))
                    w = np.asarray(metrics["weights"][i]).tolist()
                    self.history["adaptive_weights"].append((w + [0.0] * 4)[:4])
                    e = epoch + i
                    if lr_sched is not None:
                        lr_now = float(lr_sched((e + 1) * steps_per_epoch))
                    else:
                        lr_now = float(oc_lr * _plateau_scale(state["opt_state"]))
                    self.history["learning_rate"].append(lr_now)
                epoch += chunk
                train_loss = self.history["train_loss"][-1]
                lr_now = self.history["learning_rate"][-1]
                if self.pde.trainable_parameters:
                    coeffs_host = jax.device_get(state["params"]["coeffs"])
                    for name in self.pde.trainable_parameters:
                        # Per-epoch trajectory: pad the chunk with the value at
                        # its end (coeff history is for monitoring cadence).
                        self.history[f"param_{name}"].extend(
                            [float(np.mean(coeffs_host[name]))] * chunk
                        )

                if not np.isfinite(train_loss):
                    logger.warning("Non-finite loss at epoch %d; stopping", epoch)
                    status = "failed"
                    break

                # Validation boundary = chunk boundary.
                self.points_history.append(np.asarray(metrics["pts"][-1]))
                val_key, k = jax.random.split(val_key)
                val_loss = float(val_fn(state["params"], k))
                self.history["val_loss"].append(val_loss)
                logger.info(
                    "epoch %d/%d train=%.4e val=%.4e lr=%.2e (%.3fs/epoch)",
                    epoch, num_epochs, train_loss, val_loss, lr_now, chunk_time / chunk,
                )
                if exp:
                    save_training_metrics(exp, self.history)
                    self._write_metadata(
                        exp, status="running", num_epochs=num_epochs,
                        current_epoch=epoch, coeffs=state["params"]["coeffs"],
                    )
                    save_live_snapshot(
                        exp, self.pde, self.model, state["params"], grid=60
                    )
                    # True mid-run resume — the reference only saves final
                    # weights (SURVEY.md §5.4); checkpoint.msgpack restores
                    # params + optimizer + RL/adaptive state + epoch.
                    self._save_checkpoint(exp / "checkpoint.msgpack", state, epoch)
                # Early stopping (reference: trainer.py:788-801).
                if es.enabled:
                    if val_loss < best_val - es.min_delta:
                        best_val = val_loss
                        patience_count = 0
                    else:
                        patience_count += 1
                        if patience_count >= es.patience:
                            logger.info("Early stopping at epoch %d", epoch)
                            stop = True
        except Exception:
            status = "failed"
            if exp:
                (exp / ".running").unlink(missing_ok=True)
            raise
        finally:
            # Detach the per-experiment log handler (leaking one per train()
            # call grows the module logger unboundedly across runs).
            if self._fh is not None:
                logger.removeHandler(self._fh)
                self._fh.close()
                self._fh = None

        wall = time.time() - start_time
        if self._ema_decay > 0.0 and not lbfgs_mode:
            # The averaged iterate IS the final model when the last phase is
            # stochastic (an L-BFGS polish already started from the EMA).
            avg = self._ema_read(state["ema"])
            if avg is not None:
                state = {**state, "params": {**state["params"], "net": avg}}
        # Keep the public model contract f32 (an f64 polish phase leaves the
        # state in f64; _final_state retains full precision for validation).
        self.model.params = self._demote_f32(state["params"]["net"])
        self.final_coeffs = self.pde.canonicalize_coeffs({
            # np.mean: with an ensemble the coeffs carry a member axis.
            k: float(np.mean(np.asarray(v))) for k, v in state["params"]["coeffs"].items()
        })
        result = {
            "history": self.history,
            "final_train_loss": self.history["train_loss"][-1]
            if self.history["train_loss"]
            else None,
            "best_val_loss": best_val if best_val < float("inf") else None,
            "identified_parameters": self.final_coeffs,
            "true_parameters": self.pde.true_parameters,
            "wall_time_s": wall,
            "status": status,
        }
        if exp:
            if self.config.evaluation.save_plots:
                self._save_final_plots(exp, state)
            save_training_metrics(exp, self.history)
            self._write_metadata(
                exp,
                status=status,
                num_epochs=num_epochs,
                current_epoch=len(self.history["train_loss"]),
                coeffs=state["params"]["coeffs"],
                wall_time_s=wall,
            )
            self.model.save_state(str(exp / "final_model.msgpack"))
            if self.rl_agent is not None:
                self.rl_agent.save_state(str(exp / "rl_agent.msgpack"), state["rl"])
            (exp / ".running").unlink(missing_ok=True)
        self._final_state = state
        return result

    # ------------------------------------------------------------------ #
    # Checkpoint / resume (new capability — reference is save-only,
    # SURVEY.md §5.4)
    # ------------------------------------------------------------------ #

    def _save_checkpoint(self, path: Path, state: Dict, epoch: int) -> None:
        """Device state as msgpack + JSON sidecar for epoch/history (flax
        serialization cannot restore variable-length Python lists)."""
        try:
            from flax import serialization

            path = Path(path)
            path.write_bytes(serialization.to_bytes(state))
            path.with_suffix(".json").write_text(
                json.dumps({"epoch": epoch, "history": self.history}, default=str)
            )
        except Exception:  # checkpointing must not kill training
            logger.exception("checkpoint save failed")

    def _load_checkpoint(self, path: str, template_state: Dict):
        from flax import serialization

        path = Path(path)
        raw = path.read_bytes()
        try:
            state = serialization.from_bytes(template_state, raw)
        except Exception:
            # Tree mismatch — e.g. the checkpoint was written in the L-BFGS
            # phase (different opt_state pytree) and the template is the
            # fresh adam state. Restore subtree-by-subtree and keep the fresh
            # opt_state: when the resume epoch is past the phase switch the
            # training loop re-initializes the optimizer anyway, so only the
            # line-search memory is lost — acceptable for crash recovery.
            restored = serialization.msgpack_restore(raw)
            state = dict(template_state)
            for k, v in template_state.items():
                if k == "opt_state" or k not in restored:
                    continue
                try:
                    state[k] = serialization.from_state_dict(v, restored[k])
                except Exception:
                    logger.warning(
                        "checkpoint: could not restore %r; keeping fresh state", k
                    )
        side = json.loads(path.with_suffix(".json").read_text())
        self.history = side["history"]
        return jax.tree_util.tree_map(jnp.array, state), int(side["epoch"])

    # ------------------------------------------------------------------ #
    # Final plots (reference: trainer.py:974-1693)
    # ------------------------------------------------------------------ #

    def _save_final_plots(self, exp: Path, state: Dict) -> None:
        from pinnrl_tpu.utils.plotting import (
            create_interactive_report,
            plot_collocation_evolution,
            plot_solution,
            plot_training_history,
        )

        viz = exp / "visualizations"
        plot_training_history(self.history, viz / "training_history.png")
        plot_solution(
            self.pde, self.model, state["params"]["net"], viz / "solution.png"
        )
        if getattr(self, "points_history", None):
            plot_collocation_evolution(
                self.points_history, self.pde.domain, self.pde.time_domain,
                viz / "collocation_evolution.png",
            )
        if self.rl_agent is not None and state.get("rl") != ():
            from pinnrl_tpu.utils.plotting import plot_q_density

            plot_q_density(
                self.rl_agent, state["rl"], self.pde.domain, self.pde.time_domain,
                viz / "rl_q_density.png",
            )
        # Heat gets an FDM cross-check (reference: trainer.py:1652-1693).
        if self.pde.pde_type == "heat" and self.pde.dimension == 1:
            try:
                from pinnrl_tpu.numerical_solvers import HeatEquationFDM

                fdm = HeatEquationFDM(self.pde, nx=101)
                cmp = fdm.compare_with_pinn(self.model.apply, state["params"]["net"])
                (exp / "fdm_comparison.json").write_text(json.dumps(cmp, indent=2))
            except Exception:
                logger.exception("FDM comparison failed")
        create_interactive_report(exp)

    # ------------------------------------------------------------------ #
    # Experiment metadata
    # ------------------------------------------------------------------ #

    def _num_model_parameters(self) -> int:
        """Cached parameter count (static across a run; counting walks the
        whole pytree, so doing it on every chunk write is wasted host time)."""
        if not hasattr(self, "_n_params_cache"):
            self._n_params_cache = self.model.count_parameters()
        return self._n_params_cache

    def _write_metadata(
        self,
        exp: Path,
        status: str,
        num_epochs: int,
        current_epoch: int = 0,
        coeffs=None,
        wall_time_s: Optional[float] = None,
    ) -> None:
        """metadata.json contract (reference: trainer.py:489-527, 861-963)."""
        meta_path = exp / "metadata.json"
        meta = {}
        if meta_path.exists():
            try:
                meta = json.loads(meta_path.read_text())
            except Exception:
                meta = {}
        meta.update(
            {
                "status": status,
                "pde_type": self.pde.pde_type,
                "architecture": self.model.architecture_name,
                "mode": self.tcfg.mode,
                "optimizer": self.optimizer_name,
                "rl_enabled": self.rl_agent is not None,
                "sampling_strategy": self.strategy,
                "num_epochs": num_epochs,
                "current_epoch": current_epoch,
                "parameters": {
                    k: (
                        list(v)
                        if isinstance(v, (list, tuple))
                        else v if isinstance(v, (str, bool)) else float(v)
                    )
                    for k, v in self.pde.parameters.items()
                },
                "trainable_parameters": self.pde.trainable_parameters,
                "true_parameters": self.pde.true_parameters,
                "timestamp": datetime.now().isoformat(),
                "num_model_parameters": self._num_model_parameters(),
            }
        )
        if coeffs:
            meta["identified_parameters"] = {
                k: float(np.mean(np.asarray(v))) for k, v in coeffs.items()
            }
        if wall_time_s is not None:
            meta["wall_time_s"] = wall_time_s
        meta_path.write_text(json.dumps(meta, indent=2, default=str))


def _plateau_scale(opt_state) -> float:
    """Extract the reduce_on_plateau scale from a chained optax state."""
    for s in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: hasattr(x, "scale")
    ):
        if hasattr(s, "scale"):
            return float(s.scale)
    return 1.0
