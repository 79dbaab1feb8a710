"""Minimal repro for the buffer-donation miscompile (VERDICT round-2 item 6).

Round-2 finding (trainer.py:438-441): with ``donate_argnums`` on the chunked
epoch jit, the axon TPU backend returned a final scan carry inconsistent
with the metrics computed inside the scan (params silently diverged), so
donation was dropped at the cost of one extra state copy per chunk.

This script re-tests the exact pattern on the current backend: a jitted
scan-over-train-steps, identical seeds, run (a) without donation and
(b) with ``donate_argnums=0``; PASS iff the final params and the loss
trajectories agree to f32 round-off AND the donated run's carry is
self-consistent (loss recomputed from the returned params matches the last
in-scan loss).

    python scripts/test_buffer_donation.py            # on the TPU
    JAX_PLATFORMS=cpu python scripts/test_buffer_donation.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pinnrl_tpu.config import load_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde


def build():
    cfg = load_config(pde_type="burgers", architecture="fourier")
    cfg.model.hidden_dims = [64, 64, 64]
    cfg.model.arch_params["mapping_size"] = 32
    pde = create_pde(cfg)
    model = PINNModel(cfg, seed=0)
    pde.attach_fast_bundle(model)
    opt = optax.adam(2e-3)

    def one_step(carry, _):
        params, opt_state, key = carry
        key, ks, kl = jax.random.split(key, 3)
        x, t = pde.generate_collocation_points(ks, 2048)
        loss, grads = jax.value_and_grad(
            lambda p: pde.compute_loss(model.apply, p, x, t, key=kl)["total"]
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state, key), loss

    def chunk(carry):
        return jax.lax.scan(one_step, carry, None, length=50)

    def fixed_loss(params):
        # Deterministic probe loss on a fixed batch (consistency check).
        x, t = pde.generate_collocation_points(jax.random.PRNGKey(123), 2048)
        return pde.compute_loss(
            model.apply, params, x, t, key=jax.random.PRNGKey(321)
        )["total"]

    init = (model.params, opt.init(model.params), jax.random.PRNGKey(0))
    return chunk, jax.jit(fixed_loss), init


def run(chunk_jit, init, n_chunks=4):
    carry, traj = init, []
    for _ in range(n_chunks):
        carry, losses = chunk_jit(carry)
        traj.append(np.asarray(losses))
    jax.block_until_ready(carry[0])
    return carry, np.concatenate(traj)


def main() -> int:
    chunk, fixed_loss, init = build()

    plain = jax.jit(chunk)
    donated = jax.jit(chunk, donate_argnums=0)

    carry_a, traj_a = run(plain, init)
    # Rebuild fresh init (the donated run consumes its buffers).
    _, _, init_b = None, None, build()[2]
    carry_b, traj_b = run(donated, init_b)

    traj_diff = np.abs(traj_a - traj_b).max() / max(np.abs(traj_a).max(), 1e-9)
    leaves_a = jax.tree_util.tree_leaves(carry_a[0])
    leaves_b = jax.tree_util.tree_leaves(carry_b[0])
    param_diff = max(
        float(jnp.abs(a - b).max()) for a, b in zip(leaves_a, leaves_b)
    )
    # Self-consistency: the returned params must reproduce a sensible loss.
    la = float(fixed_loss(carry_a[0]))
    lb = float(fixed_loss(carry_b[0]))

    print(f"backend              : {jax.default_backend()}")
    print(f"loss-traj rel diff   : {traj_diff:.2e}")
    print(f"final-param max diff : {param_diff:.2e}")
    print(f"probe loss plain     : {la:.6f}")
    print(f"probe loss donated   : {lb:.6f}")
    ok = traj_diff < 1e-4 and param_diff < 1e-3 and abs(la - lb) / max(la, 1e-9) < 1e-3
    print("DONATION " + ("OK — safe to re-enable" if ok else "STILL BROKEN"))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
