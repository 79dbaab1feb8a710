"""Buffer-donation consistency gate (advisor round-3 low finding).

The trainer re-enabled ``donate_argnums`` on the chunked epoch jit after the
round-2 miscompile cleared (scripts/test_buffer_donation.py), but that repro
lived outside CI — a backend regression would again silently corrupt params.
This wires the identical pattern into the suite (slow/nightly tier; runnable
under JAX_PLATFORMS=cpu) so CI catches any regression.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

_spec = importlib.util.spec_from_file_location(
    "_donation_repro",
    Path(__file__).resolve().parent.parent / "scripts" / "test_buffer_donation.py",
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
build, run = _mod.build, _mod.run


def test_donated_scan_matches_plain_scan():
    chunk, fixed_loss, init = build()

    plain = jax.jit(chunk)
    donated = jax.jit(chunk, donate_argnums=0)

    carry_a, traj_a = run(plain, init, n_chunks=2)
    init_b = build()[2]  # fresh buffers — the donated run consumes its input
    carry_b, traj_b = run(donated, init_b, n_chunks=2)

    traj_diff = np.abs(traj_a - traj_b).max() / max(np.abs(traj_a).max(), 1e-9)
    param_diff = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(carry_a[0]),
            jax.tree_util.tree_leaves(carry_b[0]),
        )
    )
    la, lb = float(fixed_loss(carry_a[0])), float(fixed_loss(carry_b[0]))

    assert traj_diff < 1e-4, f"loss trajectories diverged under donation: {traj_diff:.2e}"
    assert param_diff < 1e-3, f"final params diverged under donation: {param_diff:.2e}"
    assert abs(la - lb) / max(la, 1e-9) < 1e-3, (
        f"donated carry not self-consistent: probe loss {la} vs {lb}"
    )
