"""Weak-scaling artifact for the data-parallel mesh (VERDICT round-2 item 6).

For n in {1, 2, 4, 8} virtual CPU devices: train the same tiny workload with
the batch scaled as n * per_device_batch (weak scaling), record
  - the final training loss (sharded must match the unsharded n=1 run when
    the GLOBAL workload is fixed — checked separately with fixed batch),
  - mean post-compile step walltime.

All runs share one host CPU, so walltime parity (not speedup) is the
expected outcome — the artifact demonstrates the sharding is correct and
the per-step overhead of the mesh path is nil; real speedup needs real
chips over ICI (the driver's dryrun_multichip compiles the same program).

Writes benchmark_results/weak_scaling.csv. Each n runs in a subprocess
because the virtual device count must be fixed before jax initializes.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, os, time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import optax

from pinnrl_tpu.config import load_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.parallel import make_mesh, shard_batch
from pinnrl_tpu.pdes import create_pde

n = int(os.environ["WS_N"])
mode = os.environ["WS_MODE"]     # "weak" scales batch with n; "fixed" keeps it
per_device_batch = int(os.environ["WS_PDB"])
steps = int(os.environ["WS_STEPS"])

mesh = make_mesh(n)
batch = per_device_batch * (n if mode == "weak" else 1)

cfg = load_config(pde_type="burgers", architecture="fourier")
cfg.model.hidden_dims = [64, 64, 64]
cfg.model.arch_params["mapping_size"] = 32
pde = create_pde(cfg)
pde.attach_fast_bundle(PINNModel(cfg, seed=0))
model = PINNModel(cfg, seed=0)
opt = optax.adam(2e-3)

def one_step(carry, _):
    params, opt_state, key = carry
    key, ks, kl = jax.random.split(key, 3)
    x, t = pde.generate_collocation_points(ks, batch)
    x, t = shard_batch(mesh, x, t)
    loss, grads = jax.value_and_grad(
        lambda p: pde.compute_loss(model.apply, p, x, t, key=kl)["total"]
    )(params)
    updates, opt_state = opt.update(grads, opt_state)
    return (optax.apply_updates(params, updates), opt_state, key), loss

@jax.jit
def chunk(carry):
    return jax.lax.scan(one_step, carry, None, length=10)

carry = (model.params, opt.init(model.params), jax.random.PRNGKey(0))
carry, losses = chunk(carry)   # compile + warmup
jax.block_until_ready(losses)
t0 = time.perf_counter()
for _ in range(steps // 10):
    carry, losses = chunk(carry)
jax.block_until_ready(losses)
wall = time.perf_counter() - t0
print("RESULT " + json.dumps({
    "n_devices": n, "mode": mode, "batch": batch,
    "final_loss": float(losses[-1]),
    "step_ms": wall / steps * 1e3,
    "pts_per_sec": steps * batch / wall,
}))
"""


def run_child(n: int, mode: str, per_device_batch: int, steps: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={n}"
    ).strip()
    env.update(WS_N=str(n), WS_MODE=mode, WS_PDB=str(per_device_batch),
               WS_STEPS=str(steps))
    code = _CHILD
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=ROOT, env=env,
        capture_output=True, text=True, timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child n={n} failed:\n{proc.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--csv", default=str(ROOT / "benchmark_results" / "weak_scaling.csv"))
    args = ap.parse_args()

    rows = []
    for mode in ("fixed", "weak"):
        for n in (1, 2, 4, 8):
            r = run_child(n, mode, args.per_device_batch, args.steps)
            rows.append(r)
            print(r, flush=True)

    # Correctness: fixed-workload loss must match across mesh sizes.
    fixed = [r for r in rows if r["mode"] == "fixed"]
    base = fixed[0]["final_loss"]
    for r in fixed[1:]:
        rel = abs(r["final_loss"] - base) / max(abs(base), 1e-12)
        assert rel < 5e-3, f"n={r['n_devices']} loss mismatch {rel:.2e}"
    print(f"fixed-workload loss match across n=1..8: max rel diff "
          f"{max(abs(r['final_loss']-base)/abs(base) for r in fixed[1:]):.2e}")

    with open(args.csv, "w") as f:
        f.write("mode,n_devices,batch,final_loss,step_ms,pts_per_sec\n")
        for r in rows:
            f.write(
                f"{r['mode']},{r['n_devices']},{r['batch']},"
                f"{r['final_loss']:.6e},{r['step_ms']:.3f},{r['pts_per_sec']:.1f}\n"
            )
    print(f"wrote {args.csv}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
