"""Measure the reference (torch-CPU) hot-loop throughput on this host.

Times the reference's actual training step — sample collocation points,
compute_loss (residual via autograd chains + BC/IC), backward, Adam step —
for a Burgers PINN with the reference's benchmark model (Fourier-features
MLP 64x3 / mapping 32, reference: pinnrl/benchmarks/sampling.py:105-119) at
batch 2048, and writes bench_baseline.json at the repo root.

Run from the repo root:  python scripts/measure_torch_baseline.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402


def build_burgers(device):
    from pinnrl.pdes.burgers_equation import BurgersEquation
    from pinnrl.pdes.pde_base import PDEConfig

    cfg = PDEConfig(
        name="Burgers Equation",
        domain=[[-1.0, 1.0]],
        time_domain=[0.0, 1.0],
        parameters={"nu": 0.01},
        boundary_conditions={"dirichlet": {"type": "fixed", "value": 0.0}},
        initial_condition={"type": "sine", "amplitude": -1.0, "frequency": 1.0},
        exact_solution={
            "type": "cole_hopf",
            "viscosity": 0.01,
            "initial_amplitude": -1.0,
            "initial_frequency": 1.0,
        },
        dimension=1,
        device=device,
    )
    return BurgersEquation(config=cfg)


def main() -> None:
    from pinnrl.benchmarks.sampling import _build_model

    device = torch.device("cpu")
    torch.manual_seed(0)
    pde = build_burgers(device)
    model = _build_model(device)
    opt = torch.optim.Adam(model.parameters(), lr=2e-3)

    batch = 2048
    warmup, steps = 3, 20
    for i in range(warmup + steps):
        if i == warmup:
            t0 = time.perf_counter()
        x, t = pde.generate_collocation_points(batch, strategy="uniform")
        losses = pde.compute_loss(model, x, t)
        opt.zero_grad()
        losses["total"].backward()
        opt.step()
    wall = time.perf_counter() - t0
    pts_per_sec = steps * batch / wall

    out = {
        "metric": "collocation_pts_per_sec",
        "pde": "burgers",
        "model": "fourier-64x3-map32",
        "batch": batch,
        "steps": steps,
        "wall_s": round(wall, 3),
        "torch_cpu_pts_per_sec": round(pts_per_sec, 1),
    }
    Path(__file__).resolve().parent.parent.joinpath("bench_baseline.json").write_text(
        json.dumps(out, indent=2)
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
