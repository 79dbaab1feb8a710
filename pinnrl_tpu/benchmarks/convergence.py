"""Convergence benchmark: rel-L2 vs exact solution for tuned per-PDE recipes.

The reference's roadmap lists "Reproducible benchmark artifacts" as TODO
(reference: docs/roadmap.md:96-105); this harness delivers them. Each PDE
gets a tuned recipe (architecture + points + optimizer schedule) known to
reach the north-star accuracy budget on one TPU chip; the harness trains it
and reports rel-L2 / max error / wall time / pts-per-sec as a CSV row.

Run:  python -m pinnrl_tpu.benchmarks.cli convergence --pde heat
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from pinnrl_tpu.config import load_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.training import PDETrainer


@dataclass
class ConvergenceResult:
    pde: str
    architecture: str
    epochs: int
    rel_l2: float
    max_error: float
    final_train_loss: float
    wall_time_s: float
    points_per_sec: float
    seed: int


# Tuned recipes: (arch, model overrides, training overrides).
RECIPES: Dict[str, dict] = {
    "heat": dict(
        arch="fourier",
        # Wave-8/9 scale sweep (ep3000): seed0 @2.0 1.47e-3 (ABOVE the 1e-3
        # bar) | @1.0 2.83e-4 | @0.75 2.49e-4; seeds 1/2 @0.75 2.94e-4 /
        # 2.17e-4 — the sin(pi x) decay mode wants a low-frequency basis,
        # same direction as the wave (0.35), heat_2d (0.5), kdv (0.75) sweeps.
        model=dict(hidden_dims=[256, 256, 256], mapping_size=128, scale=0.75),
        training=dict(
            num_epochs=3000, num_collocation_points=40000, batch_size=8192,
            num_boundary_points=4096, num_initial_points=4096,
            optimizer="adam_lbfgs", adam_lbfgs_switch_ratio=0.4,
            learning_rate=2e-3, weight_decay=0.0,
        ),
    ),
    "kdv": dict(
        arch="fourier",
        # feature_seed pins the random-Fourier basis (an architecture
        # hyperparameter): the basis lottery alone swings rel-L2 3.7e-3 <->
        # 2.8e-2 across seeds; basis 0 won a 6-candidate 500-epoch search.
        # Multi-seed runs then vary only trainable init + batch draws.
        model=dict(hidden_dims=[256, 256, 256], mapping_size=256, scale=0.75,
                   feature_seed=0),
        # Shipping recipe (wave-15): annealed adam-1500 at Fourier scale
        # 0.75, mapping 256, 100k collocation points, causal weighting
        # eps=1.0 — rel-L2 2.4e-4 / 5.4e-4 / 6.0e-4 (seeds 0/1/2), the only
        # probed config with every seed under the 1e-3 bar. The three
        # stacked levers attack different error sources and none suffices
        # alone (probe_matrix.csv, @ep1500 scale 0.75 unless noted):
        #   capacity (map 256):  s0 1.24e-3 | s1 6.2e-4 | s2 8.0e-4
        #   density  (100k pts): s1 8.9e-4
        #   causality (eps=1):   s1 1.16e-3 | s2 8.2e-4
        #   map 128 baseline:    s0 7.4e-4  | s1 1.42e-3 | s2 1.54e-3
        # (map 384 regresses: s1 1.38e-3 — 256 is the sweet spot.)
        # Earlier waves: scale sweep @map128: 0.6 1.9e-3 | 0.75 7.4e-4 |
        # 1.0 1.7e-3 | 2.0 (round-1) 3.7e-3 — the soliton+radiation field
        # wants a low-frequency basis, mirroring wave (0.35)/heat_2d (0.5)/
        # heat (0.75). Ruled out: adam-3000 @map128 (overfits f32 jet
        # noise) | adam_lbfgs 1.8-2.1e-3 | bc=exact | gpinn | f64 polish
        # (residual RMS identical in f32/f64) | EMA | time-marching 4x1000
        # (inherited-IC error compounds) | co-moving frame | hard-IC
        # transform | stage-2 correction nets (polish <=8%) | FO-PINN
        # first-order system 9.9e-3 | restart ensembles + oracle-free
        # selection (probe_kdv_selection.csv: picks the best member in only
        # 1 of 2 ensembles) | basis re-draws (feature_seed 1-5: seed-
        # dependent lottery, no basis dominates).
        training=dict(
            num_epochs=1500, num_collocation_points=100000, batch_size=8192,
            optimizer="adam", causal_eps=1.0,
            num_boundary_points=4096, num_initial_points=4096,
            learning_rate=2e-3, weight_decay=0.0,
        ),
    ),
    "wave": dict(
        arch="fourier",
        # Round-2 scale sweep (800-epoch probes, seed 0): 2.0 (old): 3.4e-3
        # @3000ep | 1.0: 3.5e-3 | 0.5: 1.14e-3 | 0.35: 1.00e-3 | 0.25:
        # 1.09e-3 — the sin(2*pi*(x - c t)) mode wants a low-frequency
        # basis. moving_frame_speed=1.0 diverges here (rel-L2 1.0 at scale
        # 2.0): the frame shears the normalized domain so BC/IC targets sit
        # outside the basis' well-covered range.
        model=dict(hidden_dims=[256, 256, 256], mapping_size=128, scale=0.35),
        training=dict(
            num_epochs=3000, num_collocation_points=40000, batch_size=8192,
            num_boundary_points=4096, num_initial_points=4096,
            optimizer="adam_lbfgs", adam_lbfgs_switch_ratio=0.5,
            learning_rate=1e-3, weight_decay=0.0,
            loss_weights={"residual": 1.0, "boundary": 100.0, "initial": 100.0,
                          "smoothness": 0.0, "data": 10.0},
        ),
    ),
    "burgers": dict(
        # Genuine viscous-shock traveling wave (the reference's Cole-Hopf
        # variant has tan-poles inside the domain and its "tanh" variant is
        # not an exact solution — burgers.py documents both). The moving
        # front is steep (width 4*nu/a = 0.08), the regime RAR/DQN sampling
        # exists for.
        arch="fourier",
        model=dict(hidden_dims=[256, 256, 256], mapping_size=128, scale=2.0),
        pde=dict(
            parameters={"nu": 0.01},
            exact_solution={"type": "traveling_wave", "amplitude": 0.5,
                            "speed": 0.5, "center": -0.25},
            initial_condition={"type": "traveling_wave"},
        ),
        training=dict(
            num_epochs=3000, num_collocation_points=40000, batch_size=8192,
            num_boundary_points=4096, num_initial_points=4096,
            optimizer="adam_lbfgs", adam_lbfgs_switch_ratio=0.5,
            learning_rate=2e-3, weight_decay=0.0,
            collocation_distribution="residual_based",
        ),
    ),
    "heat_2d": dict(
        arch="fourier",
        # Round-2 sweep (1000-epoch probes, seed 0): the 1D default scale=2.0
        # is far too high-frequency for the single smooth 2D sine mode —
        # scale 2.0: 1.0e-1 | 1.0: 3.3e-3 | 0.75: 2.4e-3 | 0.5: 1.9e-3 |
        # 0.35: 1.9e-3 (plateau; ship mid-plateau 0.5). Boosting BC/IC
        # weights to 100 HURTS at every scale (e.g. 8.3e-3 at scale 1.0)
        # vs the config defaults res=15/bc=20/ic=10.
        model=dict(hidden_dims=[256, 256, 256], mapping_size=128, scale=0.5),
        training=dict(
            num_epochs=3000, num_collocation_points=40000, batch_size=8192,
            num_boundary_points=8192, num_initial_points=8192,
            optimizer="adam_lbfgs", adam_lbfgs_switch_ratio=0.5,
            learning_rate=2e-3, weight_decay=0.0,
        ),
    ),
    "convection": dict(
        # Linear advection of sin(2 pi (x - t)) (exact in f64, residual 0).
        # IC frequency 2.0 so the IC matches the exact solution at t=0 (the
        # reference's default frequency-1 IC contradicts its own exact
        # solution); exact-aware Dirichlet BCs because the inflow boundary
        # value -sin(2 pi t) is nonzero.
        arch="fourier",
        model=dict(hidden_dims=[256, 256, 256], mapping_size=128, scale=1.0),
        pde=dict(
            initial_condition={"type": "sin", "amplitude": 1.0, "frequency": 2.0},
            boundary_conditions={"dirichlet": {"type": "exact"}},
        ),
        training=dict(
            num_epochs=1500, num_collocation_points=40000, batch_size=8192,
            num_boundary_points=4096, num_initial_points=4096,
            optimizer="adam_lbfgs", adam_lbfgs_switch_ratio=0.5,
            learning_rate=2e-3, weight_decay=0.0,
        ),
    ),
    "allen_cahn": dict(
        # Genuine stationary interface tanh(x / (sqrt(2) eps)) — the
        # reference's tanh(x / 2eps) leaves an O(0.1) residual (see
        # pdes/allen_cahn.py docstring; measured in f64).
        arch="fourier",
        model=dict(hidden_dims=[256, 256, 256], mapping_size=128, scale=2.0),
        pde=dict(
            exact_solution={"type": "stationary_interface"},
            initial_condition={"type": "stationary_interface"},
            boundary_conditions={"dirichlet": {"type": "exact"}},
        ),
        training=dict(
            num_epochs=1500, num_collocation_points=40000, batch_size=8192,
            num_boundary_points=4096, num_initial_points=4096,
            optimizer="adam_lbfgs", adam_lbfgs_switch_ratio=0.5,
            learning_rate=2e-3, weight_decay=0.0,
        ),
    ),
    "black_scholes": dict(
        # Self-consistent time-to-maturity convention + textbook CDF closed
        # form (residual 7e-15 in f64; the reference's calendar-time
        # residual with a payoff IC at t=0 is contradictory, and its erf
        # "closed form" is not the Black-Scholes price — see
        # pdes/black_scholes.py docstrings).
        arch="fourier",
        model=dict(hidden_dims=[256, 256, 256], mapping_size=128, scale=1.0),
        pde=dict(
            parameters={"sigma": 0.2, "r": 0.05, "time_convention": "to_maturity"},
            exact_solution={"type": "black_scholes", "strike": 100.0,
                            "option_type": "call", "cdf": True},
            boundary_conditions={"dirichlet": {"type": "exact"}},
        ),
        training=dict(
            num_epochs=1500, num_collocation_points=40000, batch_size=8192,
            num_boundary_points=4096, num_initial_points=4096,
            optimizer="adam_lbfgs", adam_lbfgs_switch_ratio=0.5,
            learning_rate=2e-3, weight_decay=0.0,
        ),
    ),
    "pendulum": dict(
        # Linearized restoring force so theta0 cos(omega t) is exact
        # (parameters.linearized; the nonlinear residual leaves rms 0.12 at
        # theta0=0.5). omega = sqrt(9.81) ~ 3.13 rad/s -> ~5 periods over
        # t in [0, 10]; solution constant along the dummy spatial axis.
        # Anisotropic basis scale=(0, 1): zero x-frequencies make the net
        # exactly x-independent — the isotropic basis leaked spurious
        # x-dependence at the domain edges and floored rel-L2 at 1.8e-3;
        # with it, 9.8e-5 at half the epochs.
        arch="fourier",
        model=dict(
            hidden_dims=[256, 256, 256], mapping_size=128, scale=(0.0, 1.0)
        ),
        pde=dict(
            parameters={"g": 9.81, "L": 1.0, "linearized": True},
            boundary_conditions={"dirichlet": {"type": "exact"}},
        ),
        training=dict(
            num_epochs=1500, num_collocation_points=40000, batch_size=8192,
            num_boundary_points=4096, num_initial_points=4096,
            optimizer="adam_lbfgs", adam_lbfgs_switch_ratio=0.5,
            learning_rate=2e-3, weight_decay=0.0,
        ),
    ),
    "allen_cahn_dynamics": dict(
        # VERDICT round-2 item 2: a TIME-DEPENDENT phase-field north star
        # (the stationary-interface targets have u_t == 0). Target = ETDRK4
        # spectral trajectory of domain formation + interface relaxation:
        # large-amplitude modes (0.6/0.3) sharpen into +-1 domains and the
        # interfaces settle — 47% relative field change over the window,
        # still 5% moving in the second half. (Small-perturbation spinodal
        # growth was probed first and is fundamentally ill-conditioned for
        # ANY solver working from the IC: the linear instability amplifies
        # IC error by e^{lambda T} ~ 400x, so rel-L2 1e-3 at the end would
        # need ~2e-6 IC accuracy. Probes confirmed: rel-L2 ~0.97, with or
        # without causal weighting.) Reference accuracy ~8e-6 by dt
        # refinement (numerical_solvers/spectral.py).
        pde_type="allen_cahn",
        arch="fourier",
        model=dict(hidden_dims=[256, 256, 256], mapping_size=128, scale=1.0),
        pde=dict(
            parameters={"epsilon": 0.5},
            domain=[[0.0, 6.283185307179586]],
            time_domain=[0.0, 4.0],
            exact_solution={"type": "spectral", "ic_modes": [[1, 0.6], [2, 0.3]],
                            "nx": 128, "dt": 2e-3},
            initial_condition={"type": "spectral"},
            boundary_conditions={"periodic": {}},
        ),
        training=dict(
            num_epochs=3000, num_collocation_points=40000, batch_size=8192,
            num_boundary_points=4096, num_initial_points=4096,
            optimizer="adam_lbfgs", adam_lbfgs_switch_ratio=0.5,
            learning_rate=2e-3, weight_decay=0.0,
        ),
    ),
    "cahn_hilliard_dynamics": dict(
        # Time-dependent 4TH-ORDER phase-field dynamics: Cahn-Hilliard
        # domain formation + interface relaxation against the ETDRK4
        # spectral reference (refinement error ~1.3e-4). Large-amplitude IC
        # for the same reason as allen_cahn_dynamics (see there): the
        # small-perturbation spinodal branch amplifies IC error by
        # e^{lambda T} with lambda = k^2(1 - eps^2 k^2) ~ 7.7 at the
        # fastest-growing mode — ill-conditioned for any solver. This
        # target changes 58% over the window (5% in the second half).
        # Mixed (u, mu) formulation like the stationary headline recipe —
        # the dynamics make u_t = lap(mu) load-bearing at every interior
        # point. eps=0.5, NOT smaller: CH's linear growth rate is
        # lambda* = 1/(4 eps^2), and forward-error analysis says a trained
        # residual of rms r produces end-window error ~ (r/lambda) e^{lambda T}
        # — at eps=0.3 (lambda 2.8, T=4) that's e^11 amplification and the
        # probes confirmed rel-L2 ~0.8 at train loss 1.5e-4; eps=0.5 brings
        # lambda* to 1.0, the same conditioning as the AC recipe that
        # converges. 52% field change over the window, 5% in the second half.
        #
        # Round-4 recipe (VERDICT r3 next-step 1): the round-3 probes
        # identified MASS-CONSERVATION VIOLATION as the drift mode — CH
        # conserves the spatial mean exactly (u_t = lap(mu) integrates to
        # zero over the periodic cell), and a trained residual of rms r
        # lets the mean random-walk, which the double-well then amplifies
        # into domain misplacement. Pinning the mean (loss_weights.mass,
        # pdes/cahn_hilliard.py) + causal weighting took rel-L2
        # 0.79 -> 2.3e-2 @ep1500 -> 4.7e-3 @ep4000 (probe_matrix.csv
        # `w_mass=100|causal_eps=1.0` rows); the long schedule buys the
        # rest (the k^2-amplified mixed-form landscape descends slowly but
        # steadily, same shape as the biharmonic recipe's 96k steps).
        pde_type="cahn_hilliard",
        arch="fourier",
        model=dict(hidden_dims=[256, 256, 256], mapping_size=128, scale=1.0,
                   output_dim=2),
        pde=dict(
            parameters={"epsilon": 0.5, "formulation": "mixed"},
            domain=[[0.0, 6.283185307179586]],
            time_domain=[0.0, 4.0],
            dimension=1,
            exact_solution={"type": "spectral", "ic_modes": [[1, 0.6], [2, 0.3]],
                            "nx": 256, "dt": 1e-3},
            initial_condition={"type": "spectral"},
            boundary_conditions={"periodic": {}},
        ),
        # Round-5 lever (the error-channel-aware term the round-4
        # obstruction analysis called for): loss_weights.mu_h2 penalizes
        # mean-square LAPLACIAN of the compatibility residual measured
        # SPECTRALLY (pdes/cahn_hilliard.py:_mu_h2_penalty) — the
        # k²-amplified μ-channel noise the plain L2 residual cannot see.
        # Probes at ep1500 seed 0 (probe_matrix.csv): baseline 2.3e-2,
        # w_mu_h2=0.1 -> 3.4e-3 (6.7x), w_mu_h2=1.0 -> 1.4e-2 (too stiff).
        # Round-5 bench-worker note: the CH L-BFGS phase intermittently
        # kernel-faults the degraded axon worker (officials banked exactly
        # 4000 adam epochs then died at the switch several times; the
        # early-switch diagnostic crashed once then PASSED on retry —
        # r5 queue logs). The lbfgs polish is load-bearing (the same
        # diagnostic with phase2=adam scored 0.85 vs lbfgs's 6.4e-3), so
        # the recipe keeps lbfgs and the suite rides crashes with
        # checkpoint resume + extra retries.
        training=dict(
            num_epochs=8000, num_collocation_points=40000, batch_size=8192,
            num_boundary_points=4096, num_initial_points=4096,
            optimizer="adam_lbfgs", adam_lbfgs_switch_ratio=0.5,
            learning_rate=2e-3, weight_decay=0.0,
            loss_weights={"mass": 100.0, "mu_h2": 0.1},
            causal_eps=1.0,
        ),
    ),
    "cahn_hilliard_biharmonic": dict(
        # The DIRECT 4th-order residual path demonstrated CONVERGING
        # (VERDICT round-2 weak spot 3: it stalled at rel-L2 ~0.8).
        # Target = the genuine 1D standing interface tanh(x/(sqrt(2) eps));
        # residual = u_t - lap(u^3 - u - eps^2 lap(u)) evaluated via nested
        # 4th-order jets — no mixed (u, mu) splitting. The three levers that
        # unlock it (measured round 3, single seed trajectory 0.8 -> 0.63 ->
        # 0.199 -> 3.1e-2 -> 1.1e-2 -> 1.27e-4):
        #   1. t-free anisotropic basis scale=(1, 0): the target is
        #      stationary, so zero temporal frequencies remove the entire
        #      spurious-dynamics search direction;
        #   2. a LONG cosine horizon (96k steps — the k^4-amplified
        #      residual landscape descends slowly but steadily; 24k steps
        #      only reaches 3.1e-2);
        #   3. multi-round L-BFGS polish on fresh 16k batches
        #      (1.1e-2 -> 1.27e-4 final).
        pde_type="cahn_hilliard",
        arch="fourier",
        model=dict(hidden_dims=[128, 128, 128], mapping_size=64,
                   scale=(1.0, 0.0)),
        pde=dict(
            dimension=1,
            parameters={"epsilon": 0.18, "formulation": "direct"},
            domain=[[-1.0, 1.0]],
            time_domain=[0.0, 1.0],
            exact_solution={"type": "stationary_interface"},
            initial_condition={"type": "stationary_interface"},
            boundary_conditions={"dirichlet": {"type": "exact"}},
        ),
        training=dict(
            num_epochs=97500, num_collocation_points=4096, batch_size=4096,
            num_boundary_points=512, num_initial_points=512,
            optimizer="adam_lbfgs", adam_lbfgs_switch_ratio=0.9846,
            lbfgs_batch_size=16384, lbfgs_resample_every=500,
            learning_rate=2e-3, weight_decay=0.0,
        ),
    ),
    "pendulum_nonlinear": dict(
        # VERDICT round-2 item 3: benchmark the DEFAULT nonlinear residual
        # theta_tt + (g/L) sin(theta) = 0 (no `linearized` shortcut) against
        # the exact Jacobi-elliptic solution theta = 2 arcsin(k cd(omega t))
        # at amplitude 0.5 rad (ops/special.py, validated to 2e-11 against
        # scipy ellipj + an rtol=1e-11 ODE integration). Same anisotropic
        # (0, 1)-scale basis as the linearized recipe — the solution is
        # x-independent.
        pde_type="pendulum",
        arch="fourier",
        # feature_seed pinned like the KdV recipe: the nonlinear landscape
        # is basis-lottery-sensitive — seed 2's random basis diverged
        # outright (rel-L2 10.3, train loss 340, adam or adam_lbfgs alike)
        # while the same seed with basis 0 lands 1.4e-4.
        model=dict(
            hidden_dims=[256, 256, 256], mapping_size=128, scale=(0.0, 1.0),
            feature_seed=0,
        ),
        pde=dict(
            parameters={"g": 9.81, "L": 1.0},
            exact_solution={"type": "elliptic", "initial_angle": 0.5},
            initial_condition={"type": "small_angle", "initial_angle": 0.5},
            boundary_conditions={"dirichlet": {"type": "exact"}},
        ),
        training=dict(
            num_epochs=1500, num_collocation_points=40000, batch_size=8192,
            num_boundary_points=4096, num_initial_points=4096,
            optimizer="adam_lbfgs", adam_lbfgs_switch_ratio=0.5,
            learning_rate=2e-3, weight_decay=0.0,
        ),
    ),
    "cahn_hilliard": dict(
        # BASELINE.json headline config #4: "Cahn-Hilliard 2D phase field,
        # self-attention PINN (4th-order residual AD)". Target = the genuine
        # standing interface u = tanh(x/(sqrt(2) eps)) (exact in 2D, see
        # pdes/cahn_hilliard.py) — the only closed-form CH solution; the
        # reference's tanh(x/(2 eps)) "exact" has O(1) residual and its CH
        # coverage is tests-only (reference: tests/unit_tests/test_pde_base.py).
        # Shipping formulation = the mixed (u, mu) splitting
        # (pdes/cahn_hilliard.py:residual_pointwise_system): a 2-channel
        # head tied by mu = u^3 - u - eps^2 lap(u), so both residuals need
        # only SECOND-order jets. The direct 4th-order path stalls at
        # rel-L2 ~0.8 under the same budget (probe_matrix.csv
        # cahn_hilliard|ep100|s0); the mixed form reaches 9.1e-4 in 300
        # epochs (…|ep300|s0|formulation=mixed). Same trade as the standard
        # mixed FEM splitting of CH and FO-PINNs (arXiv:2210.14320).
        arch="attention",
        model=dict(hidden_dims=[128, 128, 128, 128], output_dim=2),
        pde=dict(
            dimension=2,
            domain=[[-0.5, 0.5], [-0.5, 0.5]],
            time_domain=[0.0, 1.0],
            parameters={"formulation": "mixed"},
            exact_solution={"type": "stationary_interface"},
            initial_condition={"type": "stationary_interface"},
        ),
        training=dict(
            num_epochs=2000, num_collocation_points=20000, batch_size=4096,
            num_boundary_points=4096, num_initial_points=4096,
            learning_rate=1e-3, weight_decay=0.0,
        ),
    ),
}


def build_recipe_config(pde_key: str, epochs: Optional[int] = None):
    """Materialize a RECIPES entry into a Config (shared by the plain and
    time-marching harnesses)."""
    recipe = RECIPES[pde_key]
    # A recipe key may be a named variant of a base PDE (e.g.
    # "pendulum_nonlinear" benchmarks the same PendulumEquation under its
    # true nonlinear residual); `pde_type` points at the config block.
    cfg = load_config(
        pde_type=recipe.get("pde_type", pde_key), architecture=recipe["arch"]
    )
    for k, v in (recipe.get("pde") or {}).items():
        if k == "parameters":
            cfg.pde.parameters.update(v)
        else:
            setattr(cfg.pde, k, v)
    # A recipe may re-dimension the problem (e.g. the 2D Cahn-Hilliard
    # headline over a 1D config block): keep input_dim = dimension + 1.
    cfg.model.input_dim = cfg.pde.dimension + 1
    m = recipe["model"]
    cfg.model.hidden_dims = list(m.get("hidden_dims", cfg.model.hidden_dims))
    if "hard_ic" in m:
        cfg.model.hard_ic = bool(m["hard_ic"])
    if "output_dim" in m:
        # Multi-channel heads (e.g. Cahn-Hilliard's mixed (u, mu) system)
        # must be visible to both the network and the PDE's residual/metric.
        cfg.model.output_dim = int(m["output_dim"])
        cfg.pde.output_dim = int(m["output_dim"])
    for k in (
        "mapping_size", "scale", "omega_0", "hidden_dim", "num_blocks",
        "modified", "periodic", "feature_seed", "moving_frame_speed",
        "trainable_features",
    ):
        if k in m:
            cfg.model.arch_params[k] = m[k]
    t = cfg.training
    tr_over = dict(recipe["training"])
    t.optimizer_config.learning_rate = tr_over.pop("learning_rate", 2e-3)
    t.optimizer_config.weight_decay = tr_over.pop("weight_decay", 0.0)
    if "loss_weights" in tr_over:
        t.loss_weights.update(tr_over.pop("loss_weights"))
    if "lbfgs_batch_size" in tr_over:
        t.lbfgs.batch_size = tr_over.pop("lbfgs_batch_size")
    if "lbfgs_resample_every" in tr_over:
        t.lbfgs.resample_every = tr_over.pop("lbfgs_resample_every")
    for k, v in tr_over.items():
        setattr(t, k, v)
    if epochs:
        t.num_epochs = epochs
    t.early_stopping.enabled = False
    t.loss_weights["smoothness"] = 0.0
    t.validation_frequency = max(t.num_epochs // 4, 1)
    return cfg


def run_convergence(
    pde_key: str,
    seed: int = 0,
    epochs: Optional[int] = None,
    experiment_dir: Optional[str] = None,
    resume_from: Optional[str] = None,
    train_seed: Optional[int] = None,
) -> ConvergenceResult:
    """``experiment_dir`` turns on the trainer's periodic mid-run
    checkpointing; ``resume_from`` restarts from such a checkpoint — together
    they let a suite ride out TPU worker crashes (observed MTBF ~10 min on a
    degraded backend) by re-running the same recipe in a fresh process
    without losing completed epochs. Not supported for multi-stage recipes.

    ``train_seed`` (default: ``seed``) varies ONLY the training PRNG
    stream. The model seed must stay fixed across resumed segments — the
    Fourier basis lives in model CONSTANTS keyed by the model seed, not in
    the checkpointed params — so resumable multi-segment runs that want
    fresh L-BFGS batches per segment vary train_seed, never seed."""
    recipe = RECIPES[pde_key]
    cfg = build_recipe_config(pde_key, epochs)
    t = cfg.training
    if experiment_dir:
        # Benchmark checkpointing wants bare weights, not figure rendering.
        cfg.evaluation.save_plots = False
        t.validation_frequency = min(t.validation_frequency,
                                     max(t.num_epochs // 10, 1))

    pde = create_pde(cfg)
    stages = recipe.get("stages")
    if stages:
        # Multi-stage recipe: base net + eps-scaled correction stage(s)
        # (pinnrl_tpu/training/multistage.py). ``epochs`` caps the TOTAL
        # budget: the base keeps the recipe's split of it.
        from pinnrl_tpu.training.multistage import StageSpec, run_multistage

        specs = [StageSpec(**s) for s in stages]
        t0 = time.perf_counter()
        ms = run_multistage(cfg, specs, seed=seed, pde=pde)
        wall = time.perf_counter() - t0
        val = ms.stage_metrics[-1]
        total_epochs = t.num_epochs + sum(
            s.epochs or t.num_epochs for s in specs
        )
        n_batches = max(
            t.num_collocation_points
            // min(t.batch_size, t.num_collocation_points), 1,
        )
        steps = total_epochs * n_batches
        return ConvergenceResult(
            pde=pde_key,
            architecture=recipe["arch"],
            epochs=total_epochs,
            rel_l2=val.get("rel_l2", float("nan")),
            max_error=val.get("max_error", float("nan")),
            final_train_loss=float("nan"),
            wall_time_s=wall,
            points_per_sec=steps
            * min(t.batch_size, t.num_collocation_points) / wall,
            seed=seed,
        )

    model = PINNModel(cfg, seed=seed)
    trainer = PDETrainer(model, pde, cfg)
    t0 = time.perf_counter()
    res = trainer.train(
        seed=seed if train_seed is None else train_seed,
        experiment_dir=experiment_dir, resume_from=resume_from,
    )
    wall = time.perf_counter() - t0
    params = trainer._final_state["params"]["net"]
    val = pde.validate(model.apply, params, num_points=20000)
    steps = len(trainer.history["train_loss"]) * max(
        t.num_collocation_points // min(t.batch_size, t.num_collocation_points), 1
    )
    return ConvergenceResult(
        pde=pde_key,
        architecture=recipe["arch"],
        epochs=t.num_epochs,
        rel_l2=val.get("rel_l2", float("nan")),
        max_error=val.get("max_error", float("nan")),
        final_train_loss=res["final_train_loss"],
        wall_time_s=wall,
        points_per_sec=steps * min(t.batch_size, t.num_collocation_points) / wall,
        seed=seed,
    )


def results_to_csv(results: Sequence[ConvergenceResult]) -> str:
    header = "pde,architecture,epochs,rel_l2,max_error,final_train_loss,wall_time_s,points_per_sec,seed"
    rows = [
        f"{r.pde},{r.architecture},{r.epochs},{r.rel_l2:.6e},{r.max_error:.6e},"
        f"{r.final_train_loss:.6e},{r.wall_time_s:.1f},{r.points_per_sec:.0f},{r.seed}"
        for r in results
    ]
    return "\n".join([header, *rows]) + "\n"


def run_time_marching(
    pde_key: str,
    seed: int = 0,
    n_windows: int = 4,
    epochs_per_window: Optional[int] = None,
    mutate=None,
) -> ConvergenceResult:
    """Time-marching training: split the time horizon into sequential
    windows; window k trains on [t_k, t_{k+1}] with its initial condition
    taken from window k-1's trained model at t_k (window 0 uses the true
    problem IC). The stitched solution is validated per window against the
    exact solution and aggregated into one rel-L2.

    The cure for dispersive time-horizon ill-conditioning: globally-trained
    KdV plateaus at rel-L2 ~4e-3 with residual RMS 2.6e-4 concentrated as
    far-field radiation that grows with t (see the KdV recipe notes); short
    windows keep the residual-to-error amplification small and error enters
    the next window only through the inherited IC. New capability beyond
    the reference (which trains the full horizon only).
    """
    import jax.numpy as jnp

    cfg0 = build_recipe_config(pde_key)
    t_lo_full, t_hi_full = cfg0.pde.time_domain
    edges = np.linspace(t_lo_full, t_hi_full, n_windows + 1)
    epw = epochs_per_window or max(cfg0.training.num_epochs // n_windows, 1)

    prev = None  # (apply_fn, params) of the previous window's model
    window_models = []
    total_wall = 0.0
    total_loss = 0.0
    for w in range(n_windows):
        cfg = build_recipe_config(pde_key, epochs=epw)
        cfg.pde.time_domain = [float(edges[w]), float(edges[w + 1])]
        cfg.training.validation_frequency = max(epw // 2, 1)
        if mutate is not None:
            # Probe hook (scripts/probe_recipe.py tm=N): apply recipe
            # overrides to every window config; the hook must preserve the
            # window-specific time_domain/num_epochs it receives.
            mutate(cfg)
        pde = create_pde(cfg)
        model = PINNModel(cfg, seed=seed)
        if prev is not None:
            prev_apply, prev_params = prev
            t_anchor = float(edges[w])

            def inherited_ic(x, t, _a=prev_apply, _p=prev_params, _t=t_anchor):
                z = jnp.concatenate(
                    [x, jnp.full((x.shape[0], 1), _t, x.dtype)], axis=-1
                )
                return _a(_p, z).reshape(x.shape[0], -1)[:, 0:1]

            pde.boundary_conditions["initial"] = inherited_ic
            # Warm start: the previous window's weights are a good init for
            # the shifted window (same normalized-coordinate geometry).
            model.params = prev_params
        trainer = PDETrainer(model, pde, cfg)
        t0 = time.perf_counter()
        res = trainer.train(seed=seed + w)
        total_wall += time.perf_counter() - t0
        total_loss = res["final_train_loss"]
        params = trainer._final_state["params"]["net"]
        window_models.append((model.apply, params, pde))
        prev = (model.apply, params)

    # Stitched validation: per-window uniform grids, aggregated norms.
    err_sq, exact_sq, max_err = 0.0, 0.0, 0.0
    n_val = 20000 // n_windows
    for apply_fn, params, pde in window_models:
        import jax

        from pinnrl_tpu.sampling.strategies import sample_uniform

        x, tt = sample_uniform(
            jax.random.PRNGKey(1234), n_val, pde.domain, pde.time_domain
        )
        ex = pde.exact_solution(x, tt)
        pred = apply_fn(params, jnp.concatenate([x, tt], -1)).reshape(x.shape[0], -1)[:, 0:1]
        diff = np.asarray(pred - ex.reshape(pred.shape))
        err_sq += float((diff**2).sum())
        exact_sq += float((np.asarray(ex) ** 2).sum())
        max_err = max(max_err, float(np.abs(diff).max()))
    rel_l2 = (err_sq ** 0.5) / ((exact_sq ** 0.5) + 1e-12)

    t = cfg0.training
    steps = n_windows * epw * max(
        t.num_collocation_points // min(t.batch_size, t.num_collocation_points), 1
    )
    return ConvergenceResult(
        pde=f"{pde_key}_tm{n_windows}",
        architecture=RECIPES[pde_key]["arch"],
        epochs=n_windows * epw,
        rel_l2=rel_l2,
        max_error=max_err,
        final_train_loss=total_loss,
        wall_time_s=total_wall,
        points_per_sec=steps * min(t.batch_size, t.num_collocation_points) / max(total_wall, 1e-9),
        seed=seed,
    )
