"""Generic recipe probe: run the shipping recipe for a PDE with ad-hoc
overrides and report rel-L2. The workhorse behind the per-PDE probe
matrices recorded in pinnrl_tpu/benchmarks/convergence.py.

Usage:
  python scripts/probe_recipe.py <pde> [key=value ...]

Keys: epochs, seed, scale, mapping_size, modified, hidden, feature_seed,
      ensemble, ema, causal_eps, lr, optimizer, trainable_features,
      moving_frame, batch, points, gpinn, w_ic, w_bc, w_res, bc, save,
      formulation (=first_order, auxiliary-variable system),
      stage2 (=epochs, enables a multi-stage correction net),
      stage2_eps, stage2_scale, stage2_lr, stage2_map
Appends rows to benchmark_results/probe_matrix.csv
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import sys
import time
from pathlib import Path

from pinnrl_tpu.benchmarks.convergence import build_recipe_config
from pinnrl_tpu.models import PINNModel
from pinnrl_tpu.pdes import create_pde
from pinnrl_tpu.training.trainer import PDETrainer

OUT = Path("benchmark_results/probe_matrix.csv")


def parse(args):
    kv = {}
    for a in args:
        k, v = a.split("=", 1)
        kv[k] = v
    return kv


def main():
    pde_key = sys.argv[1]
    kv = parse(sys.argv[2:])
    epochs = int(kv.pop("epochs", 500))
    seed = int(kv.pop("seed", 0))

    cfg = build_recipe_config(pde_key, epochs=epochs)
    ap = cfg.model.arch_params
    save_path = None
    stage2 = {}
    tm_windows = 0
    label = [pde_key, f"ep{epochs}", f"s{seed}"]
    for k, v in kv.items():
        label.append(f"{k}={v}")
        if k == "scale":
            # colon-separated = anisotropic per-dim scales, e.g. scale=0:1.0
            ap["scale"] = v if ":" in v else float(v)
        elif k == "mapping_size":
            ap["mapping_size"] = int(v)
        elif k == "modified":
            ap["modified"] = v.lower() in ("1", "true")
        elif k == "feature_seed":
            ap["feature_seed"] = None if v == "none" else int(v)
        elif k == "trainable_features":
            ap["trainable_features"] = v.lower() in ("1", "true")
        elif k == "moving_frame":
            ap["moving_frame_speed"] = float(v)
        elif k == "hidden":
            cfg.model.hidden_dims = [int(x) for x in v.split("x")]
        elif k == "arch":
            cfg.model.architecture = v
            cfg.pde.architecture = v
        elif k == "hard_ic":
            cfg.model.hard_ic = v.lower() in ("1", "true")
        elif k == "hard_ic_T":
            cfg.pde.parameters["hard_ic_timescale"] = float(v)
        elif k == "ensemble":
            cfg.training.ensemble_size = int(v)
        elif k == "ema":
            cfg.training.param_ema = float(v)
        elif k == "causal_eps":
            cfg.training.causal_eps = float(v)
        elif k == "lr":
            cfg.training.optimizer_config.learning_rate = float(v)
        elif k == "optimizer":
            cfg.training.optimizer = v
        elif k == "lbfgs_bs":
            cfg.training.lbfgs.batch_size = int(v)
        elif k == "switch":
            cfg.training.adam_lbfgs_switch_ratio = float(v)
        elif k == "f64":
            if v.lower() in ("1", "true"):
                cfg.training.residual_dtype = "float64"
        elif k == "phase2":
            cfg.training.phase2_optimizer = v
        elif k == "phase2_lr":
            cfg.training.phase2_learning_rate = float(v)
        elif k == "batch":
            cfg.training.batch_size = int(v)
        elif k == "points":
            cfg.training.num_collocation_points = int(v)
        elif k == "gpinn":
            cfg.training.loss_weights["gpinn"] = float(v)
        elif k == "w_ic":
            cfg.training.loss_weights["initial"] = float(v)
        elif k == "w_bc":
            cfg.training.loss_weights["boundary"] = float(v)
        elif k == "w_res":
            cfg.training.loss_weights["residual"] = float(v)
        elif k == "w_mass":
            cfg.training.loss_weights["mass"] = float(v)
        elif k == "w_mu_h2":
            cfg.training.loss_weights["mu_h2"] = float(v)
        elif k == "ic_focus":
            cfg.pde.parameters["ic_strike_focus"] = float(v)
        elif k == "ic_width":
            cfg.pde.parameters["ic_strike_width"] = float(v)
        elif k == "tm":
            tm_windows = int(v)
        elif k == "formulation":
            cfg.pde.parameters["formulation"] = v
            if v == "first_order":
                cfg.model.output_dim = 3
                cfg.pde.output_dim = 3
            elif v == "mixed":
                cfg.model.output_dim = 2
                cfg.pde.output_dim = 2
            elif v == "direct":
                # Single-channel head, biharmonic residual path.
                cfg.model.output_dim = 1
                cfg.pde.output_dim = 1
        elif k == "bc":
            if v == "exact":
                cfg.pde.boundary_conditions = {"dirichlet": {"type": "exact"}}
            else:
                raise SystemExit(f"unknown bc {v}")
        elif k == "save":
            label.pop()  # checkpoint path is not part of the variant label
            save_path = v
        elif k == "stage2":
            stage2["epochs"] = int(v)
        elif k == "stage2_eps":
            stage2["eps"] = float(v)
        elif k == "stage2_scale":
            stage2["scale"] = float(v)
        elif k == "stage2_lr":
            stage2["learning_rate"] = float(v)
        elif k == "stage2_map":
            stage2["mapping_size"] = int(v)
        else:
            raise SystemExit(f"unknown key {k}")

    if tm_windows:
        # Time-marching probe (VERDICT r4 job #2): run the recipe+overrides
        # through run_time_marching; every window inherits the probed
        # model/training mutations but keeps its own time window & epochs.
        import copy

        from pinnrl_tpu.benchmarks.convergence import run_time_marching

        def mutate(wcfg, _src=cfg):
            keep_td = wcfg.pde.time_domain
            keep_ep = wcfg.training.num_epochs
            keep_vf = wcfg.training.validation_frequency
            src = copy.deepcopy(_src)
            wcfg.model = src.model
            wcfg.pde = src.pde
            wcfg.training = src.training
            wcfg.pde.time_domain = keep_td
            wcfg.training.num_epochs = keep_ep
            wcfg.training.validation_frequency = keep_vf

        t0 = time.perf_counter()
        r = run_time_marching(
            pde_key, seed=seed, n_windows=tm_windows,
            epochs_per_window=max(epochs // tm_windows, 1), mutate=mutate,
        )
        wall = time.perf_counter() - t0
        row = (
            f'{"|".join(label)},{r.rel_l2:.6e},{r.max_error:.6e},'
            f"{r.final_train_loss:.6e},{wall:.1f}"
        )
        OUT.parent.mkdir(exist_ok=True)
        if not OUT.exists():
            OUT.write_text("label,rel_l2,max_error,final_train_loss,wall_s\n")
        with OUT.open("a") as f:
            f.write(row + "\n")
        print(row, flush=True)
        return

    pde = create_pde(cfg)
    if stage2:
        from pinnrl_tpu.training.multistage import StageSpec, run_multistage

        t0 = time.perf_counter()
        ms = run_multistage(cfg, [StageSpec(**stage2)], seed=seed, pde=pde)
        wall = time.perf_counter() - t0
        val = ms.stage_metrics[-1]
        base = ms.stage_metrics[0]
        print(
            f"stage1 rel_l2={base['rel_l2']:.3e} -> stage2 "
            f"rel_l2={val['rel_l2']:.3e} (eps={ms.eps_history[0]:.3e})",
            flush=True,
        )
        row = (
            f'{"|".join(label)},{val["rel_l2"]:.6e},{val["max_error"]:.6e},'
            f"nan,{wall:.1f}"
        )
        OUT.parent.mkdir(exist_ok=True)
        if not OUT.exists():
            OUT.write_text("label,rel_l2,max_error,final_train_loss,wall_s\n")
        with OUT.open("a") as f:
            f.write(row + "\n")
        print(row, flush=True)
        return

    model = PINNModel(cfg, seed=seed)
    trainer = PDETrainer(model, pde, cfg)
    t0 = time.perf_counter()
    res = trainer.train(seed=seed)
    wall = time.perf_counter() - t0
    params = trainer._final_state["params"]["net"]
    if save_path:
        model.params = params
        model.save_state(save_path)
    val = pde.validate(model.apply, params, num_points=20000)
    row = (
        f'{"|".join(label)},{val["rel_l2"]:.6e},{val["max_error"]:.6e},'
        f'{res["final_train_loss"]:.6e},{wall:.1f}'
    )
    OUT.parent.mkdir(exist_ok=True)
    if not OUT.exists():
        OUT.write_text("label,rel_l2,max_error,final_train_loss,wall_s\n")
    with OUT.open("a") as f:
        f.write(row + "\n")
    print(row, flush=True)


if __name__ == "__main__":
    main()
