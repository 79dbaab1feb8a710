"""Generate static API-reference markdown under docs/api/ from docstrings.

The reference's mkdocs site ships generated API pages (reference:
mkdocs.yml + docs/api/); this environment has no mkdocstrings plugin
installed, so we generate plain-markdown pages by introspection instead —
they render under any mkdocs theme with zero plugins.

    JAX_PLATFORMS=cpu python scripts/gen_api_docs.py
"""

from __future__ import annotations

import inspect
import sys
import textwrap
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

OUT = ROOT / "docs" / "api"

# module path -> (page title, one-line blurb)
MODULES = {
    "pinnrl_tpu.config": (
        "Configuration",
        "YAML + dataclass config system: loading, overlays, validation.",
    ),
    "pinnrl_tpu.models": (
        "Models",
        "PINNModel factory and the seven flax architectures.",
    ),
    "pinnrl_tpu.pdes": (
        "PDE problems",
        "The PDE registry: residuals, exact solutions, BC/IC, validation.",
    ),
    "pinnrl_tpu.ops.derivatives": (
        "Derivative engine",
        "Taylor-jet / nested-jvp derivatives up to 4th order in space.",
    ),
    "pinnrl_tpu.ops.jet_mlp": (
        "Stacked-jet fast path",
        "All derivative streams transported through each layer in one matmul.",
    ),
    "pinnrl_tpu.ops.special": (
        "Special functions",
        "Jittable Jacobi elliptic functions (AGM/Landen).",
    ),
    "pinnrl_tpu.sampling.strategies": (
        "Sampling strategies",
        "uniform / LHS / RAR / RL-adaptive collocation sampling.",
    ),
    "pinnrl_tpu.rl.dqn": (
        "RL agent (DQN)",
        "On-device ring-buffer DQN driving adaptive collocation.",
    ),
    "pinnrl_tpu.training.trainer": (
        "Trainer",
        "PDETrainer: fused lax.scan epochs, adam/lbfgs, checkpoint/resume.",
    ),
    "pinnrl_tpu.training.adaptive_weights": (
        "Adaptive loss weights",
        "LRW / RBW adaptive loss balancing.",
    ),
    "pinnrl_tpu.training.multistage": (
        "Multi-stage training",
        "Correction-net stages over a frozen base model.",
    ),
    "pinnrl_tpu.parallel": (
        "Parallelism",
        "Device-mesh data parallelism (NamedSharding + psum).",
    ),
    "pinnrl_tpu.datasets": (
        "Datasets (The Well)",
        "Registry, flattening loader, npz cache.",
    ),
    "pinnrl_tpu.benchmarks.fdm": (
        "FDM baselines",
        "lax.scan finite-difference reference solvers with stability guards.",
    ),
    "pinnrl_tpu.benchmarks.convergence": (
        "Convergence benchmarks",
        "Per-PDE north-star recipes and the convergence harness.",
    ),
    "pinnrl_tpu.numerical_solvers.spectral": (
        "Spectral solvers",
        "ETDRK4 Fourier phase-field reference solutions.",
    ),
    "pinnrl_tpu.utils.io": (
        "Experiment I/O",
        "The reference-compatible experiment file protocol.",
    ),
    "pinnrl_tpu.utils.plotting": (
        "Plotting",
        "Collocation-evolution, Q-density and report figures.",
    ),
    "pinnrl_tpu.dashboard.server": (
        "Dashboard server",
        "stdlib-HTTP dashboard over the experiment file protocol.",
    ),
}


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj) -> str:
    d = inspect.getdoc(obj)
    return d.strip() if d else "*(no docstring)*"


def _is_public_member(mod, name, obj) -> bool:
    if name.startswith("_"):
        return False
    m = getattr(obj, "__module__", None)
    if m is None or not m.startswith("pinnrl_tpu"):
        return False
    if inspect.ismodule(obj):
        return False
    return inspect.isclass(obj) or inspect.isfunction(obj)


def render_module(modpath: str, title: str, blurb: str) -> str:
    mod = __import__(modpath, fromlist=["*"])
    lines = [f"# {title}", "", f"`{modpath}` — {blurb}", ""]
    mdoc = inspect.getdoc(mod)
    if mdoc:
        lines += [mdoc.strip(), ""]

    names = getattr(mod, "__all__", None)
    members = []
    for name in names or sorted(vars(mod)):
        obj = getattr(mod, name, None)
        if obj is None or not _is_public_member(mod, name, obj):
            continue
        members.append((name, obj))

    for name, obj in members:
        if inspect.isclass(obj):
            lines += [f"## `class {name}{_sig(obj)}`", "", _doc(obj), ""]
            for mname, meth in sorted(vars(obj).items()):
                if mname.startswith("_") or not callable(meth):
                    continue
                fn = meth.__func__ if isinstance(meth, (staticmethod, classmethod)) else meth
                if not (inspect.isfunction(fn) or inspect.ismethod(fn)):
                    continue
                lines += [
                    f"### `{name}.{mname}{_sig(fn)}`",
                    "",
                    textwrap.indent(_doc(fn), ""),
                    "",
                ]
        else:
            lines += [f"## `{name}{_sig(obj)}`", "", _doc(obj), ""]
    return "\n".join(lines) + "\n"


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    index = [
        "# API reference",
        "",
        "Generated from docstrings by `scripts/gen_api_docs.py` "
        "(re-run it after changing public signatures).",
        "",
    ]
    for modpath, (title, blurb) in MODULES.items():
        slug = modpath.replace("pinnrl_tpu.", "").replace(".", "_")
        page = OUT / f"{slug}.md"
        page.write_text(render_module(modpath, title, blurb))
        index.append(f"- [{title}]({slug}.md) — {blurb}")
        print(f"wrote {page}")
    (OUT / "index.md").write_text("\n".join(index) + "\n")
    print(f"wrote {OUT / 'index.md'}")


if __name__ == "__main__":
    main()
