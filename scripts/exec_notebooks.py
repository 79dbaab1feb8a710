"""Execute the example notebooks in place.

Usage: python scripts/exec_notebooks.py [--cpu] [name ...]

--cpu injects a transient bootstrap cell forcing the CPU backend (the axon
host IGNORES the JAX_PLATFORMS env var — jax.config.update is the only
lever; see memory: tpu-backend-quirks) and strips it from the saved output.
"""

from __future__ import annotations

import sys
from pathlib import Path

import nbformat
from nbclient import NotebookClient

ROOT = Path(__file__).resolve().parent.parent
NB_DIR = ROOT / "notebooks"

_CPU_BOOT = (
    "import jax\n"
    "jax.config.update('jax_platforms', 'cpu')  # exec_notebooks --cpu\n"
)


def main() -> int:
    args = sys.argv[1:]
    force_cpu = "--cpu" in args
    names = [a for a in args if a != "--cpu"] or [
        p.stem for p in sorted(NB_DIR.glob("*.ipynb"))
    ]
    failures = 0
    for name in names:
        path = NB_DIR / f"{name}.ipynb"
        print(f"=== executing {path.name} ===", flush=True)
        nb = nbformat.read(path, as_version=4)
        if force_cpu:
            nb.cells.insert(0, nbformat.v4.new_code_cell(_CPU_BOOT))
        client = NotebookClient(nb, timeout=3600, kernel_name="python3",
                                resources={"metadata": {"path": str(ROOT)}})
        try:
            client.execute()
        except Exception as e:  # noqa: BLE001 — report and continue
            failures += 1
            print(f"FAILED {name}: {type(e).__name__}: {e}", flush=True)
        if force_cpu:
            nb.cells.pop(0)
        nbformat.write(nb, path)
        print(f"=== wrote {path.name} ===", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
