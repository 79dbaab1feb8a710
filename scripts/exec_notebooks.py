"""Execute the example notebooks in place (CPU or TPU, whichever backend
jax resolves). Usage: python scripts/exec_notebooks.py [name ...]"""

from __future__ import annotations

import sys
from pathlib import Path

import nbformat
from nbclient import NotebookClient

ROOT = Path(__file__).resolve().parent.parent
NB_DIR = ROOT / "notebooks"


def main() -> int:
    names = sys.argv[1:] or [p.stem for p in sorted(NB_DIR.glob("*.ipynb"))]
    failures = 0
    for name in names:
        path = NB_DIR / f"{name}.ipynb"
        print(f"=== executing {path.name} ===", flush=True)
        nb = nbformat.read(path, as_version=4)
        client = NotebookClient(nb, timeout=1800, kernel_name="python3",
                                resources={"metadata": {"path": str(ROOT)}})
        try:
            client.execute()
        except Exception as e:  # noqa: BLE001 — report and continue
            failures += 1
            print(f"FAILED {name}: {type(e).__name__}: {e}", flush=True)
        nbformat.write(nb, path)
        print(f"=== wrote {path.name} ===", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
