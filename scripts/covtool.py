"""Line-coverage collector built on ``sys.monitoring`` (PEP 669, Python 3.12+).

The CI image has no ``coverage``/``pytest-cov``; this provides the subset we
need for the reference's >=80% coverage gate
(reference: .github/workflows/checks.yml:10-38, pyproject.toml:146-156):

- ``start(out_dir)`` registers a LINE-event callback that records each
  (file, line) under ``pinnrl_tpu/`` the first time it executes, then returns
  ``sys.monitoring.DISABLE`` for that location — steady-state overhead is
  near zero, unlike ``sys.settrace``.
- ``stop()`` writes one JSON file per process (xdist-safe: keyed by PID) into
  ``out_dir``.
- ``report(out_dir)`` merges the per-process files, derives the executable
  line set per source file by walking compiled code objects (``co_lines``),
  and returns per-file + total percentages.

Activated from tests/conftest.py when ``PINNRL_COV_DIR`` is set; gated by
scripts/coverage_gate.py.
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict
from pathlib import Path

_TOOL = sys.monitoring.COVERAGE_ID
_covered: dict[str, set[int]] = defaultdict(set)
_pkg_root: str = ""
_active = False

# Files exempt from the gate, mirroring the reference's omit list
# (reference: pyproject.toml:148-152 — dashboard.py, main.py, train.py).
EXEMPT_PARTS = (
    os.path.join("pinnrl_tpu", "dashboard") + os.sep,
    os.path.join("pinnrl_tpu", "main.py"),
    os.path.join("pinnrl_tpu", "training", "train.py"),
)


def _is_exempt(path: str) -> bool:
    return any(part in path for part in EXEMPT_PARTS)


def _on_line(code, line):
    fn = code.co_filename
    if fn.startswith(_pkg_root):
        _covered[fn].add(line)
    return sys.monitoring.DISABLE


def start(pkg_root: str | None = None) -> None:
    """Begin collecting.

    ``pkg_root`` defaults to the repo-relative pinnrl_tpu directory WITHOUT
    importing the package: importing it here would execute every module-level
    line (dataclass bodies, def statements, the whole config module via
    pinnrl_tpu/__init__) before instrumentation starts, silently marking
    them uncovered."""
    global _pkg_root, _active
    if _active:
        return
    if pkg_root is None:
        pkg_root = str(Path(__file__).resolve().parent.parent / "pinnrl_tpu")
    _pkg_root = pkg_root
    sys.monitoring.use_tool_id(_TOOL, "pinnrl-cov")
    sys.monitoring.register_callback(_TOOL, sys.monitoring.events.LINE, _on_line)
    sys.monitoring.set_events(_TOOL, sys.monitoring.events.LINE)
    _active = True


def stop(out_dir: str) -> None:
    """Stop collecting and dump this process's hits as JSON."""
    global _active
    if not _active:
        return
    sys.monitoring.set_events(_TOOL, 0)
    sys.monitoring.free_tool_id(_TOOL)
    _active = False
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    payload = {fn: sorted(lines) for fn, lines in _covered.items()}
    (out / f"cov_{os.getpid()}.json").write_text(
        json.dumps({"pkg_root": _pkg_root, "covered": payload})
    )


def _executable_lines(path: Path) -> set[int]:
    """All line numbers containing executable code, via compiled co_lines."""
    try:
        code = compile(path.read_text(), str(path), "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [code]
    while stack:
        co = stack.pop()
        for _, _, ln in co.co_lines():
            if ln is not None:
                lines.add(ln)
        for const in co.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    # co_lines reports the def/class header lines plus docstring lines via
    # the module code object; that matches coverage.py closely enough.
    return lines


def report(out_dir: str, pkg_root: str | None = None) -> dict:
    """Merge per-process dumps into {file: {covered, total, pct}, TOTAL: pct}."""
    merged: dict[str, set[int]] = defaultdict(set)
    roots = set()
    for f in Path(out_dir).glob("cov_*.json"):
        data = json.loads(f.read_text())
        roots.add(data["pkg_root"])
        for fn, lines in data["covered"].items():
            merged[fn].update(lines)
    if pkg_root is None:
        if roots:
            pkg_root = sorted(roots)[0]
        else:
            import pinnrl_tpu

            pkg_root = str(Path(pinnrl_tpu.__file__).parent)

    per_file = {}
    tot_cov = tot_all = 0
    for src in sorted(Path(pkg_root).rglob("*.py")):
        s = str(src)
        if _is_exempt(s):
            continue
        exe = _executable_lines(src)
        if not exe:
            continue
        cov = merged.get(s, set()) & exe
        per_file[os.path.relpath(s, pkg_root)] = {
            "covered": len(cov),
            "total": len(exe),
            "pct": round(100.0 * len(cov) / len(exe), 1),
        }
        tot_cov += len(cov)
        tot_all += len(exe)
    return {
        "files": per_file,
        "total_pct": round(100.0 * tot_cov / max(tot_all, 1), 2),
        "covered": tot_cov,
        "executable": tot_all,
    }
