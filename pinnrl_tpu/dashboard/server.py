"""Dashboard backend: JSON APIs over the experiment file protocol + launcher.

Endpoints (all reading the same files the reference's Dash callbacks poll):
- GET  /                       -> the single-page app (dashboard/app.html)
- GET  /api/meta               -> PDE registry, architectures, Well datasets
- GET  /api/experiments        -> experiment list w/ stale-.running cleanup
                                  (reference: dashboard.py:1108-1217)
- GET  /api/experiment/<name>/history   -> history.json
- GET  /api/experiment/<name>/snapshot  -> live_snapshot.npz as JSON
- POST /api/launch             -> spawn a detached pinnrl-train subprocess
                                  (reference: dashboard.py:1642-1804)
"""

from __future__ import annotations

import json
import logging
import subprocess
import sys
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_APP_HTML = Path(__file__).parent / "app.html"
STALE_RUNNING_AGE_S = 3600  # reference: runs older than 1 h are stale


def _read_json(path: Path) -> Optional[Dict[str, Any]]:
    try:
        return json.loads(path.read_text())
    except Exception:
        return None


def get_experiments(results_dir: Path) -> List[Dict[str, Any]]:
    """Scan experiment dirs; clean up stale .running markers
    (reference: dashboard.py:1108-1192)."""
    out = []
    if not results_dir.exists():
        return out
    for exp in sorted(results_dir.iterdir(), reverse=True):
        if not exp.is_dir():
            continue
        meta = _read_json(exp / "metadata.json") or {}
        running_marker = exp / ".running"
        running = running_marker.exists()
        if running:
            stale = (
                meta.get("status") in ("completed", "failed")
                or time.time() - running_marker.stat().st_mtime > STALE_RUNNING_AGE_S
            )
            if stale:
                running_marker.unlink(missing_ok=True)
                running = False
        metrics = _read_json(exp / "metrics.json") or {}
        out.append(
            {
                "name": exp.name,
                "status": "running" if running else meta.get("status", "unknown"),
                "pde_type": meta.get("pde_type"),
                "architecture": meta.get("architecture"),
                "mode": meta.get("mode"),
                "rl_enabled": meta.get("rl_enabled", False),
                "num_epochs": meta.get("num_epochs"),
                "current_epoch": meta.get("current_epoch", 0),
                "final_train_loss": metrics.get("final_train_loss"),
                "final_val_loss": metrics.get("final_val_loss"),
                "trainable_parameters": meta.get("trainable_parameters", []),
                "true_parameters": meta.get("true_parameters", {}),
                "identified_parameters": meta.get("identified_parameters", {}),
                "timestamp": meta.get("timestamp"),
            }
        )
    return out


def load_snapshot(exp_dir: Path) -> Optional[Dict[str, Any]]:
    snap_path = exp_dir / "live_snapshot.npz"
    if not snap_path.exists():
        return None
    try:
        with np.load(snap_path) as snap:
            return {
                "u_pred": snap["u_pred"].tolist(),
                "residual": snap["residual"].tolist(),
                "x": snap["x"].tolist(),
                "y_or_t": snap["y_or_t"].tolist(),
                "dimension": int(snap["dimension"]),
            }
    except Exception:
        return None


_SOLUTION_CACHE: Dict[str, Dict[str, Any]] = {}


def load_solution(exp_dir: Path, grid: int = 80, n_times: int = 9) -> Optional[Dict[str, Any]]:
    """Solution explorer payload: exact-vs-predicted field at a ladder of
    time slices, from the saved final model + config snapshot.

    The reference rebuilds the model by inferring hyperparams from state-dict
    tensor shapes (reference: dashboard.py:2428-2501, rendered at :2504-2667);
    here the experiment's config.yaml snapshot restores it exactly.
    """
    cfg_path = exp_dir / "config.yaml"
    model_path = exp_dir / "final_model.msgpack"
    if not cfg_path.exists() or not model_path.exists():
        return None
    # Key by checkpoint mtime so a re-run/resume into the same directory
    # invalidates the stale payload; keep only the most recent few payloads
    # (each is a full grid*grid*n_times field) so the cache stays bounded.
    cache_key = f"{exp_dir}:{model_path.stat().st_mtime_ns}"
    cached = _SOLUTION_CACHE.get(cache_key)
    if cached is not None:
        return cached
    try:
        import jax.numpy as jnp
        import yaml

        from pinnrl_tpu.config import Config
        from pinnrl_tpu.models import PINNModel
        from pinnrl_tpu.pdes import create_pde

        cfg = Config.from_snapshot(yaml.safe_load(cfg_path.read_text()))
        pde = create_pde(cfg)
        model = PINNModel(cfg, seed=0)
        model.load_state(str(model_path))

        t0, t1 = pde.time_domain
        times = np.linspace(t0, t1, n_times)
        if pde.dimension == 1:
            xs = np.linspace(pde.domain[0][0], pde.domain[0][1], grid)
            x_flat = jnp.asarray(xs.reshape(-1, 1), jnp.float32)
            u_pred, u_exact = [], []
            for tv in times:
                t_flat = jnp.full_like(x_flat, float(tv))
                pred = model.apply(
                    model.params, jnp.concatenate([x_flat, t_flat], axis=-1)
                ).reshape(-1)
                u_pred.append(np.asarray(pred).tolist())
                ex = pde.exact_solution(x_flat, t_flat)
                u_exact.append(None if ex is None else np.asarray(ex).reshape(-1).tolist())
            payload = {
                "dimension": 1,
                "x": xs.tolist(),
                "times": times.tolist(),
                "u_pred": u_pred,
                "u_exact": u_exact if any(e is not None for e in u_exact) else None,
            }
        else:
            xs = np.linspace(pde.domain[0][0], pde.domain[0][1], grid)
            ys = np.linspace(pde.domain[1][0], pde.domain[1][1], grid)
            X, Y = np.meshgrid(xs, ys, indexing="ij")
            x_flat = jnp.asarray(
                np.stack([X.reshape(-1), Y.reshape(-1)], axis=-1), jnp.float32
            )
            u_pred, u_exact = [], []
            for tv in times:
                t_flat = jnp.full((x_flat.shape[0], 1), float(tv), jnp.float32)
                pred = model.apply(
                    model.params, jnp.concatenate([x_flat, t_flat], axis=-1)
                ).reshape(x_flat.shape[0], -1)[:, 0]
                u_pred.append(np.asarray(pred).reshape(grid, grid).tolist())
                ex = pde.exact_solution(x_flat, t_flat)
                u_exact.append(
                    None if ex is None
                    else np.asarray(ex).reshape(grid, grid).tolist()
                )
            payload = {
                "dimension": 2,
                "x": xs.tolist(),
                "y": ys.tolist(),
                "times": times.tolist(),
                "u_pred": u_pred,
                "u_exact": u_exact if any(e is not None for e in u_exact) else None,
            }
        while len(_SOLUTION_CACHE) >= 8:
            _SOLUTION_CACHE.pop(next(iter(_SOLUTION_CACHE)))
        _SOLUTION_CACHE[cache_key] = payload
        return payload
    except Exception:
        logger.exception("solution explorer failed for %s", exp_dir)
        return None


def launch_trainer(params: Dict[str, Any], results_dir: Path) -> Dict[str, Any]:
    """Build a pinnrl-train command and spawn it detached
    (reference: dashboard.py:1642-1804)."""
    cmd = [sys.executable, "-m", "pinnrl_tpu.training.train",
           "--pde", str(params.get("pde", "heat")),
           "--results-dir", str(results_dir)]
    if params.get("arch"):
        cmd += ["--arch", str(params["arch"])]
    for flag, key in [
        ("--epochs", "epochs"), ("--batch-size", "batch_size"),
        ("--collocation-points", "collocation_points"), ("--lr", "lr"),
        ("--optimizer", "optimizer"), ("--mode", "mode"),
        ("--loss-function", "loss_function"), ("--sampling", "sampling"),
        ("--dataset", "dataset"), ("--obs-points", "obs_points"),
        ("--obs-noise", "obs_noise"), ("--obs-path", "obs_path"),
    ]:
        if params.get(key) not in (None, "", False):
            cmd += [flag, str(params[key])]
    if params.get("rl"):
        cmd.append("--rl")
    for name in params.get("identify", []) or []:
        cmd += ["--identify", str(name)]
    for spec in params.get("initial_guess", []) or []:
        cmd += ["--initial-guess", str(spec)]

    results_dir.mkdir(parents=True, exist_ok=True)
    log_path = results_dir / "trainer_launch.log"
    with open(log_path, "ab") as log:
        proc = subprocess.Popen(
            cmd, stdout=log, stderr=subprocess.STDOUT, start_new_session=True
        )
    logger.info("Launched trainer pid=%d: %s", proc.pid, " ".join(cmd))
    return {"pid": proc.pid, "command": cmd}


class _Handler(BaseHTTPRequestHandler):
    server_version = "pinnrl-tpu-dashboard"
    results_dir: Path = Path("experiments")

    def log_message(self, fmt, *args):  # quiet
        logger.debug(fmt, *args)

    def _send(self, code: int, body: bytes, ctype: str = "application/json"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _json(self, obj, code: int = 200):
        self._send(code, json.dumps(obj, default=str).encode())

    def do_GET(self):  # noqa: N802
        path = self.path.split("?")[0]
        if path in ("/", "/index.html"):
            self._send(200, _APP_HTML.read_bytes(), "text/html; charset=utf-8")
        elif path == "/api/meta":
            import yaml

            from pinnrl_tpu.config import VALID_ARCHITECTURES, _DEFAULT_YAML
            from pinnrl_tpu.datasets import WELL_REGISTRY
            from pinnrl_tpu.pdes import PDE_REGISTRY

            # Per-PDE coefficient dict so the New Training form can render
            # per-parameter initial-guess inputs (reference: dashboard.py:1876-1917).
            raw = yaml.safe_load(Path(_DEFAULT_YAML).read_text()) or {}
            pde_parameters = {
                k: (v or {}).get("parameters", {})
                for k, v in (raw.get("pde_configs") or {}).items()
            }

            self._json(
                {
                    "pdes": PDE_REGISTRY,
                    "pde_parameters": pde_parameters,
                    "architectures": list(VALID_ARCHITECTURES),
                    "datasets": {
                        k: {
                            "description": v.description,
                            "dims": v.n_spatial_dims,
                            "fields": list(v.fields),
                            "mode": v.recommended_mode,
                            "architecture": v.default_architecture,
                        }
                        for k, v in WELL_REGISTRY.items()
                    },
                    "strategies": ["uniform", "stratified", "residual_based", "adaptive"],
                    "optimizers": ["adam", "lbfgs", "adam_lbfgs"],
                    "modes": ["forward", "inverse", "data_only", "data_augmented"],
                }
            )
        elif path == "/api/experiments":
            self._json(get_experiments(self.results_dir))
        elif path.startswith("/api/experiment/"):
            parts = path.split("/")
            if len(parts) >= 5:
                name, what = parts[3], parts[4]
                exp = self.results_dir / name
                if not exp.is_dir() or "/" in name or ".." in name:
                    self._json({"error": "not found"}, 404)
                    return
                if what == "history":
                    self._json(_read_json(exp / "history.json") or {})
                elif what == "snapshot":
                    snap = load_snapshot(exp)
                    self._json(snap if snap else {"error": "no snapshot"})
                elif what == "metadata":
                    self._json(_read_json(exp / "metadata.json") or {})
                elif what == "solution":
                    sol = load_solution(exp)
                    self._json(sol if sol else {"error": "no final model"})
                elif what == "viz":
                    # Saved visualization PNGs (reference: dashboard.py:2351-2425).
                    viz = exp / "visualizations"
                    if len(parts) >= 6 and parts[5]:
                        fname = parts[5]
                        target = viz / fname
                        if (
                            "/" in fname or ".." in fname
                            or not target.exists() or target.suffix != ".png"
                        ):
                            self._json({"error": "not found"}, 404)
                        else:
                            self._send(200, target.read_bytes(), "image/png")
                    else:
                        names = (
                            sorted(p.name for p in viz.glob("*.png"))
                            if viz.is_dir() else []
                        )
                        self._json({"images": names})
                elif what == "report":
                    # Downloadable self-contained HTML report
                    # (reference: dashboard.py:2091-2127).
                    report = exp / "report.html"
                    if not report.exists():
                        from pinnrl_tpu.utils.plotting import create_interactive_report

                        create_interactive_report(exp)
                    if report.exists():
                        self._send(200, report.read_bytes(), "text/html; charset=utf-8")
                    else:
                        self._json({"error": "no report"}, 404)
                else:
                    self._json({"error": "unknown endpoint"}, 404)
            else:
                self._json({"error": "bad path"}, 400)
        else:
            self._json({"error": "not found"}, 404)

    def do_POST(self):  # noqa: N802
        if self.path.split("?")[0] == "/api/launch":
            length = int(self.headers.get("Content-Length", 0))
            try:
                params = json.loads(self.rfile.read(length) or b"{}")
                info = launch_trainer(params, self.results_dir)
                self._json({"ok": True, **info})
            except Exception as exc:
                self._json({"ok": False, "error": str(exc)}, 500)
        else:
            self._json({"error": "not found"}, 404)


class DashboardServer:
    def __init__(self, results_dir: str = "experiments", port: int = 8050):
        self.results_dir = Path(results_dir)
        self.port = port
        handler = type("Handler", (_Handler,), {"results_dir": self.results_dir})
        self.httpd = ThreadingHTTPServer(("0.0.0.0", port), handler)

    def serve_forever(self):
        logger.info("Dashboard at http://localhost:%d", self.port)
        self.httpd.serve_forever()

    def shutdown(self):
        self.httpd.shutdown()


def run_dashboard(results_dir: str = "experiments", port: int = 8050, max_tries: int = 10):
    """Start with port retry (reference: pinnrl/main.py:12-44,73-82)."""
    for i in range(max_tries):
        try:
            server = DashboardServer(results_dir, port + i)
            print(f"pinnrl-tpu dashboard: http://localhost:{port + i}")
            server.serve_forever()
            return
        except OSError:
            continue
    raise RuntimeError(f"No free port in [{port}, {port + max_tries})")
