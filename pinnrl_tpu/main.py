"""``pinnrl-dashboard`` entry point (reference: pinnrl/main.py:12-87)."""

from __future__ import annotations

import argparse
import sys
import webbrowser


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pinnrl-dashboard", description=__doc__)
    p.add_argument("--port", type=int, default=8050)
    p.add_argument("--results-dir", default="experiments")
    p.add_argument("--no-browser", action="store_true")
    args = p.parse_args(argv)

    from pinnrl_tpu.dashboard import run_dashboard

    if not args.no_browser:
        try:
            webbrowser.open(f"http://localhost:{args.port}")
        except Exception:
            pass
    run_dashboard(results_dir=args.results_dir, port=args.port)
    return 0


if __name__ == "__main__":
    sys.exit(main())
