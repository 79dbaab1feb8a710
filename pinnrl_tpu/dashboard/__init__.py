"""Training dashboard (reference: pinnrl/dashboard.py, 2,774 LoC Dash app).

Dependency-free redesign: a stdlib ``http.server`` backend serving JSON APIs
over the same experiment-directory file protocol, plus one self-contained
HTML/JS page (inline SVG loss curves, canvas heatmaps, 10 s polling — the
reference's ``dcc.Interval`` cadence, reference: dashboard.py:991-994).
The trainer remains a detached subprocess launched through the CLI
(reference: dashboard.py:1780-1785), so the UI stays crash-isolated.
"""

from pinnrl_tpu.dashboard.server import DashboardServer, run_dashboard  # noqa: F401
