"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The reference pins all tests to CPU (reference: tests/unit_tests/test_trainer.py:22);
here we additionally expose 8 virtual XLA host devices so sharding/pjit paths are
exercised without TPU hardware.
"""

import os

# Must be set before jax initializes its backends. Note: this environment may
# pre-set JAX_PLATFORMS to a TPU plugin; jax.config.update overrides reliably.
# PINNRL_TPU_TESTS=1 skips the CPU pin so the on-hardware kernel-parity tier
# (tests/test_pallas_parity_tpu.py) can see the real TPU backend.
_ON_TPU = os.environ.get("PINNRL_TPU_TESTS") == "1"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if not _ON_TPU and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


# ---------------------------------------------------------------------------
# Optional line coverage via scripts/covtool.py (PEP 669 sys.monitoring).
# Enabled when PINNRL_COV_DIR is set; xdist-safe (per-process JSON dumps
# merged by scripts/coverage_gate.py). Mirrors the reference CI's >=80%
# coverage gate (reference: .github/workflows/checks.yml:10-38).
# ---------------------------------------------------------------------------
_COV_DIR = os.environ.get("PINNRL_COV_DIR")
if _COV_DIR:
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent / "scripts"))
    import covtool as _covtool

    _covtool.start()

    def pytest_sessionfinish(session, exitstatus):
        _covtool.stop(_COV_DIR)


def pytest_collection_modifyitems(config, items):
    """Auto-apply the 'slow' marker from tests/slow_tests.txt.

    The fast tier (`pytest -m "not slow"`) is the per-change gate; the full
    suite (including slow end-to-end training smokes) is the nightly tier.
    """
    import pytest
    from pathlib import Path

    slow_file = Path(__file__).parent / "slow_tests.txt"
    if not slow_file.exists():
        return
    prefixes = [
        ln.strip()
        for ln in slow_file.read_text().splitlines()
        if ln.strip() and not ln.startswith("#")
    ]
    for item in items:
        if any(item.nodeid.startswith(p) for p in prefixes):
            item.add_marker(pytest.mark.slow)
