"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The reference pins all tests to CPU (reference: tests/unit_tests/test_trainer.py:22);
here we additionally expose 8 virtual XLA host devices so sharding/pjit paths are
exercised without TPU hardware.
"""

import os

# Must be set before jax initializes its backends. Note: this environment may
# pre-set JAX_PLATFORMS to a TPU plugin; jax.config.update overrides reliably.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
