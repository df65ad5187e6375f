"""Test configuration.

Runs the suite on CPU with 8 virtual devices so the multi-chip sharding
layer (lsqr_tpu.parallel) is exercised without TPU pod hardware, and enables
x64 — the conformance precision that reproduces the reference's real64
iteration counts (reference test strategy: SURVEY.md §4;
/root/reference/test/lsqrtest_module.f90).
"""

import os

# Force CPU: the session environment presets JAX_PLATFORMS=axon (the real
# TPU tunnel) and a sitecustomize imports jax before this file runs, so the
# env var alone is captured too early — update the config flag as well.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import numpy as np

    return np.random.default_rng(0)
