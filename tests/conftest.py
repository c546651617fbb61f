# SPDX-License-Identifier: Apache-2.0
"""Test bootstrap: force CPU backend with 8 virtual devices.

Unit tests exercise compute + engine logic on the CPU backend (the
reference's CI similarly splits MLX-free logic tests from Apple-Silicon
jobs, reference .github/workflows/ci.yml:68-104). Multi-chip sharding is
validated on an 8-device virtual CPU mesh. Real-TPU tests are marked
``tpu`` and excluded by default.
"""

import os

# Must happen before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Exact f32 matmuls for numeric parity tests (production runs bf16 weights,
# where XLA's default precision is already the bf16 MXU path).
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
