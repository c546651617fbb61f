# SPDX-License-Identifier: Apache-2.0
"""Test bootstrap: force CPU backend with 8 virtual devices.

Unit tests exercise compute + engine logic on the CPU backend (the
reference's CI similarly splits MLX-free logic tests from Apple-Silicon
jobs, reference .github/workflows/ci.yml:68-104). Multi-chip sharding is
validated on an 8-device virtual CPU mesh. Real-TPU tests are marked
``tpu`` and excluded by default.
"""

import os

# The runtime pre-imports jax with JAX_PLATFORMS=axon (real TPU via a
# high-latency tunnel); the backend initializes lazily, so switching the
# platform via jax.config before first device use still works.
import jax  # noqa: E402

if not os.environ.get("VLLM_MLX_TPU_TEST_REAL_TPU"):
    # set VLLM_MLX_TPU_TEST_REAL_TPU=1 to run the ``tpu``-marked kernel
    # parity tests on the real chip: pytest -m tpu
    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Exact f32 matmuls for numeric parity tests (production runs bf16 weights,
# where XLA's default precision is already the bf16 MXU path). NOT on the
# real chip: Mosaic rejects "highest" for bf16 pallas-kernel dots
# ("Bad lhs type").
if not os.environ.get("VLLM_MLX_TPU_TEST_REAL_TPU"):
    jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: identical HLO across tests/runs compiles once.
from vllm_mlx_tpu.core.model_runner import (  # noqa: E402
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache("/tmp/vllm_mlx_tpu_test_jax_cache")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
