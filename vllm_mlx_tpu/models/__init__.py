# SPDX-License-Identifier: Apache-2.0
"""In-repo JAX model zoo (the TPU-native replacement for mlx-lm/mlx-vlm)."""
