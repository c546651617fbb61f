# SPDX-License-Identifier: Apache-2.0
"""Multi-chip SPMD: mesh construction and sharding rules.

The reference has no distributed support (SURVEY.md section 2.8: its
communicator class points at a module that does not exist,
reference vllm_platform.py:324-325). The TPU build scales natively:
a ``jax.sharding.Mesh`` over ICI with GSPMD-propagated collectives —
no NCCL/MPI analogue needed.
"""

from .mesh import (  # noqa: F401
    make_mesh,
    shard_runner_state,
    shard_params,
    state_pspecs,
    param_pspecs,
)
