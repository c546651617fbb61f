# SPDX-License-Identifier: Apache-2.0
"""Multi-chip sharding dry run on the 8-device virtual CPU mesh."""

import sys
import os

import jax
import numpy as np
import pytest


def test_mesh_and_param_sharding():
    from vllm_mlx_tpu.config import ModelConfig
    from vllm_mlx_tpu.models import loader
    from vllm_mlx_tpu.parallel.mesh import (
        make_mesh,
        param_pspecs,
        shard_params,
        validate_tp,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = ModelConfig(
        model_type="qwen3", vocab_size=256, hidden_size=128,
        intermediate_size=256, num_hidden_layers=2, num_attention_heads=8,
        num_key_value_heads=8, head_dim=16, use_qk_norm=True, dtype="float32",
    )
    validate_tp(cfg, 8)
    mesh = make_mesh(dp=1, tp=8)
    params = loader.init_params(cfg, seed=0, dtype="float32")
    sharded = shard_params(mesh, params)
    q = sharded["layers"][0]["q_proj"]
    # q_proj [heads*hd, H] sharded over heads on tp=8
    assert q.sharding.shard_shape(q.shape)[0] == q.shape[0] // 8


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_graft_entry_compiles():
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    state, sampled, logprobs = out
    assert np.asarray(sampled).shape[0] == 4
