# SPDX-License-Identifier: Apache-2.0
"""Llama 4 family (HF Llama4ForCausalLM, modeling_llama4.py) — the
first row of the reference's supported-models table
(reference docs/reference/models.md:11 "Llama 3.x, 4.x", served there
via mlx-lm).

Mechanisms under test:
  * interleaved-pair complex rope (view_as_complex pairing == the
    GLM map at full head width)
  * weightless L2 qk-norm AFTER rope, rope layers only
  * every-4th-layer NoPE with temperature-tuned queries
    (arXiv 2501.19399) and FULL attention
  * CHUNKED attention on rope layers (attention_chunk_size — tiny
    chunk here so the mask bites inside the test prompts)
  * interleaved dense(intermediate_size_mlp) / MoE layers; sigmoid
    router scores scale the expert INPUTS; always-on shared expert
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
from test_new_families import (  # noqa: E402
    _assert_parity,
    _assert_served_greedy,
)


@pytest.fixture
def token_ids(rng):
    return rng.integers(4, 90, size=16).tolist()


def _model(chunk=8, moe_step=2, qk_norm=True, nope_interval=4):
    from transformers import Llama4ForCausalLM, Llama4TextConfig

    torch.manual_seed(71)
    cfg = Llama4TextConfig(
        vocab_size=100,
        hidden_size=64,
        intermediate_size=96,  # expert dim
        intermediate_size_mlp=128,  # dense-layer MLP dim
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        num_local_experts=4,
        num_experts_per_tok=1,
        interleave_moe_layer_step=moe_step,
        no_rope_layer_interval=nope_interval,
        attention_chunk_size=chunk,
        use_qk_norm=qk_norm,
        attn_temperature_tuning=True,
        floor_scale=4.0,  # query temperature varies within short prompts
        attn_scale=0.1,
        max_position_embeddings=512,
        attn_implementation="eager",
    )
    return Llama4ForCausalLM(cfg).eval()


class TestLlama4:
    def test_logits_parity(self, tmp_path, token_ids):
        _assert_parity(_model(), tmp_path, token_ids)

    def test_parity_no_qk_norm(self, tmp_path, token_ids):
        # the 128E (Maverick) geometry: no qk-norm, every-layer MoE
        _assert_parity(
            _model(qk_norm=False, moe_step=1), tmp_path, token_ids
        )

    def test_chunk_mask_is_load_bearing(self, tmp_path, token_ids):
        """Dropping the chunk mask must change the logits — guards
        against the chunk plumbing silently degrading to causal."""
        import jax.numpy as jnp

        from vllm_mlx_tpu.config import ModelConfig
        from vllm_mlx_tpu.models import decoder, loader

        model = _model(chunk=4)
        d = tmp_path / "ckpt"
        model.save_pretrained(d, safe_serialization=True)
        cfg = ModelConfig.from_pretrained(str(d))
        assert cfg.attn_chunk_size == 4
        assert cfg.layer_types[0] == "chunked_attention"
        assert cfg.layer_types[3] == "full_attention"
        assert cfg.nope_layers == [3]
        params = loader.load_params(str(d), cfg, dtype="float32")
        chunked = np.asarray(
            decoder.dense_forward(params, cfg, jnp.asarray(token_ids))
        )
        cfg.attn_chunk_size = None
        causal = np.asarray(
            decoder.dense_forward(params, cfg, jnp.asarray(token_ids))
        )
        assert np.abs(chunked - causal).max() > 1e-4

    def test_served_greedy_identity(self, tmp_path, rng):
        model = _model()
        path, cfg, params = _assert_parity(
            model, tmp_path, rng.integers(4, 90, size=16).tolist()
        )
        _assert_served_greedy(
            model, path, cfg, params,
            {
                "a": rng.integers(4, 90, size=21).tolist(),
                "b": rng.integers(4, 90, size=9).tolist(),
            },
        )
