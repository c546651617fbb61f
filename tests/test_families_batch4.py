# SPDX-License-Identifier: Apache-2.0
"""Model-family parity batch 4 (round 3): OLMo v1 (non-parametric
LayerNorms + qkv clamp), Persimmon (interleaved fused qkv + per-head
qk LayerNorm with bias) and FlexOlmo (post-norm MoE).

Same harness as test_new_families.py."""

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
    return rng.integers(4, 90, size=12).tolist()


def _serve(model, tmp_path, rng):
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


class TestOlmo:
    """OLMo v1 (HF OlmoForCausalLM): non-parametric LayerNorms (no
    norm tensors in the checkpoint) + optional qkv clamp."""

    def _model(self, clip=4.0):
        from transformers import OlmoConfig, OlmoForCausalLM

        torch.manual_seed(51)
        cfg = OlmoConfig(
            vocab_size=100, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, clip_qkv=clip,
            max_position_embeddings=512, attn_implementation="eager",
        )
        return OlmoForCausalLM(cfg).eval()

    def test_logits_parity(self, tmp_path, token_ids):
        path, cfg, params = _assert_parity(
            self._model(), tmp_path, token_ids
        )
        assert cfg.norm_type == "layernorm_noparam"
        assert cfg.clip_qkv == 4.0
        assert "input_layernorm" not in params["layers"][0]

    def test_no_clip_parity(self, tmp_path, token_ids):
        path, cfg, _ = _assert_parity(
            self._model(clip=None), tmp_path, token_ids
        )
        assert cfg.clip_qkv is None

    def test_served_greedy_identity(self, tmp_path, rng):
        _serve(self._model(), tmp_path, rng)


class TestPersimmon:
    """Persimmon (HF PersimmonForCausalLM): NeoX-interleaved fused
    qkv + per-head qk LayerNorm with weight AND bias + partial rotary
    + gateless relu^2 MLP with biases."""

    def _model(self):
        from transformers import PersimmonConfig, PersimmonForCausalLM

        torch.manual_seed(52)
        cfg = PersimmonConfig(
            vocab_size=100, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            partial_rotary_factor=0.5, qk_layernorm=True,
            max_position_embeddings=512, attn_implementation="eager",
        )
        return PersimmonForCausalLM(cfg).eval()

    def test_logits_parity(self, tmp_path, token_ids):
        path, cfg, params = _assert_parity(
            self._model(), tmp_path, token_ids
        )
        assert cfg.qk_norm_layernorm and cfg.partial_rotary_factor == 0.5
        assert "q_norm_bias" in params["layers"][0]

    def test_served_greedy_identity(self, tmp_path, rng):
        _serve(self._model(), tmp_path, rng)


class TestFlexOlmo:
    """FlexOlmo (HF FlexOlmoForCausalLM): OLMo-2 post-norm blocks +
    flat qk RMSNorm + OLMoE-style MoE without renorm."""

    def _model(self):
        from transformers import FlexOlmoConfig, FlexOlmoForCausalLM

        torch.manual_seed(53)
        cfg = FlexOlmoConfig(
            vocab_size=100, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, num_experts=4,
            num_experts_per_tok=2, pad_token_id=0,
            max_position_embeddings=512, attn_implementation="eager",
        )
        return FlexOlmoForCausalLM(cfg).eval()

    def test_logits_parity(self, tmp_path, token_ids):
        path, cfg, params = _assert_parity(
            self._model(), tmp_path, token_ids
        )
        assert cfg.post_norm_blocks and cfg.qk_norm_flat
        assert "moe" in params["layers"][0]

    def test_served_greedy_identity(self, tmp_path, rng):
        _serve(self._model(), tmp_path, rng)


class TestCohere2:
    """Cohere2 / Command R7B (HF Cohere2ForCausalLM): Cohere parallel
    block + sliding/full interleave where FULL layers are NoPE."""

    def _model(self):
        from transformers import Cohere2Config, Cohere2ForCausalLM

        torch.manual_seed(54)
        cfg = Cohere2Config(
            vocab_size=100, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, sliding_window=8,
            sliding_window_pattern=2, logit_scale=0.25,
            max_position_embeddings=512, attn_implementation="eager",
        )
        return Cohere2ForCausalLM(cfg).eval()

    def test_logits_parity(self, tmp_path, token_ids):
        path, cfg, _ = _assert_parity(self._model(), tmp_path, token_ids)
        assert cfg.nope_full_layers and cfg.parallel_residual
        assert cfg.layer_types[:2] == [
            "sliding_attention", "full_attention",
        ]

    def test_served_greedy_identity(self, tmp_path, rng):
        _serve(self._model(), tmp_path, rng)


class TestHelium:
    """Helium (Kyutai, HF HeliumForCausalLM): llama-shaped stack — the
    default config mapping must serve it as-is."""

    def _model(self):
        from transformers import HeliumConfig, HeliumForCausalLM

        torch.manual_seed(55)
        cfg = HeliumConfig(
            vocab_size=100, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
            max_position_embeddings=512, attn_implementation="eager",
        )
        return HeliumForCausalLM(cfg).eval()

    def test_logits_parity(self, tmp_path, token_ids):
        _assert_parity(self._model(), tmp_path, token_ids)

    def test_served_greedy_identity(self, tmp_path, rng):
        _serve(self._model(), tmp_path, rng)


class TestPhiMoe:
    """PhiMoE / Phi-3.5-MoE (HF PhimoeForCausalLM): LayerNorm norms,
    mixtral expert layout with SPARSEMIXER top-2 routing, biased
    lm_head."""

    def _model(self):
        from transformers import PhimoeConfig, PhimoeForCausalLM

        torch.manual_seed(56)
        cfg = PhimoeConfig(
            vocab_size=100, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, num_local_experts=4,
            num_experts_per_tok=2, router_jitter_noise=0.01,
            input_jitter_noise=0.0,
            max_position_embeddings=512, attn_implementation="eager",
        )
        return PhimoeForCausalLM(cfg).eval()

    def test_logits_parity(self, tmp_path, token_ids):
        path, cfg, params = _assert_parity(
            self._model(), tmp_path, token_ids
        )
        assert cfg.moe_style == "phimoe"
        assert cfg.norm_type == "layernorm"
        assert "moe" in params["layers"][0]

    def test_served_greedy_identity(self, tmp_path, rng):
        _serve(self._model(), tmp_path, rng)


class TestPhi3LongRope:
    """Phi-3 with longrope scaling: original_max=8 < prompt length, so
    BOTH sides run the long factor set with the sqrt attention factor
    (HF's dynamic switch selects long for the whole forward once the
    sequence exceeds original_max)."""

    def _model(self):
        from transformers import Phi3Config, Phi3ForCausalLM

        torch.manual_seed(57)
        cfg = Phi3Config(
            vocab_size=100, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=256,
            original_max_position_embeddings=8,
            pad_token_id=0,
            rope_scaling={
                "type": "longrope",
                "short_factor": [1.0] * 8,
                "long_factor": [1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 4.5],
            },
            attn_implementation="eager",
        )
        return Phi3ForCausalLM(cfg).eval()

    def test_logits_parity_long_mode(self, tmp_path, rng):
        # prompt longer than original_max: HF switches to long factors
        path, cfg, _ = _assert_parity(
            self._model(), tmp_path, rng.integers(4, 90, size=24).tolist()
        )
        rs = cfg.rope_scaling
        assert rs["max_position_embeddings"] == 256
        assert rs["original_max_position_embeddings"] == 8

    def test_served_greedy_identity(self, tmp_path, rng):
        model = self._model()
        path, cfg, params = _assert_parity(
            model, tmp_path, rng.integers(4, 90, size=24).tolist()
        )
        _assert_served_greedy(
            model, path, cfg, params,
            {"a": rng.integers(4, 90, size=21).tolist()},
        )
