# SPDX-License-Identifier: Apache-2.0
"""Model-family parity batch 2 (round 3): Apertus (xIELU), GPT-BigCode
(learned absolute positions + MQA), Falcon (parallel block + fused MQA
qkv), SmolLM3 (explicit per-layer NoPE), OLMoE (flat qk-norm MoE) and
StableLM (partial rotary + LayerNorm + optional parallel residual).

Same harness as test_new_families.py: HF greedy-exact logits parity +
token-identical served generation through the real scheduler. The
reference serves these families via mlx-lm (reference
models/llm.py:40)."""

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
    return rng.integers(2, 250, size=12).tolist()


class TestApertus:
    """Apertus (HF ApertusForCausalLM): per-head qk RMSNorm + gateless
    xIELU MLP with per-layer learnable alpha_p/alpha_n (transformers
    XIELUActivation._xielu_python)."""

    def _model(self):
        from transformers import ApertusConfig, ApertusForCausalLM

        torch.manual_seed(31)
        cfg = ApertusConfig(
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=512,
            attn_implementation="eager",
        )
        m = ApertusForCausalLM(cfg).eval()
        # nudge the learnable activation params off init so the test
        # actually exercises the softplus mapping
        with torch.no_grad():
            for layer in m.model.layers:
                layer.mlp.act_fn.alpha_p.add_(0.3)
                layer.mlp.act_fn.alpha_n.sub_(0.2)
        return m

    def test_logits_parity(self, tmp_path, token_ids):
        path, cfg, params = _assert_parity(
            self._model(), tmp_path, token_ids
        )
        assert cfg.hidden_act == "xielu" and cfg.use_qk_norm
        assert "xielu_alpha_p" in params["layers"][0]["mlp"]

    def test_served_greedy_identity(self, tmp_path, rng):
        model = self._model()
        path, cfg, params = _assert_parity(
            model, tmp_path, rng.integers(2, 250, size=16).tolist()
        )
        _assert_served_greedy(
            model, path, cfg, params,
            {
                "a": rng.integers(2, 250, size=21).tolist(),
                "b": rng.integers(2, 250, size=9).tolist(),
            },
        )


class TestGptBigcode:
    """GPT-BigCode / StarCoder-1 (HF GPTBigCodeForCausalLM): learned
    absolute position embeddings (wpe, no rope), MQA with a fused
    c_attn, plain LayerNorms, gateless tanh-gelu MLP."""

    def _model(self):
        from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

        torch.manual_seed(32)
        cfg = GPTBigCodeConfig(
            vocab_size=256,
            n_embd=64,
            n_layer=2,
            n_head=4,
            n_positions=512,
            multi_query=True,
            attn_implementation="eager",
        )
        return GPTBigCodeForCausalLM(cfg).eval()

    def test_logits_parity(self, tmp_path, token_ids):
        path, cfg, params = _assert_parity(
            self._model(), tmp_path, token_ids
        )
        assert cfg.learned_pos_embed and not cfg.use_rope
        assert cfg.num_key_value_heads == 1
        assert "pos_embed" in params

    def test_served_greedy_identity(self, tmp_path, rng):
        model = self._model()
        path, cfg, params = _assert_parity(
            model, tmp_path, rng.integers(2, 250, size=16).tolist()
        )
        _assert_served_greedy(
            model, path, cfg, params,
            {
                "a": rng.integers(2, 250, size=21).tolist(),
                "b": rng.integers(2, 250, size=9).tolist(),
            },
        )


class TestFalcon:
    """Falcon 7B-class (HF FalconForCausalLM, classic layout): fused
    MQA query_key_value, parallel attention+MLP over ONE layernorm,
    gateless (exact) gelu MLP, bias-free projections."""

    def _model(self):
        from transformers import FalconConfig, FalconForCausalLM

        torch.manual_seed(33)
        cfg = FalconConfig(
            vocab_size=256,
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            new_decoder_architecture=False,
            multi_query=True,
            parallel_attn=True,
            bias=False,
            alibi=False,
            attn_implementation="eager",
        )
        return FalconForCausalLM(cfg).eval()

    def test_logits_parity(self, tmp_path, token_ids):
        path, cfg, params = _assert_parity(
            self._model(), tmp_path, token_ids
        )
        assert cfg.parallel_residual and cfg.num_key_value_heads == 1
        assert cfg.norm_type == "layernorm"

    def test_served_greedy_identity(self, tmp_path, rng):
        model = self._model()
        path, cfg, params = _assert_parity(
            model, tmp_path, rng.integers(2, 250, size=16).tolist()
        )
        _assert_served_greedy(
            model, path, cfg, params,
            {
                "a": rng.integers(2, 250, size=21).tolist(),
                "b": rng.integers(2, 250, size=9).tolist(),
            },
        )


class TestSmolLM3:
    """SmolLM3 (HF SmolLM3ForCausalLM): llama stack with explicit
    per-layer NoPE (no_rope_layers[i] == 0 -> no rotary on layer i)."""

    def _model(self):
        from transformers import SmolLM3Config, SmolLM3ForCausalLM

        torch.manual_seed(34)
        cfg = SmolLM3Config(
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=4,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=512,
            no_rope_layers=[1, 1, 0, 1],  # layer 2 NoPE
            pad_token_id=0,  # default 128004 overflows the tiny vocab
            attn_implementation="eager",
        )
        return SmolLM3ForCausalLM(cfg).eval()

    def test_logits_parity(self, tmp_path, token_ids):
        path, cfg, _ = _assert_parity(self._model(), tmp_path, token_ids)
        assert cfg.nope_layers == [2]

    def test_served_greedy_identity(self, tmp_path, rng):
        model = self._model()
        path, cfg, params = _assert_parity(
            model, tmp_path, rng.integers(2, 250, size=16).tolist()
        )
        _assert_served_greedy(
            model, path, cfg, params,
            {
                "a": rng.integers(2, 250, size=21).tolist(),
                "b": rng.integers(2, 250, size=9).tolist(),
            },
        )


class TestOlmoe:
    """OLMoE (HF OlmoeForCausalLM): full-width flat qk RMSNorm +
    softmax-then-topk MoE routing WITHOUT weight renorm."""

    def _model(self):
        from transformers import OlmoeConfig, OlmoeForCausalLM

        torch.manual_seed(35)
        cfg = OlmoeConfig(
            vocab_size=256,
            hidden_size=64,
            intermediate_size=96,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            num_experts=4,
            num_experts_per_tok=2,
            norm_topk_prob=False,
            max_position_embeddings=512,
            attn_implementation="eager",
        )
        return OlmoeForCausalLM(cfg).eval()

    def test_logits_parity(self, tmp_path, token_ids):
        path, cfg, params = _assert_parity(
            self._model(), tmp_path, token_ids
        )
        assert cfg.qk_norm_flat and cfg.num_experts == 4
        assert not cfg.norm_topk_prob
        assert "moe" in params["layers"][0]

    def test_served_greedy_identity(self, tmp_path, rng):
        model = self._model()
        path, cfg, params = _assert_parity(
            model, tmp_path, rng.integers(2, 250, size=16).tolist()
        )
        _assert_served_greedy(
            model, path, cfg, params,
            {
                "a": rng.integers(2, 250, size=21).tolist(),
                "b": rng.integers(2, 250, size=9).tolist(),
            },
        )


class TestStableLm:
    """StableLM (HF StableLmForCausalLM): partial rotary (0.25),
    LayerNorm (weight+bias) norms, gated silu MLP."""

    def _model(self, parallel=False):
        from transformers import StableLmConfig, StableLmForCausalLM

        torch.manual_seed(36)
        cfg = StableLmConfig(
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            partial_rotary_factor=0.25,
            use_parallel_residual=parallel,
            use_qkv_bias=not parallel,
            max_position_embeddings=512,
            attn_implementation="eager",
        )
        return StableLmForCausalLM(cfg).eval()

    def test_logits_parity(self, tmp_path, token_ids):
        path, cfg, _ = _assert_parity(self._model(), tmp_path, token_ids)
        assert cfg.partial_rotary_factor == 0.25
        assert cfg.norm_type == "layernorm"

    def test_parallel_residual_parity(self, tmp_path, token_ids):
        path, cfg, _ = _assert_parity(
            self._model(parallel=True), tmp_path, token_ids
        )
        assert cfg.parallel_residual

    def test_served_greedy_identity(self, tmp_path, rng):
        model = self._model()
        path, cfg, params = _assert_parity(
            model, tmp_path, rng.integers(2, 250, size=16).tolist()
        )
        _assert_served_greedy(
            model, path, cfg, params,
            {
                "a": rng.integers(2, 250, size=21).tolist(),
                "b": rng.integers(2, 250, size=9).tolist(),
            },
        )
