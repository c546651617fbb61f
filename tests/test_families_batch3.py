# SPDX-License-Identifier: Apache-2.0
"""Model-family parity batch 3 (round 3): GPT-2, GPT-NeoX/Pythia,
Arcee, dots.llm1, Hunyuan-MoE and GraniteMoeShared.

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


class TestGpt2:
    """GPT-2 (HF GPT2LMHeadModel): learned absolute positions, fused
    MHA c_attn with Conv1D TRANSPOSED weights, tanh-gelu MLP."""

    def _model(self):
        from transformers import GPT2Config, GPT2LMHeadModel

        torch.manual_seed(41)
        cfg = GPT2Config(
            vocab_size=100, n_embd=64, n_layer=2, n_head=4,
            n_positions=512, attn_implementation="eager",
        )
        return GPT2LMHeadModel(cfg).eval()

    def test_logits_parity(self, tmp_path, token_ids):
        path, cfg, params = _assert_parity(
            self._model(), tmp_path, token_ids
        )
        assert cfg.learned_pos_embed and not cfg.use_rope
        assert cfg.num_key_value_heads == cfg.num_attention_heads

    def test_served_greedy_identity(self, tmp_path, rng):
        _serve(self._model(), tmp_path, rng)


class TestGptNeoX:
    """GPT-NeoX / Pythia (HF GPTNeoXForCausalLM): per-head interleaved
    fused qkv, partial rotary, parallel residual with a SEPARATE
    pre-MLP norm."""

    def _model(self, parallel=True):
        from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

        torch.manual_seed(42)
        cfg = GPTNeoXConfig(
            vocab_size=100, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            rotary_pct=0.25, use_parallel_residual=parallel,
            max_position_embeddings=512, attn_implementation="eager",
        )
        return GPTNeoXForCausalLM(cfg).eval()

    def test_logits_parity(self, tmp_path, token_ids):
        path, cfg, _ = _assert_parity(self._model(), tmp_path, token_ids)
        assert cfg.parallel_residual_separate_norms
        assert cfg.partial_rotary_factor == 0.25

    def test_sequential_variant_parity(self, tmp_path, token_ids):
        path, cfg, _ = _assert_parity(
            self._model(parallel=False), tmp_path, token_ids
        )
        assert not cfg.parallel_residual

    def test_served_greedy_identity(self, tmp_path, rng):
        _serve(self._model(), tmp_path, rng)


class TestArcee:
    """Arcee/AFM (HF ArceeForCausalLM): llama with gateless relu^2."""

    def _model(self):
        from transformers import ArceeConfig, ArceeForCausalLM

        torch.manual_seed(43)
        cfg = ArceeConfig(
            vocab_size=100, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=512,
            attn_implementation="eager",
        )
        return ArceeForCausalLM(cfg).eval()

    def test_logits_parity(self, tmp_path, token_ids):
        path, cfg, _ = _assert_parity(self._model(), tmp_path, token_ids)
        assert cfg.hidden_act == "relu2"

    def test_served_greedy_identity(self, tmp_path, rng):
        _serve(self._model(), tmp_path, rng)


class TestDots1:
    """dots.llm1 (HF Dots1ForCausalLM): per-head qk-norm over a
    DeepSeek-V3-style MoE (sigmoid + e_score bias selection, shared
    experts, first-k dense)."""

    def _model(self):
        from transformers import Dots1Config, Dots1ForCausalLM

        torch.manual_seed(44)
        cfg = Dots1Config(
            vocab_size=100, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
            n_routed_experts=4, num_experts_per_tok=2,
            first_k_dense_replace=1, moe_intermediate_size=32,
            n_shared_experts=1, routed_scaling_factor=1.5,
            norm_topk_prob=True, n_group=2, topk_group=1,
            max_position_embeddings=512, attn_implementation="eager",
        )
        m = Dots1ForCausalLM(cfg).eval()
        with torch.no_grad():  # exercise the selection bias
            for layer in m.model.layers[1:]:
                layer.mlp.gate.e_score_correction_bias.add_(
                    torch.linspace(-0.4, 0.4, 4)
                )
        return m

    def test_logits_parity(self, tmp_path, token_ids):
        path, cfg, params = _assert_parity(
            self._model(), tmp_path, token_ids
        )
        assert cfg.moe_topk_method == "noaux_tc" and cfg.use_qk_norm
        assert cfg.first_k_dense == 1
        assert "shared_mlp" in params["layers"][1]

    def test_served_greedy_identity(self, tmp_path, rng):
        _serve(self._model(), tmp_path, rng)


class TestHunyuanMoe:
    """Hunyuan MoE (HF HunYuanMoEV1Moe): post-rope per-head qk-norm +
    softmax-topk-renorm routing + an always-on shared MLP."""

    def _model(self):
        from transformers import HunYuanMoEV1Config, HunYuanMoEV1ForCausalLM

        torch.manual_seed(45)
        cfg = HunYuanMoEV1Config(
            vocab_size=100, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
            num_experts=4, moe_topk=2,
            max_position_embeddings=512, attn_implementation="eager",
        )
        return HunYuanMoEV1ForCausalLM(cfg).eval()

    def test_logits_parity(self, tmp_path, token_ids):
        path, cfg, params = _assert_parity(
            self._model(), tmp_path, token_ids
        )
        assert cfg.qk_norm_after_rope and cfg.num_experts == 4
        assert "shared_mlp" in params["layers"][0]

    def test_served_greedy_identity(self, tmp_path, rng):
        _serve(self._model(), tmp_path, rng)


class TestGraniteMoeShared:
    """GraniteMoeShared (HF GraniteMoeSharedForCausalLM): GraniteMoE
    routing/experts + fused-GLU shared MLP on every layer."""

    def _model(self):
        from transformers import (
            GraniteMoeSharedConfig,
            GraniteMoeSharedForCausalLM,
        )

        torch.manual_seed(46)
        cfg = GraniteMoeSharedConfig(
            vocab_size=100, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, num_local_experts=4,
            num_experts_per_tok=2, shared_intermediate_size=80,
            embedding_multiplier=2.0, attention_multiplier=0.1,
            residual_multiplier=0.5, logits_scaling=1.5,
            max_position_embeddings=512, attn_implementation="eager",
        )
        return GraniteMoeSharedForCausalLM(cfg).eval()

    def test_logits_parity(self, tmp_path, token_ids):
        path, cfg, params = _assert_parity(
            self._model(), tmp_path, token_ids
        )
        assert cfg.moe_style == "granite"
        assert "input_w" in params["layers"][0]["shared_mlp"]

    def test_served_greedy_identity(self, tmp_path, rng):
        _serve(self._model(), tmp_path, rng)
