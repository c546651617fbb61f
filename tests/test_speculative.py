# SPDX-License-Identifier: Apache-2.0
"""Speculative decoding: greedy losslessness + acceptance accounting."""

import numpy as np
import pytest

from vllm_mlx_tpu.config import ModelConfig
from vllm_mlx_tpu.core.speculative import (
    speculative_generate,
    verify_greedy,
)
from vllm_mlx_tpu.models import loader

from test_scheduler import reference_greedy, tiny_cfg, tiny_params  # noqa: F401

EOS = 1


@pytest.fixture(scope="module")
def draft_cfg():
    # smaller draft model (1 layer)
    return ModelConfig(
        model_type="llama", vocab_size=128, hidden_size=32,
        intermediate_size=64, num_hidden_layers=1, num_attention_heads=2,
        num_key_value_heads=2, eos_token_ids=[EOS], dtype="float32",
    )


@pytest.fixture(scope="module")
def draft_params(draft_cfg):
    return loader.init_params(draft_cfg, seed=11, dtype="float32")


def test_lossless_vs_target_greedy(
    tiny_cfg, tiny_params, draft_cfg, draft_params, rng
):
    """Speculative output must be token-identical to target-only greedy,
    regardless of draft quality."""
    for k in (1, 2, 4):
        prompt = rng.integers(2, 128, size=9).tolist()
        expected = reference_greedy(tiny_params, tiny_cfg, prompt, 12)
        out, stats = speculative_generate(
            tiny_params, tiny_cfg, draft_params, draft_cfg,
            prompt, max_tokens=12, k=k, stop_tokens={EOS},
        )
        assert out == expected, f"k={k}"
        assert stats.verify_calls >= 1


def test_perfect_draft_accepts_everything(tiny_cfg, tiny_params, rng):
    """draft == target -> every draft token accepted (k per verify)."""
    prompt = rng.integers(2, 128, size=7).tolist()
    out, stats = speculative_generate(
        tiny_params, tiny_cfg, tiny_params, tiny_cfg,
        prompt, max_tokens=9, k=3, stop_tokens={EOS},
    )
    expected = reference_greedy(tiny_params, tiny_cfg, prompt, 9)
    assert out == expected
    if stats.drafts:
        assert stats.acceptance_rate == 1.0


def test_verify_bonus_token(tiny_cfg, tiny_params, rng):
    """A wrong draft still yields >= 1 token (the target's own)."""
    import jax.numpy as jnp

    from vllm_mlx_tpu.models import decoder

    prompt = rng.integers(2, 128, size=6).tolist()
    logits = decoder.dense_forward(tiny_params, tiny_cfg, jnp.asarray(prompt))
    true_next = int(jnp.argmax(logits[-1]))
    wrong = (true_next + 1) % 128
    accepted, n_acc = verify_greedy(
        tiny_params, tiny_cfg, prompt, [wrong, wrong]
    )
    assert n_acc == 0
    assert accepted == [true_next]
