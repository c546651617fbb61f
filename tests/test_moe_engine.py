# SPDX-License-Identifier: Apache-2.0
"""Qwen3-MoE through the serving engine + --moe-top-k expert reduction
(the reference documents but doesn't ship this feature,
SURVEY.md section 0.5; docs/guides/moe-top-k.md)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_mlx_tpu.config import CacheConfig, ModelConfig, SchedulerConfig
from vllm_mlx_tpu.core.model_runner import ModelRunner
from vllm_mlx_tpu.core.scheduler import Scheduler
from vllm_mlx_tpu.models import decoder, loader

from test_scheduler import _req, reference_greedy, run_to_completion

EOS = 1


@pytest.fixture(scope="module")
def moe_cfg():
    return ModelConfig(
        model_type="qwen3_moe",
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        use_qk_norm=True,
        num_experts=8,
        num_experts_per_tok=4,
        moe_intermediate_size=32,
        norm_topk_prob=True,
        eos_token_ids=[EOS],
        dtype="float32",
    )


@pytest.fixture(scope="module")
def moe_params(moe_cfg):
    return loader.init_params(moe_cfg, seed=3, dtype="float32")


def _sched(moe_cfg, moe_params, moe_top_k=None):
    cache = CacheConfig(block_size=8, num_blocks=64, kv_dtype="float32")
    sc = SchedulerConfig(
        max_num_seqs=4, max_prefill_tokens=64,
        prefill_chunk_sizes=[16, 64], max_model_len=256,
        moe_top_k=moe_top_k,
    )
    runner = ModelRunner(moe_cfg, moe_params, cache, sc)
    return Scheduler(runner, tokenizer=None, stop_tokens={EOS})


def test_moe_batched_matches_dense(moe_cfg, moe_params, rng):
    prompts = [rng.integers(2, 128, size=n).tolist() for n in (5, 12)]
    sched = _sched(moe_cfg, moe_params)
    for i, p in enumerate(prompts):
        sched.add_request(_req(f"r{i}", p, max_tokens=6))
    outs = run_to_completion(sched)
    for i, p in enumerate(prompts):
        expected = reference_greedy(moe_params, moe_cfg, p, 6)
        assert outs[f"r{i}"].output_token_ids == expected


def test_moe_top_k_override(moe_cfg, moe_params, rng):
    """moe_top_k clamps experts-per-token; output matches a dense forward
    computed with the same clamp."""
    prompt = rng.integers(2, 128, size=9).tolist()
    sched = _sched(moe_cfg, moe_params, moe_top_k=2)
    sched.add_request(_req("a", prompt, max_tokens=6))
    outs = run_to_completion(sched)

    seq = list(prompt)
    expected = []
    for _ in range(6):
        logits = decoder.dense_forward(
            moe_params, moe_cfg, jnp.asarray(seq), moe_top_k=2
        )
        nxt = int(jnp.argmax(logits[-1]))
        if nxt == EOS:
            break
        expected.append(nxt)
        seq.append(nxt)
    assert outs["a"].output_token_ids == expected


def test_moe_top_k_changes_routing(moe_cfg, moe_params, rng):
    tokens = jnp.asarray(rng.integers(2, 128, size=16))
    full = decoder.dense_forward(moe_params, moe_cfg, tokens)
    clamped = decoder.dense_forward(moe_params, moe_cfg, tokens, moe_top_k=1)
    assert not np.allclose(np.asarray(full), np.asarray(clamped))
