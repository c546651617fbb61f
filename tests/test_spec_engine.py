# SPDX-License-Identifier: Apache-2.0
"""Speculative decoding through the serving engine: greedy spec rounds
(draft-k + ragged verify + on-device accept/rollback) must be
token-identical to plain greedy decoding (the reference proves the same
property for its MTP patches, reference scheduler.py:699-1130)."""

import numpy as np
import pytest

from vllm_mlx_tpu.config import CacheConfig, ModelConfig, SchedulerConfig
from vllm_mlx_tpu.core.model_runner import ModelRunner
from vllm_mlx_tpu.core.request import Request, SamplingParams
from vllm_mlx_tpu.core.scheduler import Scheduler
from vllm_mlx_tpu.models import loader

from test_scheduler import (  # noqa: F401
    EOS,
    _req,
    reference_greedy,
    run_to_completion,
    tiny_cfg,
    tiny_params,
)


@pytest.fixture(scope="module")
def draft_cfg():
    return ModelConfig(
        model_type="llama",
        vocab_size=128,  # must match the target
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=1,
        max_position_embeddings=512,
        eos_token_ids=[EOS],
        dtype="float32",
    )


@pytest.fixture(scope="module")
def draft_params(draft_cfg):
    return loader.init_params(draft_cfg, seed=123, dtype="float32")


def make_spec_scheduler(
    tiny_cfg, tiny_params, draft_params, draft_cfg, *, k=3,
    num_blocks=64, block_size=8, max_num_seqs=4,
    stop_tokens=frozenset({EOS}),
):
    runner = ModelRunner(
        tiny_cfg,
        tiny_params,
        CacheConfig(
            block_size=block_size, num_blocks=num_blocks,
            kv_dtype="float32",
        ),
        SchedulerConfig(
            max_num_seqs=max_num_seqs,
            max_prefill_tokens=64,
            prefill_chunk_sizes=[16, 64],
            max_model_len=256,
        ),
    )
    runner.enable_speculative(draft_params, draft_cfg, k)
    return Scheduler(runner, tokenizer=None, stop_tokens=set(stop_tokens))


class TestSpeculativeEngine:
    def test_single_request_lossless(
        self, tiny_cfg, tiny_params, draft_params, draft_cfg, rng
    ):
        """Random (bad) draft: verify must reject, and outputs must equal
        plain greedy decoding exactly."""
        prompt = rng.integers(2, 128, size=7).tolist()
        expected = reference_greedy(tiny_params, tiny_cfg, prompt, 24)
        sched = make_spec_scheduler(
            tiny_cfg, tiny_params, draft_params, draft_cfg
        )
        sched.add_request(_req("a", prompt, max_tokens=24))
        outs = run_to_completion(sched)
        assert outs["a"].output_token_ids == expected
        assert outs["a"].mtp_drafts > 0  # spec rounds actually ran

    def test_self_draft_full_acceptance(
        self, tiny_cfg, tiny_params, rng
    ):
        """Draft == target: every draft token must be accepted."""
        prompt = rng.integers(2, 128, size=6).tolist()
        expected = reference_greedy(tiny_params, tiny_cfg, prompt, 20)
        sched = make_spec_scheduler(
            tiny_cfg, tiny_params, tiny_params, tiny_cfg, k=3
        )
        sched.add_request(_req("a", prompt, max_tokens=20))
        outs = run_to_completion(sched)
        assert outs["a"].output_token_ids == expected
        out = outs["a"]
        # self-draft acceptance should be ~100% (every verify matches)
        assert out.mtp_accepted >= 0.9 * min(out.mtp_drafts,
                                             len(expected))

    def test_batch_lossless(
        self, tiny_cfg, tiny_params, draft_params, draft_cfg, rng
    ):
        prompts = [rng.integers(2, 128, size=n).tolist() for n in (5, 11, 8)]
        sched = make_spec_scheduler(
            tiny_cfg, tiny_params, draft_params, draft_cfg, k=2
        )
        for i, p in enumerate(prompts):
            sched.add_request(_req(f"r{i}", p, max_tokens=16))
        outs = run_to_completion(sched)
        for i, p in enumerate(prompts):
            expected = reference_greedy(tiny_params, tiny_cfg, p, 16)
            assert outs[f"r{i}"].output_token_ids == expected, f"req {i}"

    def test_mixed_sampling_disables_spec_safely(
        self, tiny_cfg, tiny_params, draft_params, draft_cfg, rng
    ):
        """A sampled (non-greedy) request joining the batch must route
        everyone through the normal path without corrupting the greedy
        request's output."""
        p_greedy = rng.integers(2, 128, size=6).tolist()
        expected = reference_greedy(tiny_params, tiny_cfg, p_greedy, 18)
        sched = make_spec_scheduler(
            tiny_cfg, tiny_params, draft_params, draft_cfg
        )
        sched.add_request(_req("g", p_greedy, max_tokens=18))
        # let spec rounds start
        for _ in range(2):
            sched.step()
        sched.add_request(
            Request(
                request_id="s",
                prompt=rng.integers(2, 128, size=5).tolist(),
                sampling_params=SamplingParams(
                    temperature=0.8, max_tokens=10, seed=5
                ),
            )
        )
        outs = run_to_completion(sched)
        assert outs["g"].output_token_ids == expected
        assert outs["s"].finished

    def test_spec_with_prefill_chunking_and_slots(
        self, tiny_cfg, tiny_params, draft_params, draft_cfg, rng
    ):
        """Long prompts (chunked prefill maintains the draft KV) +
        more requests than slots."""
        prompts = [
            rng.integers(2, 128, size=n).tolist()
            for n in (40, 9, 25, 6, 13)
        ]
        sched = make_spec_scheduler(
            tiny_cfg, tiny_params, draft_params, draft_cfg,
            max_num_seqs=2, k=3,
        )
        for i, p in enumerate(prompts):
            sched.add_request(_req(f"r{i}", p, max_tokens=12))
        outs = run_to_completion(sched, max_steps=800)
        for i, p in enumerate(prompts):
            expected = reference_greedy(tiny_params, tiny_cfg, p, 12)
            assert outs[f"r{i}"].output_token_ids == expected, f"req {i}"

    def test_stop_token_mid_round(
        self, tiny_cfg, tiny_params, rng
    ):
        """EOS emitted inside a spec round finishes the request exactly
        there (self-draft so rounds emit k+1 tokens)."""
        prompt = rng.integers(2, 128, size=6).tolist()
        full = reference_greedy(tiny_params, tiny_cfg, prompt, 40, stop=())
        stop_at = full[5]
        first = full.index(stop_at)
        sched = make_spec_scheduler(
            tiny_cfg, tiny_params, tiny_params, tiny_cfg, k=3,
            stop_tokens=frozenset({stop_at}),
        )
        sched.add_request(_req("a", prompt, max_tokens=40))
        outs = run_to_completion(sched)
        assert outs["a"].output_token_ids == full[:first]
        assert outs["a"].finish_reason == "stop"
