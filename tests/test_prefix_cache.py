# SPDX-License-Identifier: Apache-2.0
"""Prefix-cache behavior: hit classes, token-identical outputs on hits,
block refcounting, eviction under pressure.

Mirrors the reference's prefix cache suites (tests/test_prefix_cache.py,
tests/test_paged_cache_real_inference.py) at block granularity."""

import numpy as np
import pytest

from vllm_mlx_tpu.cache.prefix_cache import PrefixCache
from vllm_mlx_tpu.core.block_manager import BlockManager
from vllm_mlx_tpu.core.request import Request, SamplingParams

from test_scheduler import (  # noqa: F401  (fixtures)
    EOS,
    make_scheduler,
    reference_greedy,
    run_to_completion,
    tiny_cfg,
    tiny_params,
    _req,
)


class TestPrefixCacheIndex:
    def test_store_fetch_roundtrip(self):
        bm = BlockManager(num_blocks=32, block_size=4)
        pc = PrefixCache(block_size=4)
        tokens = list(range(100, 117))  # 17 tokens -> 4 full blocks
        blocks = bm.allocate(5)
        assert pc.store(bm, tokens, blocks)
        bm.free(blocks, cache=True)
        got, cached, hit = pc.fetch(bm, tokens)
        assert cached == 16
        assert hit == "exact"
        assert got == blocks[:4]
        # fetched blocks are referenced again
        assert all(bm.ref_count[b] == 1 for b in got)

    def test_partial_prefix_hit(self):
        bm = BlockManager(num_blocks=32, block_size=4)
        pc = PrefixCache(block_size=4)
        a = [1, 2, 3, 4, 5, 6, 7, 8, 9]
        blocks = bm.allocate(3)
        pc.store(bm, a, blocks)
        bm.free(blocks, cache=True)
        b = [1, 2, 3, 4, 9, 9, 9, 9, 9]  # shares first block only
        got, cached, hit = pc.fetch(bm, b)
        assert cached == 4
        assert hit == "prefix"

    def test_last_token_block_not_stored(self):
        # 8 tokens, block 4: only block 0 is fully KV-valid (token 7's
        # KV may be unwritten), so only 1 block is published.
        bm = BlockManager(num_blocks=32, block_size=4)
        pc = PrefixCache(block_size=4)
        tokens = [1, 2, 3, 4, 5, 6, 7, 8]
        blocks = bm.allocate(2)
        pc.store(bm, tokens, blocks)
        bm.free(blocks, cache=True)
        got, cached, hit = pc.fetch(bm, tokens)
        assert cached == 4

    def test_eviction_under_pressure(self):
        bm = BlockManager(num_blocks=6, block_size=4)  # 5 usable
        pc = PrefixCache(block_size=4)
        t1 = list(range(0, 9))
        b1 = bm.allocate(3)
        pc.store(bm, t1, b1)
        bm.free(b1, cache=True)
        assert bm.num_cached_blocks == 2
        # allocating all 5 usable blocks evicts the cached ones LRU-first
        b2 = bm.allocate(5)
        assert b2 is not None
        assert bm.num_cached_blocks == 0
        got, cached, hit = pc.fetch(bm, t1)
        assert hit == "miss"

    def test_clear(self):
        bm = BlockManager(num_blocks=16, block_size=4)
        pc = PrefixCache(block_size=4)
        t = list(range(12))
        b = bm.allocate(3)
        pc.store(bm, t, b)
        bm.free(b, cache=True)
        assert pc.clear(bm) == 2
        assert bm.num_cached_blocks == 0
        _, cached, hit = pc.fetch(bm, t)
        assert hit == "miss"


class TestPrefixCacheEndToEnd:
    def _sched(self, tiny_cfg, tiny_params, **kw):
        sched = make_scheduler(tiny_cfg, tiny_params, block_size=8, **kw)
        sched.prefix_cache = PrefixCache(block_size=8)
        return sched

    def test_repeat_prompt_hits_and_matches(self, tiny_cfg, tiny_params, rng):
        prompt = rng.integers(2, 128, size=40).tolist()
        sched = self._sched(tiny_cfg, tiny_params)
        sched.add_request(_req("first", prompt, max_tokens=8))
        outs1 = run_to_completion(sched)
        prompt_tokens_before = sched.stats.num_prompt_tokens
        sched.add_request(_req("second", prompt, max_tokens=8))
        outs2 = run_to_completion(sched)
        assert outs1["first"].output_token_ids == outs2["second"].output_token_ids
        assert outs2["second"].cached_tokens > 0
        # far fewer prompt tokens processed the second time
        second_cost = sched.stats.num_prompt_tokens - prompt_tokens_before
        assert second_cost <= len(prompt) - outs2["second"].cached_tokens + 8

    def test_shared_system_prefix(self, tiny_cfg, tiny_params, rng):
        system = rng.integers(2, 128, size=32).tolist()
        sched = self._sched(tiny_cfg, tiny_params)
        sched.add_request(_req("a", system + [5, 6, 7], max_tokens=6))
        run_to_completion(sched)
        sched.add_request(_req("b", system + [9, 10, 11, 12], max_tokens=6))
        outs = run_to_completion(sched)
        assert outs["b"].cached_tokens == 32
        expected = reference_greedy(
            tiny_params, tiny_cfg, system + [9, 10, 11, 12], 6
        )
        assert outs["b"].output_token_ids == expected

    def test_concurrent_shared_prefix_refcount(
        self, tiny_cfg, tiny_params, rng
    ):
        system = rng.integers(2, 128, size=24).tolist()
        sched = self._sched(tiny_cfg, tiny_params)
        # seed the cache
        sched.add_request(_req("seed", system + [3], max_tokens=4))
        run_to_completion(sched)
        # two concurrent requests share the cached blocks
        for i in range(2):
            sched.add_request(
                _req(f"r{i}", system + [50 + i], max_tokens=6)
            )
        outs = run_to_completion(sched)
        for i in range(2):
            expected = reference_greedy(
                tiny_params, tiny_cfg, system + [50 + i], 6
            )
            assert outs[f"r{i}"].output_token_ids == expected
        assert sched.block_mgr.num_active_blocks == 0

    def test_exact_hit_replays_last_token(self, tiny_cfg, tiny_params, rng):
        # prompt length exactly a multiple of block size
        prompt = rng.integers(2, 128, size=32).tolist()
        sched = self._sched(tiny_cfg, tiny_params)
        sched.add_request(_req("a", prompt, max_tokens=5))
        outs1 = run_to_completion(sched)
        sched.add_request(_req("b", prompt, max_tokens=5))
        outs2 = run_to_completion(sched)
        assert outs1["a"].output_token_ids == outs2["b"].output_token_ids
        # the last block is dropped so the final token re-forwards
        assert outs2["b"].cached_tokens <= len(prompt) - 1


def test_abort_mid_prefill_never_publishes_uncomputed_blocks(rng):
    """A request aborted during chunked prefill must not publish blocks
    whose KV was never written — a same-prefix follow-up would attend
    garbage (r2 review finding #1)."""
    from vllm_mlx_tpu.cache.prefix_cache import PrefixCache
    from vllm_mlx_tpu.config import CacheConfig, ModelConfig, SchedulerConfig
    from vllm_mlx_tpu.core.model_runner import ModelRunner
    from vllm_mlx_tpu.core.request import Request, SamplingParams
    from vllm_mlx_tpu.core.scheduler import Scheduler
    from vllm_mlx_tpu.models import loader

    cfg = ModelConfig(
        model_type="llama", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32",
    )
    params = loader.init_params(cfg, seed=2, dtype="float32")
    runner = ModelRunner(
        cfg, params,
        CacheConfig(block_size=8, num_blocks=64, kv_dtype="float32"),
        SchedulerConfig(max_num_seqs=2, max_prefill_tokens=16,
                        prefill_chunk_sizes=[16], max_model_len=256),
    )
    pc = PrefixCache(8)
    sched = Scheduler(runner, tokenizer=None, stop_tokens=set(),
                      prefix_cache=pc)
    prompt = rng.integers(2, 128, size=100).tolist()
    req = Request(request_id="a", prompt=list(prompt),
                  sampling_params=SamplingParams(temperature=0.0,
                                                 max_tokens=4))
    sched.add_request(req)
    sched.step()  # one 16-token chunk of the 100-token prompt
    assert req.num_computed_tokens < 100
    sched.abort_request("a")
    while sched.has_unfinished():
        sched.step()
    # nothing beyond the computed blocks may be cached for reuse
    assert sched.block_mgr.num_cached_blocks <= req.num_computed_tokens // 8
    # a fresh identical request must not hit past the computed region
    req2 = Request(request_id="b", prompt=list(prompt),
                   sampling_params=SamplingParams(temperature=0.0,
                                                  max_tokens=2))
    sched.add_request(req2)
    while sched.has_unfinished():
        sched.step()
    assert req2.cached_tokens <= 16
