# SPDX-License-Identifier: Apache-2.0
"""Long-context machinery + persistence (reference max_kv_size
scheduler.py:2027, mid-prefill saves scheduler.py:1470-1538, shutdown
persistence memory_cache.py:1207-1415)."""

import numpy as np
import pytest

from vllm_mlx_tpu.cache.host_tier import HostKVTier
from vllm_mlx_tpu.cache.prefix_cache import PrefixCache
from vllm_mlx_tpu.config import CacheConfig, ModelConfig, SchedulerConfig
from vllm_mlx_tpu.core.model_runner import ModelRunner
from vllm_mlx_tpu.core.request import Request, RequestStatus, SamplingParams
from vllm_mlx_tpu.core.scheduler import Scheduler
from vllm_mlx_tpu.models import loader

EOS = 1


@pytest.fixture(scope="module")
def tiny_cfg():
    return ModelConfig(
        model_type="llama",
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=2048,
        dtype="float32",
    )


@pytest.fixture(scope="module")
def tiny_params(tiny_cfg):
    return loader.init_params(tiny_cfg, seed=3, dtype="float32")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(17)


def _req(rid, prompt, max_tokens=8):
    return Request(
        request_id=rid,
        prompt=list(prompt),
        sampling_params=SamplingParams(temperature=0.0, max_tokens=max_tokens),
    )


def run_to_completion(sched, max_steps=400):
    outs = {}
    steps = 0
    while sched.has_unfinished():
        for o in sched.step():
            if o.finished:
                outs[o.request_id] = o
        steps += 1
        assert steps < max_steps
    return outs


def _make_sched(tiny_cfg, tiny_params, *, num_blocks=64, max_kv_size=None,
                prefix_cache=None, sliding_window=None, max_num_seqs=2):
    import dataclasses

    cfg = tiny_cfg
    if sliding_window is not None:
        cfg = dataclasses.replace(
            tiny_cfg, sliding_window=sliding_window, layer_types=None
        )
    runner = ModelRunner(
        cfg,
        tiny_params,
        CacheConfig(block_size=8, num_blocks=num_blocks, kv_dtype="float32"),
        SchedulerConfig(
            max_num_seqs=max_num_seqs, max_prefill_tokens=64,
            prefill_chunk_sizes=[16, 64], max_model_len=512,
            max_kv_size=max_kv_size,
        ),
    )
    return Scheduler(
        runner, tokenizer=None, stop_tokens={EOS}, prefix_cache=prefix_cache
    )


class TestShutdownPersistence:
    def test_warm_restart_restores_kv(self, tiny_cfg, tiny_params, rng,
                                      tmp_path):
        ns = "tiny-L2-kvh2-hd16-bs8-f32"
        prompt = rng.integers(2, 128, size=40).tolist()

        tier = HostKVTier(max_bytes=10**8, disk_dir=str(tmp_path),
                          namespace=ns)
        pc = PrefixCache(8, host_tier=tier)
        sched = _make_sched(tiny_cfg, tiny_params, prefix_cache=pc)
        sched.add_request(_req("a", prompt))
        out_a = run_to_completion(sched)["a"]
        # shutdown save: idle cached blocks -> host tier -> disk
        saved = pc.save_all(sched.block_mgr)
        assert saved > 0

        # "restart": fresh pool, fresh tier over the same disk dir
        tier2 = HostKVTier(max_bytes=10**8, disk_dir=str(tmp_path),
                           namespace=ns)
        pc2 = PrefixCache(8, host_tier=tier2)
        sched2 = _make_sched(tiny_cfg, tiny_params, prefix_cache=pc2)
        req = _req("a2", prompt)
        sched2.add_request(req)
        out_a2 = run_to_completion(sched2)["a2"]
        assert out_a2.output_token_ids == out_a.output_token_ids
        assert out_a2.cached_tokens > 0
        assert tier2.stats["disk_hits"] > 0

    def test_namespace_mismatch_never_restores(self, tiny_cfg, tiny_params,
                                               rng, tmp_path):
        prompt = rng.integers(2, 128, size=40).tolist()
        tier = HostKVTier(max_bytes=10**8, disk_dir=str(tmp_path),
                          namespace="model-A")
        pc = PrefixCache(8, host_tier=tier)
        sched = _make_sched(tiny_cfg, tiny_params, prefix_cache=pc)
        sched.add_request(_req("a", prompt))
        run_to_completion(sched)
        assert pc.save_all(sched.block_mgr) > 0

        tier2 = HostKVTier(max_bytes=10**8, disk_dir=str(tmp_path),
                           namespace="model-B")
        pc2 = PrefixCache(8, host_tier=tier2)
        sched2 = _make_sched(tiny_cfg, tiny_params, prefix_cache=pc2)
        req = _req("b", prompt)
        sched2.add_request(req)
        run_to_completion(sched2)
        assert req.cached_tokens == 0


class TestMaxKvSize:
    def test_window_output_matches_dense_window(self, tiny_cfg, tiny_params,
                                                rng):
        """Generation under max_kv_size equals a dense forward with the
        same all-layer sliding window (exactness of the rotating mask)."""
        import jax.numpy as jnp

        from vllm_mlx_tpu.models import decoder

        w = 24
        prompt = rng.integers(2, 128, size=30).tolist()
        sched = _make_sched(
            tiny_cfg, tiny_params, max_kv_size=w, sliding_window=w
        )
        req = _req("win", prompt, max_tokens=16)
        sched.add_request(req)
        got = run_to_completion(sched)["win"].output_token_ids

        import dataclasses

        wcfg = dataclasses.replace(
            tiny_cfg, sliding_window=w, layer_types=None
        )
        seq = list(prompt)
        expected = []
        for _ in range(16):
            logits = decoder.dense_forward(
                tiny_params, wcfg, jnp.asarray(seq, jnp.int32)
            )
            nxt = int(np.argmax(np.asarray(logits[-1])))
            expected.append(nxt)
            if nxt == EOS:
                break
            seq.append(nxt)
        assert got == expected

    def test_blocks_reclaimed_behind_window(self, tiny_cfg, tiny_params, rng):
        """A long generation in a pool that could NOT hold it without
        rotation completes, with leading blocks freed as the window
        advances."""
        w = 16  # 2 blocks
        prompt = rng.integers(2, 128, size=12).tolist()
        # pool of 11 usable blocks; generation needs 12+88 tokens
        # = 13 blocks total without rotation
        sched = _make_sched(
            tiny_cfg, tiny_params, num_blocks=12, max_kv_size=w,
            sliding_window=w, max_num_seqs=1,
        )
        req = _req("long", prompt, max_tokens=88)
        sched.add_request(req)
        out = None
        max_retired = 0
        max_active = 0
        steps = 0
        while sched.has_unfinished():
            for o in sched.step():
                if o.finished:
                    out = o
            max_retired = max(max_retired, req.num_retired_blocks)
            max_active = max(max_active, sched.block_mgr.num_active_blocks)
            steps += 1
            assert steps < 600
        assert out is not None and out.finish_reason in ("length", "stop")
        assert len(out.output_token_ids) == 88
        assert max_retired > 0
        # concurrent footprint stayed bounded by the window (+ slack),
        # far below the 13 blocks an unrotated run would need
        assert max_active <= w // 8 + 4
        # everything returned to the pool at the end
        assert sched.block_mgr.num_active_blocks == 0


class TestMidPrefillSaves:
    def test_second_request_shares_before_first_finishes(
        self, tiny_cfg, tiny_params, rng
    ):
        pc = PrefixCache(8)
        sched = _make_sched(tiny_cfg, tiny_params, prefix_cache=pc)
        prompt = rng.integers(2, 128, size=48).tolist()
        a = _req("a", prompt, max_tokens=40)
        sched.add_request(a)
        # run a few steps: enough to prefill some chunks of A but not
        # to finish it
        for _ in range(3):
            sched.step()
        assert not a.is_finished()
        b = _req("b", prompt, max_tokens=4)
        sched.add_request(b)
        outs = run_to_completion(sched)
        assert b.cached_tokens > 0  # shared A's prompt KV mid-flight
        # token-identity: b matches a's beginning
        assert (
            outs["b"].output_token_ids
            == outs["a"].output_token_ids[: len(outs["b"].output_token_ids)]
        )
