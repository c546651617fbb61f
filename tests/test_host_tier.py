# SPDX-License-Identifier: Apache-2.0
"""Tiered KV spill: host-DRAM LRU + disk persistence + end-to-end
eviction→restore through the engine (reference SSD-tier behaviors:
tests/test_ssd_cache.py, tests/test_mllm_ssd_spill.py)."""

import time

import numpy as np
import pytest

from vllm_mlx_tpu.cache.host_tier import HostKVTier
from vllm_mlx_tpu.cache.prefix_cache import PrefixCache
from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
from vllm_mlx_tpu.core.block_manager import BlockManager
from vllm_mlx_tpu.core.model_runner import ModelRunner
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


class TestHostTierUnit:
    def _kv(self, rng, seed=0):
        return rng.standard_normal((2, 8, 4, 16)).astype(np.float32)

    def test_store_lookup_chain(self, rng):
        tier = HostKVTier(max_bytes=10**9)
        kvs = [self._kv(rng) for _ in range(3)]
        for i, kv in enumerate(kvs):
            tier.store(f"h{i}", kv)
        got = tier.lookup_chain(["h0", "h1", "hX", "h2"])
        assert len(got) == 2
        np.testing.assert_array_equal(got[0], kvs[0])

    def test_memory_lru_eviction(self, rng):
        one = self._kv(rng)
        tier = HostKVTier(max_bytes=one.nbytes * 2)
        tier.store("a", one)
        tier.store("b", self._kv(rng))
        tier.store("c", self._kv(rng))  # evicts "a" (no disk -> dropped)
        assert not tier.contains("a")
        assert tier.contains("b") and tier.contains("c")

    def test_disk_spill_and_reload(self, rng, tmp_path):
        one = self._kv(rng)
        tier = HostKVTier(max_bytes=one.nbytes, disk_dir=str(tmp_path))
        tier.store("a", one)
        tier.store("b", self._kv(rng))  # "a" spills to disk
        assert tier.contains("a")
        got = tier.lookup_chain(["a"])
        np.testing.assert_array_equal(got[0], one)
        assert tier.stats["disk_hits"] == 1
        # a fresh tier instance reloads the disk index (restart persistence)
        tier2 = HostKVTier(max_bytes=10**9, disk_dir=str(tmp_path))
        assert tier2.contains("a")
        np.testing.assert_array_equal(tier2.lookup_chain(["a"])[0], one)

    def test_corrupt_entry_quarantine(self, rng, tmp_path):
        one = self._kv(rng)
        tier = HostKVTier(max_bytes=one.nbytes, disk_dir=str(tmp_path))
        tier.store("a", one)
        tier.store("b", self._kv(rng))
        fn = tier._disk_index["a"]
        (tmp_path / fn).write_bytes(b"garbage")
        assert tier.lookup_chain(["a"]) == []
        assert "a" not in tier._disk_index

    def test_bf16_roundtrip(self, tmp_path):
        import ml_dtypes

        kv = np.arange(64, dtype=np.float32).reshape(2, 4, 2, 4)
        kv16 = kv.astype(ml_dtypes.bfloat16)
        tier = HostKVTier(max_bytes=kv16.nbytes, disk_dir=str(tmp_path))
        tier.store("a", kv16)
        tier.store("b", kv16.copy())  # spill "a"
        got = tier.lookup_chain(["a"])[0]
        np.testing.assert_array_equal(
            got.astype(np.float32), kv16.astype(np.float32)
        )


class TestAsyncSpill:
    """Eviction spills must not block the scheduler hot path: one
    batched gather dispatch per eviction wave, stores on a background
    writer (VERDICT r4 weak #4; reference ssd_cache.py:702-854 ran its
    SSD writes on a writer thread the same way)."""

    def test_wave_is_one_gather_and_nonblocking(self):
        tier = HostKVTier(max_bytes=10**9)
        pc = PrefixCache(8, host_tier=tier)
        mgr = BlockManager(num_blocks=10, block_size=8)

        calls = []

        class FakeRunner:
            def read_blocks_async(self, blocks):
                calls.append(list(blocks))
                return np.stack(
                    [
                        np.full((2, 8, 4, 16), b, np.float32)
                        for b in blocks
                    ]
                )

        pc.attach_spill(mgr, FakeRunner())
        blocks = mgr.allocate(6)
        for i, b in enumerate(blocks):
            mgr.register_block_hash(b, f"h{i}")
        mgr.free(blocks, cache=True)  # 6 cached refcount-0 blocks

        # a slow store proves admission doesn't wait on the writer:
        # 6 synchronous spills would cost >= 0.3 s
        orig_store = tier.store

        def slow_store(h, kv):
            time.sleep(0.05)
            orig_store(h, kv)

        tier.store = slow_store
        t0 = time.perf_counter()
        out = mgr.allocate(9)  # 3 free + evicts all 6 cached
        dt = time.perf_counter() - t0
        assert out is not None and len(out) == 9
        assert len(calls) == 1 and sorted(calls[0]) == sorted(blocks)
        assert dt < 0.15, f"admission blocked on spill ({dt:.3f}s)"
        # in-flight entries are synchronously visible on demand
        pc.spiller.flush_hashes(["h3"])
        assert tier.contains("h3")
        pc.spiller.flush()
        for i, b in enumerate(blocks):
            got = tier.lookup_chain([f"h{i}"])
            assert got and got[0][0, 0, 0, 0] == b  # right block's bytes
        pc.spiller.close()

    def test_save_all_lands_inflight_spills(self, tmp_path):
        tier = HostKVTier(max_bytes=10**9, disk_dir=str(tmp_path))
        pc = PrefixCache(8, host_tier=tier)
        mgr = BlockManager(num_blocks=6, block_size=8)

        class FakeRunner:
            def read_blocks_async(self, blocks):
                return np.stack(
                    [
                        np.full((2, 8, 4, 16), b, np.float32)
                        for b in blocks
                    ]
                )

        pc.attach_spill(mgr, FakeRunner())
        blocks = mgr.allocate(3)
        for i, b in enumerate(blocks):
            mgr.register_block_hash(b, f"s{i}")
        mgr.free(blocks, cache=True)
        mgr.allocate(5)  # evicts the 3 cached blocks (async)
        saved = pc.save_all(mgr)  # must flush the writer, then persist
        assert saved == 0  # nothing left cached in-pool
        assert all(tier.contains(f"s{i}") for i in range(3))
        assert len(tier._disk_index) == 3
        pc.spiller.close()


class TestTierEndToEnd:
    def test_evict_restore_roundtrip(self, tiny_cfg, tiny_params, rng):
        """A cached prefix evicted from the pool under pressure is
        restored from the host tier with identical generations."""
        cache = CacheConfig(
            block_size=8, num_blocks=14, kv_dtype="float32"
        )  # 13 usable blocks
        sc = SchedulerConfig(
            max_num_seqs=2, max_prefill_tokens=64,
            prefill_chunk_sizes=[16, 64], max_model_len=128,
        )
        runner = ModelRunner(tiny_cfg, tiny_params, cache, sc)
        tier = HostKVTier(max_bytes=10**9)
        pc = PrefixCache(8, host_tier=tier)
        sched = Scheduler(
            runner, tokenizer=None, stop_tokens={EOS}, prefix_cache=pc
        )

        prompt_a = rng.integers(2, 128, size=40).tolist()
        sched.add_request(_req("a1", prompt_a, max_tokens=4))
        out_a1 = run_to_completion(sched)["a1"]
        # a's blocks are now cached in-pool; flood with b to evict them
        prompt_b = rng.integers(2, 128, size=60).tolist()
        sched.add_request(_req("b", prompt_b, max_tokens=30))
        run_to_completion(sched)
        pc.spiller.flush()  # spills are async now; land them
        assert tier.num_entries > 0  # spilled on eviction
        # resubmit a: chain restored from tier
        req = _req("a2", prompt_a, max_tokens=4)
        sched.add_request(req)
        out_a2 = run_to_completion(sched)["a2"]
        assert out_a2.output_token_ids == out_a1.output_token_ids
        assert out_a2.cached_tokens > 0
        assert tier.stats["restored_blocks"] > 0
        # finished requests leave the registry; inspect the object itself
        assert req.cache_hit_type and "tier" in req.cache_hit_type


class TestNamespacing:
    """Disk layer must be namespaced by model identity + KV geometry so a
    restart with a different model on the same cache dir never restores
    foreign KV (ADVICE r1; reference ssd_cache/{model}/ layout)."""

    def test_namespaces_isolated(self, rng, tmp_path):
        kv = rng.standard_normal((2, 8, 4, 16)).astype(np.float32)
        a = HostKVTier(max_bytes=kv.nbytes, disk_dir=str(tmp_path),
                       namespace="model-a-L2-kvh4-hd16")
        a.store("h1", kv)
        a.store("h2", kv + 1)  # evicts h1 to disk (budget = 1 block)
        assert a.lookup_chain(["h1"])  # disk hit within namespace

        b = HostKVTier(max_bytes=kv.nbytes, disk_dir=str(tmp_path),
                       namespace="model-b-L2-kvh4-hd16")
        assert not b.contains("h1")
        assert b.lookup_chain(["h1"]) == []

        # same namespace on restart still restores
        a2 = HostKVTier(max_bytes=kv.nbytes, disk_dir=str(tmp_path),
                        namespace="model-a-L2-kvh4-hd16")
        got = a2.lookup_chain(["h1"])
        assert got and np.allclose(got[0], kv)

    def test_geometry_mismatch_rejected(self, rng, tmp_path):
        kv = rng.standard_normal((2, 8, 4, 16)).astype(np.float32)
        t = HostKVTier(max_bytes=kv.nbytes, disk_dir=str(tmp_path))
        t.store("h1", kv)
        t.store("h2", kv + 1)  # h1 -> disk
        # new process with a DIFFERENT block geometry, same (un-namespaced)
        # dir: the per-entry shape check must reject the stale entry.
        t2 = HostKVTier(max_bytes=10**9, disk_dir=str(tmp_path))
        other = rng.standard_normal((4, 8, 4, 16)).astype(np.float32)
        t2.store("warm", other)  # establishes expected geometry
        assert t2.lookup_chain(["h1"]) == []
