# SPDX-License-Identifier: Apache-2.0
"""Model registry / manager / residency behaviors (fake engines, no
model loading — mirrors the reference's fake-seam test style,
SURVEY.md section 4)."""

import asyncio
import json

import pytest

from vllm_mlx_tpu.lifecycle import ResidencyManager
from vllm_mlx_tpu.model_registry import (
    ModelManager,
    ModelSpec,
    parse_registry,
)


class FakeEngine:
    instances = []

    def __init__(self, spec):
        self.spec = spec
        self.started = False
        self.stopped = False
        FakeEngine.instances.append(self)

    async def start(self):
        self.started = True

    async def stop(self):
        self.stopped = True


def specs(n):
    return [ModelSpec(name=f"m{i}", path=f"/models/m{i}") for i in range(n)]


class TestRegistryParsing:
    def test_defaults_merge(self):
        data = {
            "defaults": {"max_num_seqs": 8, "engine": "batched"},
            "models": [
                {"name": "a", "path": "/a"},
                {"name": "b", "path": "/b", "engine": "simple",
                 "quantization": "int8"},
            ],
        }
        out = parse_registry(data)
        assert out[0].max_num_seqs == 8
        assert out[0].engine == "batched"
        assert out[1].engine == "simple"
        assert out[1].quantization == "int8"


class TestModelManager:
    def _mgr(self, n=3, max_loaded=2):
        FakeEngine.instances = []
        return ModelManager(
            specs(n), max_loaded=max_loaded, engine_factory=FakeEngine
        )

    def test_lazy_load_and_reuse(self):
        mgr = self._mgr()

        async def go():
            e1 = await mgr.get_engine("m0")
            e2 = await mgr.get_engine("m0")
            assert e1 is e2
            assert len(FakeEngine.instances) == 1
            assert e1.started

        asyncio.run(go())

    def test_lru_eviction(self):
        mgr = self._mgr(n=3, max_loaded=2)

        async def go():
            e0 = await mgr.get_engine("m0")
            await mgr.get_engine("m1")
            await mgr.get_engine("m0")  # refresh m0
            await mgr.get_engine("m2")  # evicts m1 (LRU)
            assert set(mgr.loaded_names()) == {"m0", "m2"}
            evicted = [e for e in FakeEngine.instances if e.stopped]
            assert len(evicted) == 1 and evicted[0].spec.name == "m1"

        asyncio.run(go())

    def test_unknown_model(self):
        mgr = self._mgr()

        async def go():
            with pytest.raises(KeyError):
                await mgr.get_engine("nope")

        asyncio.run(go())

    def test_idle_unload(self):
        FakeEngine.instances = []
        mgr = ModelManager(
            specs(1), max_loaded=2, idle_unload_s=0.01,
            engine_factory=FakeEngine,
        )

        async def go():
            await mgr.get_engine("m0")
            await asyncio.sleep(0.05)
            n = await mgr.unload_idle()
            assert n == 1
            assert mgr.loaded_names() == []

        asyncio.run(go())


class TestResidency:
    def test_lazy_and_lease(self):
        made = []

        def factory():
            e = FakeEngine(ModelSpec(name="main", path="/m"))
            made.append(e)
            return e

        async def go():
            rm = ResidencyManager(factory, lazy=True, idle_unload_s=0.02)
            await rm.start()
            assert not rm.is_loaded
            async with rm.acquire() as engine:
                assert rm.is_loaded
                # lease blocks unload
                assert not await rm.unload_if_idle()
            await asyncio.sleep(0.05)
            # either the background reaper or this call unloads it
            await rm.unload_if_idle()
            assert not rm.is_loaded
            await rm.stop()

        asyncio.run(go())

    def test_eager_start(self):
        def factory():
            return FakeEngine(ModelSpec(name="main", path="/m"))

        async def go():
            rm = ResidencyManager(factory, lazy=False)
            await rm.start()
            assert rm.is_loaded
            await rm.stop()
            assert not rm.is_loaded

        asyncio.run(go())
