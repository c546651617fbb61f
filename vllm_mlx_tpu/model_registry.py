# SPDX-License-Identifier: Apache-2.0
"""Multi-model registry + manager (reference model_registry.py:282-900).

A YAML/JSON registry declares servable models; the ModelManager loads
them lazily, tracks last-use, enforces a loaded-model budget with LRU
unloading, and serializes load/unload transitions per model.
"""

from __future__ import annotations

import asyncio
import logging
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

logger = logging.getLogger(__name__)


@dataclass
class ModelSpec:
    name: str
    path: str
    engine: str = "batched"  # batched | simple
    quantization: Optional[str] = None
    max_num_seqs: Optional[int] = None
    max_model_len: Optional[int] = None
    block_size: Optional[int] = None
    num_kv_blocks: Optional[int] = None
    extra: Dict[str, Any] = field(default_factory=dict)


def parse_registry(data: Dict[str, Any]) -> List[ModelSpec]:
    defaults = data.get("defaults", {}) or {}
    out: List[ModelSpec] = []
    for entry in data.get("models", []) or []:
        merged = {**defaults, **entry}
        known = {
            "name", "path", "engine", "quantization", "max_num_seqs",
            "max_model_len", "block_size", "num_kv_blocks",
        }
        spec = ModelSpec(
            name=merged["name"],
            path=merged.get("path", merged.get("model", "")),
            engine=merged.get("engine", "batched"),
            quantization=merged.get("quantization"),
            max_num_seqs=merged.get("max_num_seqs"),
            max_model_len=merged.get("max_model_len"),
            block_size=merged.get("block_size"),
            num_kv_blocks=merged.get("num_kv_blocks"),
            extra={k: v for k, v in merged.items() if k not in known},
        )
        out.append(spec)
    return out


def load_registry_file(path: str) -> List[ModelSpec]:
    import json

    with open(path) as f:
        text = f.read()
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        import yaml

        data = yaml.safe_load(text)
    return parse_registry(data)


class ModelManager:
    """Lazily loads engines; unloads least-recently-used over budget."""

    def __init__(
        self,
        specs: List[ModelSpec],
        *,
        max_loaded: int = 1,
        idle_unload_s: Optional[float] = None,
        engine_factory=None,
    ) -> None:
        self.specs = {s.name: s for s in specs}
        self.max_loaded = max(1, max_loaded)
        self.idle_unload_s = idle_unload_s
        self._engines: Dict[str, Any] = {}
        self._last_used: Dict[str, float] = {}
        self._locks: Dict[str, asyncio.Lock] = {}
        self._factory = engine_factory or self._default_factory

    @staticmethod
    def _default_factory(spec: ModelSpec):
        from .config import CacheConfig, SchedulerConfig
        from .engine.batched import BatchedEngine
        from .engine.simple import SimpleEngine

        cache = CacheConfig()
        sched = SchedulerConfig()
        if spec.block_size:
            cache.block_size = spec.block_size
        if spec.num_kv_blocks is not None:
            cache.num_blocks = spec.num_kv_blocks
        if spec.max_num_seqs:
            sched.max_num_seqs = spec.max_num_seqs
        if spec.max_model_len:
            sched.max_model_len = spec.max_model_len
        cls = SimpleEngine if spec.engine == "simple" else BatchedEngine
        return cls(
            spec.path,
            cache_config=cache,
            scheduler_config=sched,
            quantization=spec.quantization,
        )

    # ------------------------------------------------------------------ api
    def model_names(self) -> List[str]:
        return list(self.specs)

    def loaded_names(self) -> List[str]:
        return list(self._engines)

    def _lock(self, name: str) -> asyncio.Lock:
        if name not in self._locks:
            self._locks[name] = asyncio.Lock()
        return self._locks[name]

    async def get_engine(self, name: str):
        if name not in self.specs:
            raise KeyError(f"model {name!r} not in registry")
        async with self._lock(name):
            if name in self._engines:
                self._last_used[name] = time.time()
                return self._engines[name]
            await self._evict_for_budget()
            engine = self._factory(self.specs[name])
            logger.info("loading model %s", name)
            await engine.start()
            self._engines[name] = engine
            self._last_used[name] = time.time()
            return engine

    async def _evict_for_budget(self) -> None:
        while len(self._engines) >= self.max_loaded:
            victim = min(self._last_used, key=self._last_used.get)
            await self.unload(victim)

    async def unload(self, name: str) -> bool:
        engine = self._engines.pop(name, None)
        self._last_used.pop(name, None)
        if engine is None:
            return False
        logger.info("unloading model %s", name)
        await engine.stop()
        return True

    async def unload_idle(self) -> int:
        if not self.idle_unload_s:
            return 0
        now = time.time()
        victims = [
            n
            for n, t in self._last_used.items()
            if now - t > self.idle_unload_s
        ]
        for n in victims:
            async with self._lock(n):
                await self.unload(n)
        return len(victims)

    async def stop_all(self) -> None:
        for name in list(self._engines):
            await self.unload(name)

    def get_stats(self) -> Dict[str, Any]:
        return {
            "registered": self.model_names(),
            "loaded": self.loaded_names(),
            "last_used": {
                n: round(time.time() - t, 1)
                for n, t in self._last_used.items()
            },
        }
