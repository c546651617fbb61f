# SPDX-License-Identifier: Apache-2.0
"""Main-model residency management (reference lifecycle.py:69
``ResidencyManager``: ensure_loaded/acquire/release/unload_if_idle).

Lets the primary engine lazily load on first request and unload after an
idle period, with leases preventing unload mid-request.
"""

from __future__ import annotations

import asyncio
import contextlib
import logging
import time
from typing import Callable, Optional

logger = logging.getLogger(__name__)


class ResidencyManager:
    def __init__(
        self,
        engine_factory: Callable[[], object],
        *,
        idle_unload_s: Optional[float] = None,
        lazy: bool = False,
    ) -> None:
        self._factory = engine_factory
        self.idle_unload_s = idle_unload_s
        self.lazy = lazy
        self.engine = None
        self._leases = 0
        self._last_release = time.time()
        self._lock = asyncio.Lock()
        self._reaper_task: Optional[asyncio.Task] = None

    async def start(self) -> None:
        if not self.lazy:
            await self.ensure_loaded()
        if self.idle_unload_s:
            self._reaper_task = asyncio.create_task(self._reaper())

    async def stop(self) -> None:
        if self._reaper_task:
            self._reaper_task.cancel()
            with contextlib.suppress(asyncio.CancelledError):
                await self._reaper_task
        async with self._lock:
            if self.engine is not None:
                await self.engine.stop()
                self.engine = None

    async def ensure_loaded(self):
        async with self._lock:
            if self.engine is None:
                logger.info("loading main model (residency)")
                self.engine = self._factory()
                await self.engine.start()
            return self.engine

    @contextlib.asynccontextmanager
    async def acquire(self):
        engine = await self.ensure_loaded()
        self._leases += 1
        try:
            yield engine
        finally:
            self._leases -= 1
            self._last_release = time.time()

    async def unload_if_idle(self) -> bool:
        async with self._lock:
            if (
                self.engine is None
                or self._leases > 0
                or not self.idle_unload_s
            ):
                return False
            if time.time() - self._last_release < self.idle_unload_s:
                return False
            logger.info("unloading idle main model")
            await self.engine.stop()
            self.engine = None
            return True

    async def _reaper(self) -> None:
        while True:
            await asyncio.sleep(min(self.idle_unload_s, 30.0))
            try:
                await self.unload_if_idle()
            except Exception:  # pragma: no cover
                logger.exception("idle unload failed")

    @property
    def is_loaded(self) -> bool:
        return self.engine is not None
