# SPDX-License-Identifier: Apache-2.0
"""Serialized single-request engine (reference engine/simple.py:122).

One request at a time behind an asyncio lock with fail-fast admission
(reference simple.py:373-398 ``EngineBusy``). Shares the batched
machinery with max_num_seqs=1 — on TPU there is no benefit to a separate
code path, only the admission semantics differ.
"""

from __future__ import annotations

import asyncio
from typing import Any, AsyncIterator, Dict, List, Optional

from ..config import SchedulerConfig
from .base import EngineBusy, GenerationOutput
from .batched import BatchedEngine


class SimpleEngine(BatchedEngine):
    def __init__(self, model_path: str, *, lock_admission: bool = True, **kw):
        sched = kw.pop("scheduler_config", None) or SchedulerConfig()
        sched.max_num_seqs = 1
        super().__init__(model_path, scheduler_config=sched, **kw)
        self._lock = asyncio.Lock()
        self._lock_admission = lock_admission

    async def _acquire(self):
        if self._lock.locked() and self._lock_admission:
            raise EngineBusy("engine is busy with another request")
        await self._lock.acquire()

    async def stream_generate(
        self, prompt: Any, request_id: Optional[str] = None, **kwargs
    ) -> AsyncIterator[GenerationOutput]:
        await self._acquire()
        try:
            async for chunk in super().stream_generate(
                prompt, request_id, **kwargs
            ):
                yield chunk
        finally:
            self._lock.release()

    async def stream_chat(
        self, messages: List[Dict[str, Any]], request_id: Optional[str] = None,
        **kwargs,
    ) -> AsyncIterator[GenerationOutput]:
        await self._acquire()
        try:
            async for chunk in super().stream_chat(
                messages, request_id, **kwargs
            ):
                yield chunk
        finally:
            self._lock.release()

    def get_stats(self) -> Dict[str, Any]:
        stats = super().get_stats()
        stats["engine"] = "simple"
        return stats
