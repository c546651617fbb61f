# SPDX-License-Identifier: Apache-2.0
"""Data-parallel serving: N independent engine replicas behind one
router (SURVEY §2.8 DP; the reference scales across Mac nodes with an
external balancer — on TPU pods each replica pins one chip / chip
group and the router is in-process).

Each replica owns a full engine (params + KV pool + scheduler) pinned
to its own device via ``jax.device_put``; requests route to the replica
with the fewest outstanding requests (least-loaded, FCFS tie-break).
Throughput scales with replicas for small models where a single
replica's batch can't saturate a chip — and across chips without any
cross-device communication at all.
"""

from __future__ import annotations

import asyncio
import itertools
import logging
from typing import Any, AsyncIterator, Dict, List, Optional

from .base import BaseEngine, GenerationOutput
from .batched import BatchedEngine

logger = logging.getLogger(__name__)


class DPEngine(BaseEngine):
    """Least-loaded router over ``dp_size`` BatchedEngine replicas."""

    def __init__(self, model_path: str, *, dp_size: int = 2, **kw) -> None:
        import jax

        self.model_path = model_path
        self.dp_size = dp_size
        devices = jax.local_devices()
        tp = int(kw.get("tp_size") or 1)
        if tp > 1:
            # DP x TP composition: each replica owns a disjoint
            # tp-submesh (a v5e-8 pod as dp=2 x tp=4). Collectives stay
            # inside each replica's ICI group; the router needs none.
            if len(devices) < dp_size * tp:
                raise ValueError(
                    f"dp={dp_size} x tp={tp} needs {dp_size * tp} "
                    f"devices, have {len(devices)}"
                )
            self.replicas: List[BatchedEngine] = [
                BatchedEngine(
                    model_path,
                    mesh_devices=devices[i * tp : (i + 1) * tp],
                    **kw,
                )
                for i in range(dp_size)
            ]
        else:
            self.replicas = [
                BatchedEngine(
                    model_path,
                    device=devices[i % len(devices)],
                    **kw,
                )
                for i in range(dp_size)
            ]
        self._outstanding = [0] * dp_size
        self._rr = itertools.count()
        self._running = False
        # request id -> replica index (for aborts)
        self._homes: Dict[str, int] = {}

    # ---------------------------------------------------------------- control
    async def start(self) -> None:
        for r in self.replicas:
            await r.start()
        self._running = True
        logger.info(
            "DPEngine started: %d replicas of %s",
            self.dp_size, self.model_path,
        )

    async def stop(self) -> None:
        for r in self.replicas:
            await r.stop()
        self._running = False

    @property
    def is_running(self) -> bool:
        return self._running

    @property
    def tokenizer(self):
        return self.replicas[0].tokenizer

    @property
    def model_config(self):
        return self.replicas[0].model_config

    # ---------------------------------------------------------------- routing
    def _pick(self) -> int:
        low = min(self._outstanding)
        candidates = [
            i for i, n in enumerate(self._outstanding) if n == low
        ]
        return candidates[next(self._rr) % len(candidates)]

    async def _route(
        self, method: str, request_id: Optional[str], *args, **kw
    ) -> AsyncIterator[GenerationOutput]:
        i = self._pick()
        self._outstanding[i] += 1
        if request_id:
            self._homes[request_id] = i
        try:
            async for chunk in getattr(self.replicas[i], method)(
                *args, request_id=request_id, **kw
            ):
                yield chunk
        finally:
            self._outstanding[i] -= 1
            if request_id:
                self._homes.pop(request_id, None)

    def stream_generate(
        self, prompt: Any, request_id: Optional[str] = None, **kw
    ) -> AsyncIterator[GenerationOutput]:
        return self._route("stream_generate", request_id, prompt, **kw)

    def stream_chat(
        self, messages: List[Dict[str, Any]],
        request_id: Optional[str] = None, **kw,
    ) -> AsyncIterator[GenerationOutput]:
        return self._route("stream_chat", request_id, messages, **kw)

    def apply_chat_template(self, *a, **kw) -> str:
        return self.replicas[0].apply_chat_template(*a, **kw)

    # ------------------------------------------------------------------ admin
    def abort_request(self, request_id: str) -> None:
        i = self._homes.get(request_id)
        if i is not None:
            self.replicas[i].abort_request(request_id)
        else:  # unknown home (e.g. already finishing): broadcast
            for r in self.replicas:
                r.abort_request(request_id)

    def get_stats(self) -> Dict[str, Any]:
        per = [r.get_stats() for r in self.replicas]
        agg: Dict[str, Any] = {
            "engine": "dp",
            "model": self.model_path,
            "running": self._running,
            "dp_size": self.dp_size,
            "outstanding": list(self._outstanding),
            "replicas": per,
        }
        for key in (
            "num_steps", "num_prompt_tokens", "num_generated_tokens",
            "num_finished", "num_preempted", "waiting",
        ):
            vals = [
                p.get(key)
                for p in per
                if isinstance(p.get(key), int)
                and not isinstance(p.get(key), bool)
            ]
            if vals:
                agg[key] = sum(vals)
        return agg
