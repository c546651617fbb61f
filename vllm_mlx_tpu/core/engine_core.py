# SPDX-License-Identifier: Apache-2.0
"""Async engine core: the scheduler loop on a dedicated thread.

Reference parity: EngineCore/AsyncEngineCore (reference engine_core.py:50,
701) — one worker thread drives Scheduler.step() continuously while the
asyncio side submits requests and consumes per-request output queues.
The reference's MLX stream-ownership machinery (engine_core.py:146-334,
mlx_streams.py) has no TPU analogue: JAX dispatch is thread-agnostic, so
a single dedicated stepping thread plus thread-safe queues is the whole
concurrency story.
"""

from __future__ import annotations

import asyncio
import logging
import queue as thread_queue
import threading
import time
from typing import AsyncIterator, Dict, Optional

from .output_collector import RequestOutputCollector
from .request import Request, RequestOutput
from .scheduler import Scheduler

logger = logging.getLogger(__name__)

IDLE_SLEEP_S = 0.002


class AsyncEngineCore:
    """Bridges asyncio request submission to the engine thread."""

    def __init__(self, scheduler: Scheduler) -> None:
        self.scheduler = scheduler
        self._incoming: "thread_queue.Queue[Request]" = thread_queue.Queue()
        self._collectors: Dict[str, RequestOutputCollector] = {}
        self._collector_lock = threading.Lock()
        self._thread: Optional[threading.Thread] = None
        self._running = False
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._error: Optional[BaseException] = None

    # ---------------------------------------------------------------- control
    def start(self) -> None:
        if self._running:
            return
        self._loop = asyncio.get_running_loop()
        self._running = True
        self._thread = threading.Thread(
            target=self._engine_loop, name="engine-core", daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None

    @property
    def is_running(self) -> bool:
        return self._running

    # ---------------------------------------------------------------- submit
    async def add_request(self, request: Request) -> RequestOutputCollector:
        if not self._running:
            raise RuntimeError("engine not started")
        if self._error is not None:
            raise RuntimeError(f"engine failed: {self._error}")
        collector = RequestOutputCollector(self._loop)
        with self._collector_lock:
            self._collectors[request.request_id] = collector
        self._incoming.put(request)
        return collector

    def abort_request(self, request_id: str) -> None:
        self.scheduler.abort_request(request_id)

    async def stream_outputs(
        self, request: Request
    ) -> AsyncIterator[RequestOutput]:
        collector = await self.add_request(request)
        try:
            while True:
                out = await collector.get()
                yield out
                if out.finished:
                    break
        finally:
            with self._collector_lock:
                self._collectors.pop(request.request_id, None)
            if not request.is_finished():
                self.abort_request(request.request_id)

    def get_stats(self) -> dict:
        s = self.scheduler
        return {
            "running": s.num_running,
            "waiting": s.num_waiting,
            **s.stats.as_dict(),
        }

    # ------------------------------------------------------------------ loop
    def _engine_loop(self) -> None:
        logger.info("engine loop started")
        try:
            while self._running:
                did_work = False
                while True:
                    try:
                        req = self._incoming.get_nowait()
                    except thread_queue.Empty:
                        break
                    try:
                        self.scheduler.add_request(req)
                    except Exception as e:
                        self._emit_error(req, e)
                    did_work = True
                if self.scheduler.has_unfinished():
                    try:
                        outputs = self.scheduler.step()
                    except Exception as e:
                        # per-step failure: fail in-flight requests, reset
                        # device state, keep serving (reference
                        # scheduler.py:2563-2583 step error recovery)
                        logger.exception("scheduler step failed; recovering")
                        outputs = self.scheduler.recover_from_error(e)
                    for out in outputs:
                        self._route(out)
                    did_work = True
                if not did_work:
                    time.sleep(IDLE_SLEEP_S)
        except BaseException as e:  # engine-fatal
            logger.exception("engine loop crashed")
            self._error = e
            self._running = False
            self._fail_all(e)

    def _route(self, out: RequestOutput) -> None:
        with self._collector_lock:
            collector = self._collectors.get(out.request_id)
        if collector is not None:
            collector.put_threadsafe(out)

    def _emit_error(self, req: Request, err: Exception) -> None:
        logger.error("request %s rejected: %s", req.request_id, err)
        out = RequestOutput(
            request_id=req.request_id,
            finished=True,
            finish_reason="error",
            output_text="",
        )
        self._route(out)

    def _fail_all(self, err: BaseException) -> None:
        with self._collector_lock:
            collectors = dict(self._collectors)
        for rid, c in collectors.items():
            c.put_threadsafe(
                RequestOutput(
                    request_id=rid, finished=True, finish_reason="error"
                )
            )
