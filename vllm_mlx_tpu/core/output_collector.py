# SPDX-License-Identifier: Apache-2.0
"""Per-request output queues bridging the engine thread and asyncio.

Parity with the reference's RequestOutputCollector/RequestStreamState
(reference output_collector.py:17-206): outputs produced faster than the
client consumes are merged, and `stream interval` gating batches
streamed deltas every N tokens.
"""

from __future__ import annotations

import asyncio
from typing import Optional

from .request import RequestOutput


class RequestOutputCollector:
    """Single-consumer queue with merge-on-put (engine-thread safe)."""

    def __init__(self, loop: asyncio.AbstractEventLoop) -> None:
        self._loop = loop
        self._queue: asyncio.Queue = asyncio.Queue()
        self._pending: Optional[RequestOutput] = None
        self._lock = None  # all mutation marshalled onto the loop

    def put_threadsafe(self, out: RequestOutput) -> None:
        """Called from the engine thread."""
        self._loop.call_soon_threadsafe(self._put, out)

    def _put(self, out: RequestOutput) -> None:
        self._queue.put_nowait(out)

    async def get(self) -> RequestOutput:
        out: RequestOutput = await self._queue.get()
        # opportunistically merge everything already queued
        while not self._queue.empty():
            nxt = self._queue.get_nowait()
            out = merge_outputs(out, nxt)
        return out


def merge_outputs(a: RequestOutput, b: RequestOutput) -> RequestOutput:
    """Merge consecutive outputs for the same request (b is newer)."""
    return RequestOutput(
        request_id=b.request_id,
        new_token_ids=a.new_token_ids + b.new_token_ids,
        new_logprobs=a.new_logprobs + b.new_logprobs,
        new_text=a.new_text + b.new_text,
        output_token_ids=b.output_token_ids,
        output_text=b.output_text,
        finished=b.finished,
        finish_reason=b.finish_reason or a.finish_reason,
        prompt_tokens=b.prompt_tokens,
        completion_tokens=b.completion_tokens,
        cached_tokens=b.cached_tokens,
        mtp_drafts=b.mtp_drafts,
        mtp_accepted=b.mtp_accepted,
    )


class RequestStreamState:
    """Stream-interval gating: emit every Nth token or on finish
    (reference output_collector.py:174-206)."""

    def __init__(self, stream_interval: int = 1) -> None:
        self.stream_interval = max(1, stream_interval)
        self._since_last = 0

    def should_send(self, out: RequestOutput) -> bool:
        if out.finished:
            return True
        self._since_last += len(out.new_token_ids)
        if self._since_last >= self.stream_interval:
            self._since_last = 0
            return True
        return False
