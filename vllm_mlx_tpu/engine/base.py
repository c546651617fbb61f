# SPDX-License-Identifier: Apache-2.0
"""Engine abstraction shared by the API server.

Parity with the reference's BaseEngine contract (reference
engine/base.py:17-286): async lifecycle + generate/stream_generate/
chat/stream_chat + stats/abort, with GenerationOutput as the unit the
server's SSE generators consume.
"""

from __future__ import annotations

import abc
from dataclasses import dataclass, field
from typing import Any, AsyncIterator, Dict, List, Optional


class EngineBusy(Exception):
    """Raised by serialized engines when a request is already in flight
    (reference engine/base.py:70)."""


@dataclass
class GenerationOutput:
    """One streamed chunk (or the final aggregate) of a generation."""

    text: str = ""  # delta text for streaming; full text for non-stream
    token_ids: List[int] = field(default_factory=list)
    finished: bool = False
    finish_reason: Optional[str] = None
    prompt_tokens: int = 0
    completion_tokens: int = 0
    cached_tokens: int = 0
    logprobs: Optional[List[float]] = None
    mtp_drafts: int = 0
    mtp_accepted: int = 0

    @property
    def usage(self) -> Dict[str, int]:
        return {
            "prompt_tokens": self.prompt_tokens,
            "completion_tokens": self.completion_tokens,
            "total_tokens": self.prompt_tokens + self.completion_tokens,
        }


class BaseEngine(abc.ABC):
    """Async text-generation engine."""

    model_path: str

    @abc.abstractmethod
    async def start(self) -> None: ...

    @abc.abstractmethod
    async def stop(self) -> None: ...

    @property
    @abc.abstractmethod
    def is_running(self) -> bool: ...

    @abc.abstractmethod
    def stream_generate(
        self, prompt: Any, **kwargs
    ) -> AsyncIterator[GenerationOutput]: ...

    @abc.abstractmethod
    def stream_chat(
        self, messages: List[Dict[str, Any]], **kwargs
    ) -> AsyncIterator[GenerationOutput]: ...

    async def generate(self, prompt: Any, **kwargs) -> GenerationOutput:
        return await _aggregate(self.stream_generate(prompt, **kwargs))

    async def chat(
        self, messages: List[Dict[str, Any]], **kwargs
    ) -> GenerationOutput:
        return await _aggregate(self.stream_chat(messages, **kwargs))

    @abc.abstractmethod
    def abort_request(self, request_id: str) -> None: ...

    @abc.abstractmethod
    def get_stats(self) -> Dict[str, Any]: ...

    @property
    def tokenizer(self):  # pragma: no cover - overridden
        return None


async def _aggregate(
    stream: AsyncIterator[GenerationOutput],
) -> GenerationOutput:
    final = GenerationOutput()
    async for chunk in stream:
        final.text += chunk.text
        final.token_ids.extend(chunk.token_ids)
        if chunk.logprobs:
            if final.logprobs is None:
                final.logprobs = []
            final.logprobs.extend(chunk.logprobs)
        final.finished = chunk.finished
        final.finish_reason = chunk.finish_reason or final.finish_reason
        final.prompt_tokens = chunk.prompt_tokens or final.prompt_tokens
        final.completion_tokens = (
            chunk.completion_tokens or final.completion_tokens
        )
        final.cached_tokens = chunk.cached_tokens or final.cached_tokens
        final.mtp_drafts = chunk.mtp_drafts or final.mtp_drafts
        final.mtp_accepted = chunk.mtp_accepted or final.mtp_accepted
    return final
