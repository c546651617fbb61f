# SPDX-License-Identifier: Apache-2.0
"""High-level language model API.

Parity with the reference's ``MLXLanguageModel`` (reference
models/llm.py:40: load/generate/stream_generate/chat), rebuilt on the
TPU engine: loading materializes JAX params + a precompiled fixed-slot
runner, and generation drives the continuous-batching scheduler
synchronously.
"""

from __future__ import annotations

import logging
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Dict, Generator, List, Optional, Union

from ..config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from ..core.model_runner import ModelRunner, enable_persistent_compilation_cache
from ..core.request import Request, SamplingParams
from ..core.scheduler import Scheduler
from ..utils.tokenizer import apply_chat_template, collect_eos_ids, load_tokenizer

logger = logging.getLogger(__name__)


@dataclass
class GenerationResult:
    text: str = ""
    token_ids: List[int] = field(default_factory=list)
    finish_reason: Optional[str] = None
    prompt_tokens: int = 0
    completion_tokens: int = 0
    cached_tokens: int = 0
    generation_time: float = 0.0
    ttft: Optional[float] = None

    @property
    def tokens_per_second(self) -> float:
        if self.generation_time <= 0:
            return 0.0
        return self.completion_tokens / self.generation_time


@dataclass
class StreamChunk:
    text: str
    token_ids: List[int]
    finished: bool = False
    finish_reason: Optional[str] = None


class LanguageModel:
    """Load-and-generate interface over a local HF-format checkpoint."""

    def __init__(
        self,
        model_path: str,
        *,
        cache_config: Optional[CacheConfig] = None,
        scheduler_config: Optional[SchedulerConfig] = None,
        prefix_cache: Any = None,
        seed: int = 0,
    ) -> None:
        self.model_path = model_path
        self.cache_config = cache_config or CacheConfig()
        self.scheduler_config = scheduler_config or SchedulerConfig()
        self._prefix_cache = prefix_cache
        self._seed = seed
        self.config: Optional[ModelConfig] = None
        self.tokenizer = None
        self.runner: Optional[ModelRunner] = None
        self.scheduler: Optional[Scheduler] = None
        self._loaded = False

    # ------------------------------------------------------------------- load
    def load(
        self, params: Any = None, config: Optional[ModelConfig] = None
    ) -> "LanguageModel":
        if self._loaded:
            return self
        enable_persistent_compilation_cache()
        t0 = time.time()
        from . import loader

        self.config = config or ModelConfig.from_pretrained(self.model_path)
        if params is None:
            params = loader.load_params(self.model_path, self.config)
        self.tokenizer = load_tokenizer(self.model_path)
        eos = collect_eos_ids(self.tokenizer, self.model_path)
        eos.update(self.config.eos_token_ids)
        self.runner = ModelRunner(
            self.config,
            params,
            self.cache_config,
            self.scheduler_config,
            rng_seed=self._seed,
        )
        self.scheduler = Scheduler(
            self.runner,
            self.tokenizer,
            stop_tokens=eos,
            prefix_cache=self._prefix_cache,
        )
        self._loaded = True
        logger.info("loaded %s in %.1fs", self.model_path, time.time() - t0)
        return self

    @property
    def is_loaded(self) -> bool:
        return self._loaded

    def _require_loaded(self) -> None:
        if not self._loaded:
            raise RuntimeError("call load() first")

    # --------------------------------------------------------------- generate
    def _make_params(self, **kwargs) -> SamplingParams:
        known = {
            "max_tokens", "temperature", "top_p", "top_k", "min_p",
            "presence_penalty", "repetition_penalty", "stop",
            "stop_token_ids", "logprobs", "seed", "logits_processors",
        }
        return SamplingParams(**{k: v for k, v in kwargs.items() if k in known})

    def generate(
        self, prompt: Union[str, List[int]], **kwargs
    ) -> GenerationResult:
        result = GenerationResult()
        t0 = time.time()
        first = None
        for chunk in self.stream_generate(prompt, **kwargs):
            if chunk.token_ids and first is None:
                first = time.time()
            result.text += chunk.text
            result.token_ids.extend(chunk.token_ids)
            if chunk.finished:
                result.finish_reason = chunk.finish_reason
        result.generation_time = time.time() - t0
        result.ttft = (first - t0) if first else None
        result.prompt_tokens = self._last_prompt_tokens
        result.completion_tokens = len(result.token_ids)
        result.cached_tokens = self._last_cached_tokens
        return result

    def stream_generate(
        self, prompt: Union[str, List[int]], **kwargs
    ) -> Generator[StreamChunk, None, None]:
        self._require_loaded()
        req = Request(
            request_id=f"gen-{uuid.uuid4().hex[:12]}",
            prompt=prompt,
            sampling_params=self._make_params(**kwargs),
        )
        self.scheduler.add_request(req)
        self._last_prompt_tokens = 0
        self._last_cached_tokens = 0
        try:
            finished = False
            while not finished:
                for out in self.scheduler.step():
                    if out.request_id != req.request_id:
                        continue
                    self._last_prompt_tokens = out.prompt_tokens
                    self._last_cached_tokens = out.cached_tokens
                    yield StreamChunk(
                        text=out.new_text,
                        token_ids=out.new_token_ids,
                        finished=out.finished,
                        finish_reason=out.finish_reason,
                    )
                    if out.finished:
                        finished = True
                if not self.scheduler.has_unfinished():
                    break
        finally:
            if not req.is_finished():
                self.scheduler.abort_request(req.request_id)
                self.scheduler.step()

    # ------------------------------------------------------------------- chat
    def chat(
        self,
        messages: List[Dict[str, Any]],
        *,
        tools: Optional[List[Dict[str, Any]]] = None,
        chat_template_kwargs: Optional[Dict[str, Any]] = None,
        **kwargs,
    ) -> GenerationResult:
        prompt = apply_chat_template(
            self.tokenizer,
            messages,
            tools=tools,
            chat_template_kwargs=chat_template_kwargs,
        )
        return self.generate(prompt, **kwargs)

    def stream_chat(
        self,
        messages: List[Dict[str, Any]],
        *,
        tools: Optional[List[Dict[str, Any]]] = None,
        chat_template_kwargs: Optional[Dict[str, Any]] = None,
        **kwargs,
    ) -> Generator[StreamChunk, None, None]:
        prompt = apply_chat_template(
            self.tokenizer,
            messages,
            tools=tools,
            chat_template_kwargs=chat_template_kwargs,
        )
        yield from self.stream_generate(prompt, **kwargs)
