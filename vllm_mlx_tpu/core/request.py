# SPDX-License-Identifier: Apache-2.0
"""Request lifecycle types for continuous batching.

Public surface kept compatible with the reference's vLLM-derived types
(reference request.py:18-228): RequestStatus, SamplingParams, Request,
RequestOutput. TPU-specific additions: the slot index and host-side
block accounting used by the fixed-slot scheduler.
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Union


class RequestStatus(enum.IntEnum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    PREEMPTED = enum.auto()
    FINISHED_STOPPED = enum.auto()
    FINISHED_LENGTH_CAPPED = enum.auto()
    FINISHED_ABORTED = enum.auto()
    FINISHED_ERROR = enum.auto()

    @staticmethod
    def is_finished(status: "RequestStatus") -> bool:
        return status > RequestStatus.PREEMPTED

    @staticmethod
    def get_finish_reason(status: "RequestStatus") -> Optional[str]:
        return {
            RequestStatus.FINISHED_STOPPED: "stop",
            RequestStatus.FINISHED_LENGTH_CAPPED: "length",
            RequestStatus.FINISHED_ABORTED: "abort",
            RequestStatus.FINISHED_ERROR: "error",
        }.get(status)


@dataclass
class SamplingParams:
    max_tokens: int = 256
    temperature: float = 0.7
    top_p: float = 0.9
    top_k: int = 0  # 0 = disabled
    min_p: float = 0.0
    presence_penalty: float = 0.0
    repetition_penalty: float = 1.0
    stop: Optional[List[str]] = None
    stop_token_ids: Optional[List[int]] = None
    logprobs: bool = False
    seed: Optional[int] = None
    # Constrained decoding hook: callable(token_ids, vocab) -> allow mask,
    # or an object implementing the TokenFilter protocol (constrained/).
    logits_processors: Optional[List[Callable]] = None

    def __post_init__(self) -> None:
        if self.stop is None:
            self.stop = []
        if self.stop_token_ids is None:
            self.stop_token_ids = []


@dataclass
class Request:
    request_id: str
    prompt: Union[str, List[int]]
    sampling_params: SamplingParams
    arrival_time: float = field(default_factory=time.time)
    priority: int = 0

    prompt_token_ids: Optional[List[int]] = None
    num_prompt_tokens: int = 0

    status: RequestStatus = RequestStatus.WAITING
    num_computed_tokens: int = 0  # prompt tokens already in the KV pool
    output_token_ids: List[int] = field(default_factory=list)
    output_logprobs: List[float] = field(default_factory=list)
    output_text: str = ""

    # Fixed-slot scheduler state
    slot: Optional[int] = None
    blocks: List[int] = field(default_factory=list)  # owned block ids

    # Multimodal: precomputed embeddings aligned with prompt_token_ids
    # (rows where embeds_mask is True replace the token embedding)
    prompt_embeds: Optional[Any] = None  # np [num_prompt_tokens, H]
    # Qwen3-VL deepstack features aligned to prompt rows [n_ds, T, H]
    deepstack_embeds: Optional[Any] = None
    embeds_mask: Optional[Any] = None  # np [num_prompt_tokens] bool
    is_multimodal: bool = False
    # Qwen-VL M-RoPE: explicit (t, h, w) prompt positions + decode delta
    # (HF get_rope_index semantics; None for text / non-mrope models)
    mrope_positions: Optional[Any] = None  # np [3, num_prompt_tokens] i32
    mrope_delta: int = 0
    # SpecPrefill: original-position rope override for a pruned prompt
    # (1-D; kv slots stay compacted, only rotary positions differ)
    rope_positions: Optional[Any] = None  # np [num_prompt_tokens] i32
    # content hashes of media spans for prefix-cache keying
    # [(start_row, end_row, hash_hex)] over the expanded prompt
    media_spans: Optional[Any] = None
    # Mllama cross-attention payload (models/mllama_mm.py): dict with
    # cross_states (device [W, H]), tok_lo/tok_hi ([Lc_cap] i32 per-kv
    # token windows), width (int). Written into the slot's cross-KV
    # buffers at admission; persists for preempt->recompute.
    cross_payload: Optional[Any] = None
    # bidirectional-attention spans [(lo, hi)) over the expanded prompt
    # (Gemma3 image runs / PaliGemma prefix-LM; HF token_type_ids mask
    # semantics). The scheduler never ends a prefill chunk strictly
    # inside one, and serves at most one span per chunk
    # (ops/ragged_bidir_kernel.py contract).
    bidir_spans: Optional[Any] = None
    # leading KV blocks reclaimed behind the rotating attention window
    # (max_kv_size); their table entries are stale but never read
    num_retired_blocks: int = 0
    # prompt blocks already published to the prefix cache mid-prefill
    # (reference mid-prefill cache saves, scheduler.py:1470-1538);
    # publish_parent carries the incremental hash chain between steps
    published_blocks: int = 0
    publish_parent: Optional[str] = None

    # Prefix cache
    cached_tokens: int = 0
    cache_hit_type: Optional[str] = None  # exact/prefix/lcp/miss
    prefix_boundary: int = 0

    # Detokenizer state (owned by the output processor)
    detok_state: Any = None

    # FSM-constrained decoding (owned by the scheduler): a
    # JsonTokenEnforcer and its current parse state. Enforced requests
    # run synchronously on the ragged path with per-step allow-masks.
    enforcer: Any = None
    fsm_state: Any = None
    # Thinking-aware constrained decoding (reference
    # constrained/thinking_processor.py:60-283): reasoning models get an
    # unconstrained think phase before the FSM engages. Phases:
    # None = FSM active from token 0; "think" = unconstrained until
    # think_end_ids appear or think_budget tokens elapse; "force" =
    # masking to exactly think_end_ids[think_force_idx] each step.
    think_phase: Optional[str] = None
    think_budget: int = 0
    think_end_ids: Optional[List[int]] = None
    think_force_idx: int = 0

    finish_reason: Optional[str] = None
    first_token_time: Optional[float] = None
    finish_time: Optional[float] = None

    # Speculative decoding counters
    mtp_drafts: int = 0
    mtp_accepted: int = 0

    @property
    def num_output_tokens(self) -> int:
        return len(self.output_token_ids)

    @property
    def num_tokens(self) -> int:
        return self.num_prompt_tokens + self.num_output_tokens

    @property
    def max_tokens(self) -> int:
        return self.sampling_params.max_tokens

    def is_finished(self) -> bool:
        return RequestStatus.is_finished(self.status)

    def get_finish_reason(self) -> Optional[str]:
        return self.finish_reason or RequestStatus.get_finish_reason(self.status)

    def set_finished(
        self, status: RequestStatus, reason: Optional[str] = None
    ) -> None:
        self.status = status
        self.finish_reason = reason or RequestStatus.get_finish_reason(status)
        self.finish_time = time.time()

    def __lt__(self, other: "Request") -> bool:
        if self.priority != other.priority:
            return self.priority < other.priority
        return self.arrival_time < other.arrival_time

    def __hash__(self) -> int:
        return hash(self.request_id)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Request) and self.request_id == other.request_id


@dataclass
class RequestOutput:
    request_id: str
    new_token_ids: List[int] = field(default_factory=list)
    new_logprobs: List[float] = field(default_factory=list)
    new_text: str = ""
    output_token_ids: List[int] = field(default_factory=list)
    output_text: str = ""
    finished: bool = False
    finish_reason: Optional[str] = None
    prompt_tokens: int = 0
    completion_tokens: int = 0
    cached_tokens: int = 0
    mtp_drafts: int = 0
    mtp_accepted: int = 0

    @property
    def usage(self) -> Dict[str, int]:
        return {
            "prompt_tokens": self.prompt_tokens,
            "completion_tokens": self.completion_tokens,
            "total_tokens": self.prompt_tokens + self.completion_tokens,
        }
