# SPDX-License-Identifier: Apache-2.0
"""Continuous-batching scheduler over the fixed-slot ModelRunner.

vLLM-style waiting/running queues with chunked prefill interleaved into
every step (reference scheduler.py:1133-2627, with the mlx-lm
BatchGenerator monkey-patches replaced by first-class code per
SURVEY.md section 0.4):

  step():
    1. drain deferred aborts (reference pattern, scheduler.py:1895-1903)
    2. admit waiting requests into free slots (prefix-cache fetch on admit)
    3. run prompt chunks within the per-step prefill token budget;
       a request's final chunk samples its first output token in-jit
    4. one batched decode step for every active slot
    5. detokenize, stop-check, emit RequestOutputs, free finished slots

**Pipelined result processing**: device->host sync on this platform
costs ~30 ms, so the scheduler never blocks on the step it just
dispatched. Results are fetched via async copies and consumed
``pipeline_depth`` steps later; a request that hit its stop condition
decodes a few zombie tokens (written to the scratch block / discarded)
before its slot is reclaimed. Bundles are epoch-tagged so slot reuse and
preemption can never credit a token to the wrong request.

Preemption: when KV blocks run out, the *latest* running request (FCFS
order) is evicted and re-queued for recompute (prompt + generated so
far) — preempting an earlier request for a later one would livelock.
This mirrors the reference's re-queue-on-recovery semantics
(reference scheduler.py:2415-2489).
"""

from __future__ import annotations

import logging
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Deque, Dict, List, Optional, Set, Tuple

import numpy as np

from ..config import SchedulerConfig
from .block_manager import BlockManager
from .detokenizer import StreamingDetokenizer
from .model_runner import ModelRunner
from .request import Request, RequestOutput, RequestStatus

logger = logging.getLogger(__name__)


class SchedulerStats:
    def __init__(self) -> None:
        self.num_steps = 0
        self.num_prompt_tokens = 0
        self.num_generated_tokens = 0
        self.num_finished = 0
        self.num_preempted = 0
        self.prefix_cache_hits = 0
        self.prefix_cache_queries = 0
        self.prefix_cached_tokens = 0

    def as_dict(self) -> Dict[str, float]:
        return dict(self.__dict__)


def _all_tokens(req: Request) -> List[int]:
    """Prompt plus generated-so-far: the recompute unit after preemption."""
    return list(req.prompt_token_ids or []) + list(req.output_token_ids)


@dataclass
class _StepBundle:
    """One dispatched step's device handles, consumed with a lag."""

    # rid -> (epoch, token_dev, logprob_dev): prefill-final first tokens
    first_tokens: Dict[str, Tuple[int, object, object]] = field(
        default_factory=dict
    )
    decode_tokens: Optional[object] = None  # [S] device array
    decode_logprobs: Optional[object] = None
    # rid -> (epoch, slot) for requests included in this decode dispatch
    decode_slots: Dict[str, Tuple[int, int]] = field(default_factory=dict)


def _default_pipeline_depth() -> int:
    import jax

    return 0 if jax.default_backend() == "cpu" else 2


class Scheduler:
    def __init__(
        self,
        runner: ModelRunner,
        tokenizer,
        config: Optional[SchedulerConfig] = None,
        stop_tokens: Optional[set] = None,
        prefix_cache=None,
        pipeline_depth: Optional[int] = None,
    ) -> None:
        self.runner = runner
        self.config = config or runner.sched_cfg
        self.tokenizer = tokenizer
        self.detok = StreamingDetokenizer(tokenizer) if tokenizer else None
        self.block_size = runner.block_size
        self.block_mgr = BlockManager(
            runner.cache_cfg.num_blocks, runner.block_size
        )
        self.prefix_cache = prefix_cache
        self.pipeline_depth = (
            pipeline_depth
            if pipeline_depth is not None
            else _default_pipeline_depth()
        )

        self.waiting: Deque[Request] = deque()
        self.running: List[Request] = []
        self.requests: Dict[str, Request] = {}
        self.slots: List[Optional[Request]] = [None] * runner.max_num_seqs
        # tokens (prompt [+ recompute output]) not yet prefilled
        self._pending_prompt: Dict[str, List[int]] = {}
        self._pending_aborts: Set[str] = set()
        self._immediate_outputs: List[RequestOutput] = []
        self._inflight: Deque[_StepBundle] = deque()
        # per-request: dispatched-but-unprocessed accounting
        self._epoch: Dict[str, int] = {}
        self._base_len: Dict[str, int] = {}
        self._dispatched: Dict[str, int] = {}
        self.stats = SchedulerStats()
        self._default_stop_tokens = set(stop_tokens or set())

    # ------------------------------------------------------------------ admin
    def add_request(self, request: Request) -> None:
        if request.prompt_token_ids is None:
            if isinstance(request.prompt, str):
                if self.tokenizer is None:
                    raise ValueError("string prompt requires a tokenizer")
                request.prompt_token_ids = self.tokenizer.encode(request.prompt)
            else:
                request.prompt_token_ids = list(request.prompt)
        if not request.prompt_token_ids:
            bos = getattr(self.tokenizer, "bos_token_id", None)
            request.prompt_token_ids = [bos if bos is not None else 0]
        request.num_prompt_tokens = len(request.prompt_token_ids)
        if request.num_prompt_tokens >= self.config.max_model_len:
            raise ValueError(
                f"prompt of {request.num_prompt_tokens} tokens exceeds "
                f"max_model_len {self.config.max_model_len}"
            )
        self.requests[request.request_id] = request
        self.waiting.append(request)

    def abort_request(self, request_id: str) -> None:
        """Deferred: applied at the top of the next step (thread-safe)."""
        self._pending_aborts.add(request_id)

    def has_unfinished(self) -> bool:
        return bool(self.waiting or self.running)

    @property
    def num_waiting(self) -> int:
        return len(self.waiting)

    @property
    def num_running(self) -> int:
        return len(self.running)

    # ------------------------------------------------------------------ steps
    def step(self) -> List[RequestOutput]:
        self.stats.num_steps += 1
        outputs: List[RequestOutput] = []
        outputs.extend(self._process_aborts())
        self._schedule_waiting()
        if self._immediate_outputs:
            outputs.extend(self._immediate_outputs)
            self._immediate_outputs.clear()
        bundle = _StepBundle()
        self._run_prefill_chunks(bundle)
        self._run_decode(bundle)
        if (
            bundle.first_tokens
            or bundle.decode_slots
            or self._inflight
        ):
            if bundle.first_tokens or bundle.decode_slots:
                self._inflight.append(bundle)
            while len(self._inflight) > self.pipeline_depth:
                outputs.extend(self._process_bundle(self._inflight.popleft()))
            # nothing left to dispatch -> drain everything
            if not self._pending_prompt and not self.waiting:
                still_running = any(
                    r.status == RequestStatus.RUNNING for r in self.running
                )
                if not still_running:
                    while self._inflight:
                        outputs.extend(
                            self._process_bundle(self._inflight.popleft())
                        )
        return outputs

    def flush(self) -> List[RequestOutput]:
        """Force-process every in-flight bundle."""
        outputs: List[RequestOutput] = []
        while self._inflight:
            outputs.extend(self._process_bundle(self._inflight.popleft()))
        return outputs

    # ----------------------------------------------------------------- aborts
    def _process_aborts(self) -> List[RequestOutput]:
        outs: List[RequestOutput] = []
        if not self._pending_aborts:
            return outs
        aborts, self._pending_aborts = self._pending_aborts, set()
        for rid in aborts:
            req = self.requests.get(rid)
            if req is None or req.is_finished():
                continue
            if req.status == RequestStatus.WAITING:
                try:
                    self.waiting.remove(req)
                except ValueError:
                    pass
            req.set_finished(RequestStatus.FINISHED_ABORTED)
            self._release(req)
            outs.append(self._make_output(req, [], ""))
        return outs

    # -------------------------------------------------------------- admission
    def _free_slot(self) -> Optional[int]:
        for i, r in enumerate(self.slots):
            if r is None:
                return i
        return None

    def _schedule_waiting(self) -> None:
        while self.waiting:
            slot = self._free_slot()
            if slot is None:
                return
            req = self.waiting[0]
            tokens = _all_tokens(req)
            cached_tokens = 0
            cached_blocks: List[int] = []
            if self.prefix_cache is not None:
                cached_blocks, cached_tokens, hit = self.prefix_cache.fetch(
                    self.block_mgr, tokens
                )
                req.cache_hit_type = hit
                self.stats.prefix_cache_queries += 1
                if cached_tokens:
                    self.stats.prefix_cache_hits += 1
                    self.stats.prefix_cached_tokens += cached_tokens
            # Never cache-skip the entire sequence: the last token must be
            # re-forwarded to produce next-token logits, and it must land in
            # a private (non-shared) block — drop trailing cached blocks
            # (reference "exact hit: trim 1, replay",
            # mllm_batch_generator.py:1512-1544).
            if cached_tokens >= len(tokens):
                keep_blocks = (len(tokens) - 1) // self.block_size
                for b in cached_blocks[keep_blocks:]:
                    self.block_mgr.free([b], cache=True)
                cached_blocks = cached_blocks[:keep_blocks]
                cached_tokens = keep_blocks * self.block_size
            n_needed = -(-(len(tokens) + 1) // self.block_size) - len(
                cached_blocks
            )
            new_blocks = self.block_mgr.allocate(n_needed)
            if new_blocks is None:
                self.block_mgr.free(cached_blocks, cache=True)
                req.cache_hit_type = None
                if not self.running and not self._inflight:
                    # Nothing will ever free more blocks: the request
                    # cannot fit in the pool at all.
                    self.waiting.popleft()
                    req.set_finished(
                        RequestStatus.FINISHED_ERROR,
                        "prompt does not fit in KV cache",
                    )
                    logger.error(
                        "request %s needs %d blocks but pool has %d",
                        req.request_id,
                        n_needed,
                        self.block_mgr.num_blocks - 1,
                    )
                    self._immediate_outputs.append(
                        self._make_output(req, [], "")
                    )
                    continue
                return  # no KV memory; retry next step
            self.waiting.popleft()
            req.blocks = cached_blocks + new_blocks
            req.cached_tokens = cached_tokens
            req.num_computed_tokens = cached_tokens
            req.slot = slot
            req.status = RequestStatus.RUNNING
            self.slots[slot] = req
            self.running.append(req)
            rid = req.request_id
            self._pending_prompt[rid] = tokens[cached_tokens:]
            self._epoch[rid] = self._epoch.get(rid, 0) + 1
            self._base_len[rid] = len(tokens)
            self._dispatched[rid] = 0
            sp = req.sampling_params
            self.runner.set_block_table_row(slot, req.blocks)
            self.runner.configure_slot_sampling(
                slot,
                temperature=sp.temperature,
                top_k=sp.top_k,
                top_p=sp.top_p,
                min_p=sp.min_p,
                repetition_penalty=sp.repetition_penalty,
                prompt_tail=tokens[-20:],
            )
            if self.detok is not None and req.detok_state is None:
                req.detok_state = self.detok.new_state(tokens[-6:])

    # ---------------------------------------------------------------- prefill
    def _run_prefill_chunks(self, bundle: _StepBundle) -> None:
        budget = self.config.max_prefill_tokens
        max_bucket = self.runner.chunk_buckets[-1]
        for req in list(self.running):
            if budget <= 0:
                break
            rid = req.request_id
            pending = self._pending_prompt.get(rid)
            if not pending:
                continue
            while pending and budget > 0:
                chunk = pending[: min(budget, max_bucket)]
                is_last = len(chunk) == len(pending)
                tok, lp = self.runner.prefill_chunk(
                    chunk, req.num_computed_tokens, req.slot, is_last
                )
                req.num_computed_tokens += len(chunk)
                self.stats.num_prompt_tokens += len(chunk)
                budget -= len(chunk)
                pending = pending[len(chunk):]
                self._pending_prompt[rid] = pending
                if is_last:
                    del self._pending_prompt[rid]
                    try:
                        tok.copy_to_host_async()
                        lp.copy_to_host_async()
                    except Exception:
                        pass
                    bundle.first_tokens[rid] = (self._epoch[rid], tok, lp)

    # ----------------------------------------------------------------- decode
    def _decode_ready(self, req: Request) -> bool:
        return (
            req.status == RequestStatus.RUNNING
            and req.request_id not in self._pending_prompt
        )

    def _ensure_growth(self, req: Request) -> bool:
        """Ensure a block exists for this request's next decode write.
        Returns False if ``req`` was preempted in the process."""
        rid = req.request_id
        pos = self._base_len[rid] + self._dispatched[rid]
        if pos >= self.config.max_model_len:
            return True  # zombie/capped writes route to the scratch block
        idx = pos // self.block_size
        while idx >= len(req.blocks):
            blocks = self.block_mgr.allocate(1)
            if blocks is None:
                self._preempt_someone(excluding=req)
                blocks = self.block_mgr.allocate(1)
            if blocks is None:
                self._preempt(req)
                return False
            req.blocks.append(blocks[0])
            self.runner.extend_block_table(
                req.slot, len(req.blocks) - 1, blocks[0]
            )
        return True

    def _run_decode(self, bundle: _StepBundle) -> None:
        candidates = [r for r in self.running if self._decode_ready(r)]
        for req in list(candidates):
            # an earlier candidate's growth may have preempted this one
            if not self._decode_ready(req):
                candidates.remove(req)
                continue
            if not self._ensure_growth(req):
                candidates.remove(req)
        # growth-triggered preemption may have evicted other candidates too
        decoding = [r for r in candidates if self._decode_ready(r)]
        if not decoding:
            return
        greedy_only = all(r.sampling_params.temperature == 0 for r in decoding)
        tokens, logprobs = self.runner.decode(greedy_only=greedy_only)
        try:
            tokens.copy_to_host_async()
            logprobs.copy_to_host_async()
        except Exception:
            pass
        bundle.decode_tokens = tokens
        bundle.decode_logprobs = logprobs
        for r in decoding:
            rid = r.request_id
            self._dispatched[rid] += 1
            bundle.decode_slots[rid] = (self._epoch[rid], r.slot)

    # ------------------------------------------------------------- preemption
    def _preempt_someone(self, excluding: Request) -> None:
        # Only requests strictly later in FCFS order are eligible victims;
        # preempting an earlier request for a later one livelocks.
        key = (excluding.priority, excluding.arrival_time)
        candidates = [
            r
            for r in self.running
            if r is not excluding
            and r.status == RequestStatus.RUNNING
            and (r.priority, r.arrival_time) > key
        ]
        if not candidates:
            return
        victim = max(candidates, key=lambda r: (r.priority, r.arrival_time))
        self._preempt(victim)

    def _preempt(self, req: Request) -> None:
        logger.warning(
            "preempting request %s (out of KV blocks)", req.request_id
        )
        self.stats.num_preempted += 1
        self._release(req)
        req.status = RequestStatus.WAITING
        req.num_computed_tokens = 0
        req.cached_tokens = 0
        self.waiting.appendleft(req)

    def _release(self, req: Request) -> None:
        if req.slot is not None:
            self.runner.release_slot(req.slot)
            self.slots[req.slot] = None
            req.slot = None
        if req.blocks:
            cache = False
            if self.prefix_cache is not None and req.is_finished():
                cache = self.prefix_cache.store(
                    self.block_mgr, _all_tokens(req), req.blocks
                )
            self.block_mgr.free(req.blocks, cache=cache)
            req.blocks = []
        rid = req.request_id
        self._pending_prompt.pop(rid, None)
        self._dispatched.pop(rid, None)
        self._base_len.pop(rid, None)
        if req in self.running:
            self.running.remove(req)

    # ------------------------------------------------------- output handling
    def _stop_token_set(self, req: Request) -> set:
        s = set(self._default_stop_tokens)
        s.update(req.sampling_params.stop_token_ids or [])
        return s

    def _process_one_token(
        self, req: Request, token: int, logprob: float
    ) -> Tuple[List[int], str]:
        """Append one generated token; returns (new_tokens, emitted_text)."""
        req.output_token_ids.append(token)
        req.output_logprobs.append(logprob)
        if req.first_token_time is None:
            req.first_token_time = time.time()
        self.stats.num_generated_tokens += 1
        sp = req.sampling_params

        if token in self._stop_token_set(req):
            req.output_token_ids.pop()
            req.output_logprobs.pop()
            req.set_finished(RequestStatus.FINISHED_STOPPED)
            if self.detok is not None and req.detok_state is not None:
                tail = self.detok.flush(req.detok_state)
                if tail:
                    req.output_text += tail
                    return [], tail
            return [], ""

        new_text = ""
        if self.detok is not None and req.detok_state is not None:
            new_text = self.detok.step(req.detok_state, token)

        # stop strings: trim at first occurrence
        if sp.stop and new_text:
            combined = req.output_text + new_text
            for s_str in sp.stop:
                idx = combined.find(s_str)
                if idx != -1:
                    req.set_finished(RequestStatus.FINISHED_STOPPED)
                    emit = combined[len(req.output_text): idx]
                    req.output_text = combined[:idx]
                    return [token], emit

        req.output_text += new_text

        if (
            req.num_output_tokens >= sp.max_tokens
            or req.num_tokens >= self.config.max_model_len
        ):
            req.set_finished(RequestStatus.FINISHED_LENGTH_CAPPED)
            if self.detok is not None and req.detok_state is not None:
                tail = self.detok.flush(req.detok_state)
                if tail:
                    req.output_text += tail
                    new_text += tail
        return [token], new_text

    def _make_output(
        self, req: Request, new_tokens: List[int], new_text: str
    ) -> RequestOutput:
        return RequestOutput(
            request_id=req.request_id,
            new_token_ids=new_tokens,
            new_text=new_text,
            output_token_ids=list(req.output_token_ids),
            output_text=req.output_text,
            finished=req.is_finished(),
            finish_reason=req.get_finish_reason(),
            prompt_tokens=req.num_prompt_tokens,
            completion_tokens=req.num_output_tokens,
            cached_tokens=req.cached_tokens,
            mtp_drafts=req.mtp_drafts,
            mtp_accepted=req.mtp_accepted,
        )

    def _process_bundle(self, bundle: _StepBundle) -> List[RequestOutput]:
        outs: List[RequestOutput] = []
        decode_toks = (
            np.asarray(bundle.decode_tokens)
            if bundle.decode_tokens is not None
            else None
        )
        decode_lps = (
            np.asarray(bundle.decode_logprobs)
            if bundle.decode_logprobs is not None
            else None
        )
        touched: List[Request] = []
        for rid, (epoch, tok_dev, lp_dev) in bundle.first_tokens.items():
            req = self.requests.get(rid)
            if (
                req is None
                or req.status != RequestStatus.RUNNING
                or self._epoch.get(rid) != epoch
            ):
                continue
            new_toks, new_txt = self._process_one_token(
                req, int(np.asarray(tok_dev)), float(np.asarray(lp_dev))
            )
            req._gained = (new_toks, new_txt)  # type: ignore[attr-defined]
            touched.append(req)
        for rid, (epoch, slot) in bundle.decode_slots.items():
            req = self.requests.get(rid)
            if (
                req is None
                or req.status != RequestStatus.RUNNING
                or self._epoch.get(rid) != epoch
                or decode_toks is None
            ):
                continue
            new_toks, new_txt = self._process_one_token(
                req, int(decode_toks[slot]), float(decode_lps[slot])
            )
            prev = getattr(req, "_gained", None)
            if prev is not None and req in touched:
                req._gained = (prev[0] + new_toks, prev[1] + new_txt)  # type: ignore
            else:
                req._gained = (new_toks, new_txt)  # type: ignore[attr-defined]
                touched.append(req)
        for req in touched:
            gained_tokens, gained_text = req._gained  # type: ignore[attr-defined]
            del req._gained
            if gained_tokens or gained_text or req.is_finished():
                outs.append(self._make_output(req, gained_tokens, gained_text))
            if req.is_finished():
                self.stats.num_finished += 1
                self._release(req)
        return outs
