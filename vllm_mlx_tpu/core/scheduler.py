# SPDX-License-Identifier: Apache-2.0
"""Continuous-batching scheduler over the unified ragged ModelRunner.

vLLM-style waiting/running queues (reference scheduler.py:1133-2627, with
the mlx-lm BatchGenerator monkey-patches replaced by first-class code per
SURVEY.md section 0.4). Each step builds ONE ragged token batch:

  step():
    1. drain deferred aborts (reference pattern, scheduler.py:1895-1903)
    2. admit waiting requests into free slots (prefix-cache fetch on admit)
    3. gather decode sequences (1 token each, read from device state) and
       prefill chunks (within the per-step token budget) into a single
       StepInput; dispatch one compiled step
    4. consume results `pipeline_depth` steps later: detokenize,
       stop-check, emit RequestOutputs, free finished slots

**Pipelined result processing**: device->host sync on this platform
costs ~30 ms, so the scheduler never blocks on the step it just
dispatched. Results are fetched via async copies and consumed a few
steps later; a request that hit its stop condition decodes a couple of
zombie tokens (dropped via the scatter's OOB sentinel / discarded on the
host) before its slot is reclaimed. Bundles are epoch-tagged so slot
reuse and preemption can never credit a token to the wrong request.

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
from .model_runner import ModelRunner, StepInput
from .request import Request, RequestOutput, RequestStatus

logger = logging.getLogger(__name__)


def _clamp_chunk_for_bidir(spans, c0: int, n: int) -> int:
    """Clamp a prefill chunk of ``n`` tokens starting at absolute
    position ``c0`` so that (a) the chunk never ENDS strictly inside a
    bidirectional span and (b) it overlaps at most ONE span (the
    kernel's per-sequence metadata carries a single [lo, hi) —
    ops/ragged_bidir_kernel.py). ``spans`` is sorted, non-overlapping
    [(lo, hi), ...]. Returns the clamped length; 0 = no progress
    possible this step (a resumed span's tail exceeds the remaining
    budget — the caller defers the request to the next step's fresh
    budget)."""
    end = c0 + n
    seen = False
    for lo, hi in spans:
        if hi <= c0:
            continue
        if lo >= end:
            break
        if seen:
            # a second span in one chunk: end the chunk where it starts
            return lo - c0
        if hi <= end:
            seen = True
            continue
        # this span would be cut by the chunk end
        if lo > c0:
            return lo - c0  # end the chunk at the span start
        return 0  # resumed mid-span but can't reach its end: defer
    return n


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
    """One dispatched step's device handles, consumed with a lag.

    ``step_results`` holds one (sampled, logprobs-or-None) pair per
    decode step covered by this dispatch (multi-step fast path packs
    several chained steps into one program)."""

    step_results: List[Tuple[object, Optional[object]]] = field(
        default_factory=list
    )
    # multi-step fast path: ONE packed device array [2, steps, S]
    # (tokens bitcast + logprobs) — a single fetch per bundle
    packed: Optional[object] = None
    # decode steps covered by this dispatch (pipeline-lag accounting)
    steps: int = 1
    # speculative round: packed is [k+1, S] emitted tokens (-1 = none);
    # host accounting assumed k+1 tokens and is corrected on processing
    spec: bool = False
    # rid -> (epoch, compact_index) for sequences whose sample is real
    seq_map: Dict[str, Tuple[int, int]] = field(default_factory=dict)


def _default_pipeline_depth() -> int:
    import jax

    return 0 if jax.default_backend() == "cpu" else 6


class Scheduler:
    def __init__(
        self,
        runner: ModelRunner,
        tokenizer,
        config: Optional[SchedulerConfig] = None,
        stop_tokens: Optional[set] = None,
        prefix_cache=None,
        pipeline_depth: Optional[int] = None,
        ssm_cache=None,
    ) -> None:
        self.runner = runner
        self.config = config or runner.sched_cfg
        self.tokenizer = tokenizer
        self.detok = StreamingDetokenizer(tokenizer) if tokenizer else None
        self.page_size = runner.page_size
        self.block_mgr = BlockManager(runner.num_pages, runner.page_size)
        self.prefix_cache = prefix_cache
        if prefix_cache is not None and hasattr(prefix_cache, "attach_spill"):
            prefix_cache.attach_spill(self.block_mgr, runner)
        # Pipeline lag is measured in STEPS, not bundles: a multi-step
        # decode bundle already covers `steps` device steps of latency
        # hiding, while ragged prefill bundles cover one each. This keeps
        # prefill deeply pipelined without adding 6x zombie-decode lag
        # after a multi-step bundle.
        self.pipeline_depth = (
            pipeline_depth
            if pipeline_depth is not None
            else _default_pipeline_depth()
        )

        self.waiting: Deque[Request] = deque()
        self.running: List[Request] = []
        self.requests: Dict[str, Request] = {}
        # Slots are prefix-compacted: occupied slots are exactly
        # 0..len(occupied)-1 (fast-path requirement; release swaps the
        # last occupied slot into the freed index).
        self.slots: List[Optional[Request]] = [None] * runner.max_num_seqs
        # tokens (prompt [+ recompute output]) not yet prefilled
        self._pending_prompt: Dict[str, List[int]] = {}
        self._pending_aborts: Set[str] = set()
        self._immediate_outputs: List[RequestOutput] = []
        self._inflight: Deque[_StepBundle] = deque()
        # per-request accounting of dispatched-but-unprocessed work
        self._epoch: Dict[str, int] = {}
        self._base_len: Dict[str, int] = {}
        self._dispatched: Dict[str, int] = {}
        # deferred block-table growth (req, table_idx, block), applied in
        # one batched dispatch right before the next step dispatch
        self._pending_growth: List[Tuple[Request, int, int]] = []
        self.stats = SchedulerStats()
        self._default_stop_tokens = set(stop_tokens or set())
        # hybrid SSM prefix caching (cache/ssm_cache.py): snapshots
        # pending capture as (req, epoch, snap_tokens, chain_hash)
        self.ssm_cache = ssm_cache
        self._ssm_snap_pending: List[Tuple[Request, int, int, str]] = []
        self._ssm_restores: List[Tuple[int, list]] = []

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
        if self.ssm_cache is not None:
            # capture pending hybrid state snapshots before anything
            # else can advance those slots
            self._drain_ssm_snapshots()
        self._schedule_waiting()
        if self.ssm_cache is not None:
            self._flush_ssm_restores()
        if self.config.max_kv_size:
            self._retire_window_blocks()
        if self._immediate_outputs:
            outputs.extend(self._immediate_outputs)
            self._immediate_outputs.clear()
        bundle = self._dispatch_step()
        if bundle is not None:
            self._inflight.append(bundle)
        if self._has_enforced():
            # constrained decoding: the next step's mask depends on this
            # step's token -> consume results before dispatching again
            while self._inflight:
                outputs.extend(self._process_bundle(self._inflight.popleft()))
        elif self.pipeline_depth == 0:  # synchronous mode (CPU tests)
            while self._inflight:
                outputs.extend(self._process_bundle(self._inflight.popleft()))
        else:
            # keep >= 1 bundle in flight; lag is measured in device STEPS
            # so a K-step decode bundle counts as K (it hides K steps of
            # fetch latency on its own, and extra bundles of lag would
            # only add zombie decode after a finish).
            while (
                len(self._inflight) > 1
                and sum(b.steps for b in self._inflight) > self.pipeline_depth
            ):
                outputs.extend(
                    self._process_bundle(self._inflight.popleft())
                )
        if bundle is None:
            # nothing dispatchable -> drain whatever is in flight
            while self._inflight:
                outputs.extend(self._process_bundle(self._inflight.popleft()))
        if self._immediate_outputs:
            # failures raised DURING dispatch (e.g. the self-preemption
            # failsafe) must be delivered now — the engine loop may idle
            # once nothing is unfinished, so "next step" never comes
            outputs.extend(self._immediate_outputs)
            self._immediate_outputs.clear()
        return outputs

    def recover_from_error(self, error: BaseException) -> List[RequestOutput]:
        """Fatal step error: fail all in-flight requests, reset device
        state and block accounting, keep serving (reference
        scheduler.py:2435-2471 — running requests are NOT retried)."""
        logger.error("recovering scheduler from error: %s", error)
        outs: List[RequestOutput] = []
        self._inflight.clear()
        # do NOT go through _release: device state may be unusable and
        # post-error KV must not be published to the prefix cache
        for req in list(self.running):
            req.set_finished(RequestStatus.FINISHED_ERROR, "error")
            req.slot = None
            req.blocks = []
            outs.append(self._make_output(req, [], ""))
        self.running.clear()
        self.slots = [None] * self.runner.max_num_seqs
        self._pending_prompt.clear()
        self._dispatched.clear()
        self._base_len.clear()
        self.block_mgr.reset()
        try:
            self.runner.reset()
        except Exception:  # pragma: no cover
            logger.exception("runner reset failed")
        if self.prefix_cache is not None and hasattr(
            self.prefix_cache, "attach_spill"
        ):
            self.prefix_cache.attach_spill(self.block_mgr, self.runner)
        return outs

    def flush(self) -> List[RequestOutput]:
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
    @property
    def _n_occupied(self) -> int:
        return len(self.running)

    def _free_slot(self) -> Optional[int]:
        n = self._n_occupied
        return n if n < len(self.slots) else None

    def _schedule_waiting(self) -> None:
        admissions: List[Dict] = []
        try:
            self._collect_admissions(admissions)
        finally:
            if admissions:
                # ONE device dispatch for the whole admission burst
                self.runner.admit_slots(
                    [
                        {k: v for k, v in a.items() if k != "cross"}
                        for a in admissions
                    ],
                    self._n_occupied,
                )
                for a in admissions:
                    cp = a.get("cross")
                    if cp is not None:
                        # Mllama: project the request's vision states
                        # into the slot's cross-KV buffers
                        self.runner.admit_cross(
                            a["slot"],
                            cp["cross_states"],
                            cp["tok_lo"],
                            cp["tok_hi"],
                            cp["width"],
                        )

    def _collect_admissions(self, admissions: List[Dict]) -> None:
        from .model_runner import _MASK_BUCKET

        while self.waiting:
            slot = self._free_slot()
            if slot is None:
                return
            req = self.waiting[0]
            if req.enforcer is not None:
                n_enforced = sum(
                    1 for r in self.running if r.enforcer is not None
                )
                if n_enforced >= _MASK_BUCKET:
                    return  # FCFS: wait for an enforced slot to free up
            tokens = _all_tokens(req)
            cached_tokens = 0
            cached_blocks: List[int] = []
            # multimodal prompts participate too: media rows are salted
            # with the image/video CONTENT hash (req.media_spans), the
            # image-hash-keyed MLLM cache of the reference
            # (mllm_cache.py:134-344) at block granularity. Multimodal
            # requests without span info must not hit (placeholder ids
            # collide across different images).
            use_cache = (
                self.prefix_cache is not None
                # pruned (SpecPrefill) prompts: KV depends on the rope
                # override, not just token content — never share
                and req.rope_positions is None
                and (req.prompt_embeds is None or req.media_spans is not None)
            )
            if use_cache:
                cached_blocks, cached_tokens, hit = self.prefix_cache.fetch(
                    self.block_mgr, tokens, media_spans=req.media_spans
                )
                req.cache_hit_type = hit
                if self.ssm_cache is not None and getattr(
                    self.runner, "has_ssm", False
                ):
                    # hybrid: a KV chain is only usable where the mamba
                    # recurrent state can be restored too — resume at
                    # the longest snapshot <= the matched chain
                    cached_blocks, cached_tokens = self._ssm_resume_point(
                        req, tokens, cached_blocks
                    )
                    if not cached_tokens:
                        req.cache_hit_type = None
                self.stats.prefix_cache_queries += 1
                if cached_tokens:
                    self.stats.prefix_cache_hits += 1
                    self.stats.prefix_cached_tokens += cached_tokens
            # Never cache-skip the entire sequence: the last token must be
            # re-forwarded for next-token logits, into a private block
            # (reference "exact hit: trim 1, replay",
            # mllm_batch_generator.py:1512-1544).
            if cached_tokens >= len(tokens):
                keep_blocks = (len(tokens) - 1) // self.page_size
                for b in cached_blocks[keep_blocks:]:
                    self.block_mgr.free([b], cache=True)
                cached_blocks = cached_blocks[:keep_blocks]
                cached_tokens = keep_blocks * self.page_size
            n_needed = -(-(len(tokens) + 1) // self.page_size) - len(
                cached_blocks
            )
            new_blocks = self.block_mgr.allocate(n_needed)
            if new_blocks is None:
                self.block_mgr.free(cached_blocks, cache=True)
                req.cache_hit_type = None
                if not self.running and not self._inflight:
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
            admissions.append(
                dict(
                    slot=slot,
                    table=req.blocks,
                    kv_len=cached_tokens,
                    temperature=sp.temperature,
                    top_k=sp.top_k,
                    top_p=sp.top_p,
                    min_p=sp.min_p,
                    repetition_penalty=sp.repetition_penalty,
                    presence_penalty=sp.presence_penalty,
                    prompt_tail=tokens[-20:],
                    seed=sp.seed if sp.seed is not None else -1,
                    rope_delta=getattr(req, "mrope_delta", 0) or 0,
                    cross=getattr(req, "cross_payload", None),
                )
            )
            if self.detok is not None and req.detok_state is None:
                req.detok_state = self.detok.new_state(tokens[-6:])
            if self.ssm_cache is not None and getattr(
                self.runner, "has_ssm", False
            ):
                if getattr(req, "_ssm_restore", None) is not None:
                    self._ssm_restores.append((slot, req._ssm_restore))
                    req._ssm_restore = None
                self._plan_ssm_snapshot(req, tokens, cached_tokens)

    def _ssm_chain_hashes(self, req: Request, tokens) -> List[str]:
        return self.prefix_cache.block_hashes(
            tokens, media_spans=req.media_spans
        )

    def _ssm_resume_point(self, req, tokens, cached_blocks):
        """Longest snapshot boundary covered by the matched chain; frees
        unusable tail blocks back to the cache."""
        ps = self.page_size
        self.ssm_cache.queries += 1
        hashes = self._ssm_chain_hashes(req, tokens)
        max_j = min(len(cached_blocks), (len(tokens) - 1) // ps)
        for j in range(max_j, 0, -1):
            entry = self.ssm_cache.get(hashes[j - 1])
            if entry is not None:
                self.ssm_cache.hits += 1
                self.block_mgr.free(cached_blocks[j:], cache=True)
                req._ssm_restore = entry[1]
                return cached_blocks[:j], j * ps
        self.block_mgr.free(cached_blocks, cache=True)
        return [], 0

    def _plan_ssm_snapshot(self, req, tokens, cached_tokens) -> None:
        """Arrange for ONE state snapshot at the prompt's last full
        block boundary (a prefill chunk will be clamped to end there)."""
        ps = self.page_size
        p_snap = ((len(tokens) - 1) // ps) * ps
        if self.prefix_cache is None or p_snap <= cached_tokens or p_snap <= 0:
            req._ssm_snap_at = None
            return
        h = self._ssm_chain_hashes(req, tokens)[p_snap // ps - 1]
        if self.ssm_cache.contains(h):
            req._ssm_snap_at = None
            return
        req._ssm_snap_at = p_snap
        req._ssm_snap_hash = h

    def _drain_ssm_snapshots(self) -> None:
        """Capture pending snapshots BEFORE dispatching new steps: the
        slot's state rows reflect exactly the clamped chunk (one
        prefill per step for hybrids, and the request is not yet
        decode-ready). The read syncs on dispatched steps — once per
        hybrid prompt."""
        if not self._ssm_snap_pending:
            return
        pending = self._ssm_snap_pending
        self._ssm_snap_pending = []
        for req, epoch, snap, h in pending:
            if (
                req.status != RequestStatus.RUNNING
                or self._epoch.get(req.request_id) != epoch
                or req.slot is None
                or req.num_computed_tokens != snap
            ):
                continue
            layers = self.runner.read_ssm_slot(req.slot)
            self.ssm_cache.put(h, snap, layers)

    def _flush_ssm_restores(self) -> None:
        if not self._ssm_restores:
            return
        restores = self._ssm_restores
        self._ssm_restores = []
        for slot, layers in restores:
            self.runner.restore_ssm_slot(slot, layers)

    # --------------------------------------------------------------- dispatch
    def _decode_ready(self, req: Request) -> bool:
        return (
            req.status == RequestStatus.RUNNING
            and req.request_id not in self._pending_prompt
        )

    def _ensure_growth(self, req: Request, lookahead: int = 1) -> bool:
        """Ensure blocks exist for this request's next ``lookahead`` decode
        writes. Returns False if ``req`` was preempted in the process."""
        rid = req.request_id
        pos = self._base_len[rid] + self._dispatched[rid] + lookahead - 1
        pos = min(pos, self.config.max_model_len - 1)
        if self._base_len[rid] + self._dispatched[rid] >= self.config.max_model_len:
            return True  # zombie/capped writes get the OOB sentinel
        idx = pos // self.page_size
        while idx >= len(req.blocks):
            blocks = self.block_mgr.allocate(1)
            if blocks is None:
                self._preempt_someone(excluding=req)
                blocks = self.block_mgr.allocate(1)
            if blocks is None:
                self._preempt(req, is_self=True)
                return False
            req.blocks.append(blocks[0])
            # batched: flushed in ONE device dispatch before the step
            # (epoch-tagged so preempt+readmit can't apply stale writes)
            self._pending_growth.append(
                (req, self._epoch.get(rid, 0), len(req.blocks) - 1, blocks[0])
            )
        return True

    def _publish_prompt_blocks(self, req: Request) -> None:
        """Register the content hashes of a request's fully-computed
        prompt blocks while it is still prefilling. Safe because device
        steps execute in dispatch order: any fetch by a later request is
        dispatched after the writes it aliases."""
        if req.prompt_embeds is not None and req.media_spans is None:
            return  # unsalted multimodal rows must not be shared
        if req.rope_positions is not None:
            return  # pruned (SpecPrefill) KV is positional, never shared
        ps = self.page_size
        n_full = min(
            req.num_prompt_tokens, req.num_computed_tokens
        ) // ps
        n_full = min(n_full, len(req.blocks))
        if n_full <= req.published_blocks:
            return
        # incremental: hash only the newly completed blocks, chaining
        # from the cached parent (full-chain rehash per step would be
        # quadratic on long prefills)
        from ..cache.prefix_cache import salt_tokens
        from .block_manager import hash_block_tokens

        toks = _all_tokens(req)
        parent = req.publish_parent
        for i in range(req.published_blocks, n_full):
            seg = salt_tokens(
                toks[i * ps : (i + 1) * ps], i * ps, req.media_spans
            )
            h = hash_block_tokens(parent, seg)
            self.block_mgr.register_block_hash(req.blocks[i], h)
            parent = h
        req.publish_parent = parent
        req.published_blocks = n_full

    def _retire_window_blocks(self) -> None:
        """Rotating-window memory reclaim (reference max_kv_size,
        scheduler.py:2027-2032): a KV block whose every position is at
        least ``max_kv_size`` behind the earliest possible future query
        can never be attended again — free it back to the pool. Its
        block-table entry stays as a stale index: the kernel's window
        mask zeroes any contribution from whatever tenant reuses the
        page, so this is exact, not approximate."""
        w = self.config.max_kv_size
        ps = self.page_size
        for req in self.running:
            if req.status != RequestStatus.RUNNING:
                continue
            # earliest possible future query position: prompt tokens
            # computed so far + outputs actually PROCESSED (in-flight
            # dispatches are at higher positions and snapshot their
            # page tables at dispatch, so this is conservative)
            p_min = req.num_computed_tokens + len(req.output_token_ids)
            while (
                (req.num_retired_blocks + 1) * ps <= p_min - w + 1
                and req.num_retired_blocks < len(req.blocks)
            ):
                b = req.blocks[req.num_retired_blocks]
                self.block_mgr.free([b])
                req.num_retired_blocks += 1

    def _flush_growth(self) -> None:
        if not self._pending_growth:
            return
        ups = [
            (r.slot, i, b)
            for r, ep, i, b in self._pending_growth
            if r.status == RequestStatus.RUNNING
            and r.slot is not None
            and self._epoch.get(r.request_id) == ep
        ]
        self._pending_growth.clear()
        self.runner.extend_tables(ups)

    def _dest_for(self, req: Request, pos: int) -> int:
        idx = pos // self.page_size
        if idx >= len(req.blocks):
            return self.runner.num_pages * self.page_size  # OOB sentinel
        return req.blocks[idx] * self.page_size + pos % self.page_size

    def _has_enforced(self) -> bool:
        return any(r.enforcer is not None for r in self.running)

    def _spec_eligible(self) -> bool:
        """Greedy spec rounds only: no sampling penalties (their device
        state isn't advanced inside a spec round), no FSM masks, no
        per-token logprobs."""
        if self.runner.spec_k <= 0:
            return False
        if not self.running or self._pending_prompt:
            return False
        for r in self.running:
            if r.status != RequestStatus.RUNNING:
                continue
            sp = r.sampling_params
            if (
                sp.temperature != 0
                or sp.repetition_penalty != 1.0
                or sp.presence_penalty != 0.0
                or sp.logprobs
                or r.enforcer is not None
            ):
                return False
        return True

    def _drain_spec_inflight(self) -> None:
        """Host position math for ragged dispatch needs exact lengths,
        but in-flight spec bundles carry worst-case accounting — settle
        them first."""
        if any(b.spec for b in self._inflight):
            while self._inflight:
                self._immediate_outputs.extend(
                    self._process_bundle(self._inflight.popleft())
                )

    def _dispatch_step(self) -> Optional[_StepBundle]:
        spec_ok = self._spec_eligible()
        if not spec_ok:
            self._drain_spec_inflight()
        # FSM-constrained requests need a fresh allow-mask per sampled
        # token: single-step ragged dispatch, consumed synchronously.
        if self.running and not self._pending_prompt:
            if self._has_enforced():
                return self._dispatch_ragged()
            if spec_ok:
                return self._dispatch_spec()
            # Pure-decode fast path: every running request is
            # decode-ready -> zero-upload multi-step compiled bundles.
            return self._dispatch_decode_fast()
        return self._dispatch_ragged()

    def _dispatch_spec(self) -> Optional[_StepBundle]:
        """One device-resident speculative round (draft k + verify +
        accept/rollback in a single compiled program)."""
        k = self.runner.spec_k
        for req in list(self.running):
            if req.status != RequestStatus.RUNNING:
                continue
            self._ensure_growth(req, lookahead=k + 1)
        decoding = [
            r for r in self.running if r.status == RequestStatus.RUNNING
        ]
        self._flush_growth()
        if not decoding:
            return None
        packed = self.runner.spec_round()
        try:
            packed.copy_to_host_async()
        except Exception:
            pass
        bundle = _StepBundle(packed=packed, steps=k + 1, spec=True)
        for r in decoding:
            rid = r.request_id
            # assume the full round for growth bookkeeping; corrected to
            # the actual emitted count when the bundle is processed
            self._dispatched[rid] += k + 1
            bundle.seq_map[rid] = (self._epoch[rid], r.slot)
        return bundle

    def _dispatch_decode_fast(self) -> Optional[_StepBundle]:
        steps = max(1, self.config.decode_steps_per_dispatch)
        decoding = list(self.running)
        for req in decoding:
            if req.status != RequestStatus.RUNNING:
                continue
            if not self._ensure_growth(req, lookahead=steps):
                pass  # preempted; handled below by re-filter
        decoding = [
            r for r in self.running if r.status == RequestStatus.RUNNING
        ]
        self._flush_growth()
        if not decoding:
            return None
        greedy = all(r.sampling_params.temperature == 0 for r in decoding)
        presence = any(
            r.sampling_params.presence_penalty != 0 for r in decoding
        )
        want_lp = any(r.sampling_params.logprobs for r in decoding)
        # static occupancy tier: at high occupancy the seq-blocked
        # decode-attention kernel wins; at low occupancy the general
        # kernel's q-block grid is cheaper (model_runner._decode_fast)
        dense = len(decoding) > self.runner.max_num_seqs // 2
        bundle = _StepBundle()
        if steps == 1:
            sampled, logprobs = self.runner.decode_fast(
                greedy, use_presence=presence, dense_batch=dense
            )
            try:
                sampled.copy_to_host_async()
                if want_lp:
                    logprobs.copy_to_host_async()
            except Exception:
                pass
            bundle.step_results.append(
                (sampled, logprobs if want_lp else None)
            )
        else:
            packed = self.runner.decode_fast_multi(
                greedy, steps, use_presence=presence, dense_batch=dense
            )
            try:
                packed.copy_to_host_async()
            except Exception:
                pass
            bundle.packed = packed
            bundle.steps = steps
        for r in decoding:
            rid = r.request_id
            self._dispatched[rid] += steps
            bundle.seq_map[rid] = (self._epoch[rid], r.slot)
        return bundle

    def _dispatch_ragged(self) -> Optional[_StepBundle]:
        s_max = self.runner.max_num_seqs
        pages_per_seq = self.runner.pages_per_seq
        max_t = self.runner.token_buckets[-1]
        budget = self.config.max_prefill_tokens

        # decode sequences (1 token each, token value read from device)
        decode_reqs = [r for r in self.running if self._decode_ready(r)]
        for req in list(decode_reqs):
            if not self._decode_ready(req):
                decode_reqs.remove(req)
                continue
            if not self._ensure_growth(req):
                decode_reqs.remove(req)
        decode_reqs = [r for r in decode_reqs if self._decode_ready(r)]

        # prefill chunks
        prefill: List[Tuple[Request, List[int], bool]] = []
        t_used = len(decode_reqs)
        # hybrid SSM models: the in-step scan handles ONE prefilling
        # sequence (its contiguous rows roll to the front); decode rows
        # still batch freely alongside it
        max_prefills = 1 if getattr(self.runner, "has_ssm", False) else 10**9
        for req in self.running:
            rid = req.request_id
            pending = self._pending_prompt.get(rid)
            if not pending or budget <= 0 or t_used >= max_t:
                continue
            if len(prefill) >= max_prefills:
                break
            chunk = pending[: min(budget, max_t - t_used)]
            snap = getattr(req, "_ssm_snap_at", None)
            if snap is not None:
                c0 = req.num_computed_tokens
                if c0 < snap < c0 + len(chunk):
                    # clamp so the chunk ENDS at the snapshot boundary
                    chunk = chunk[: snap - c0]
            if req.bidir_spans:
                n_ok = _clamp_chunk_for_bidir(
                    req.bidir_spans, req.num_computed_tokens, len(chunk)
                )
                if n_ok == 0:
                    # a span's remainder exceeds this step's leftover
                    # budget — defer the request one step so it sees a
                    # fresh budget (spans are bounded by admission)
                    continue
                chunk = chunk[:n_ok]
            is_final = len(chunk) == len(pending)
            prefill.append((req, chunk, is_final))
            t_used += len(chunk)
            budget -= len(chunk)

        n_seqs = len(decode_reqs) + len(prefill)
        if n_seqs == 0:
            return None

        total_t = t_used
        token_ids = np.zeros(total_t, np.int32)
        from_device = np.zeros(total_t, bool)
        token_slot = np.zeros(total_t, np.int32)
        positions = np.zeros(total_t, np.int32)
        kv_dest = np.full(
            total_t, self.runner.num_pages * self.page_size, np.int32
        )
        kv_lens = np.zeros(s_max, np.int32)
        page_indices = np.zeros((s_max, pages_per_seq), np.int32)
        cu_q_lens = np.zeros(s_max + 1, np.int32)
        seq_slots = np.zeros(s_max, np.int32)
        advance_mask = np.zeros(s_max, bool)

        bundle = _StepBundle()
        token_embeds = None
        embeds_mask = None
        ds_embeds = None
        if any(
            req.prompt_embeds is not None for req, _, _ in prefill
        ):
            h = self.runner.cfg.hidden_size
            token_embeds = np.zeros((total_t, h), np.float32)
            embeds_mask = np.zeros(total_t, bool)
            n_ds = self.runner.cfg.num_deepstack_layers
            if n_ds and any(
                req.deepstack_embeds is not None for req, _, _ in prefill
            ):
                ds_embeds = np.zeros((n_ds, total_t, h), np.float32)
        # mrope models (Qwen-VL) need explicit (t, h, w) rope positions:
        # vision rows use grid coordinates, text rows token index + delta
        rope_pos = (
            np.zeros((3, total_t), np.int32)
            if self.runner.cfg.mrope_section
            else None
        )
        # hybrid SSM / cross-attention: slot per row for device-side
        # state routing (recurrent states or cross-KV buffers)
        row_slot = (
            np.full(total_t, s_max, np.int32)
            if getattr(self.runner, "has_ssm", False)
            or getattr(self.runner.cfg, "has_cross", False)
            else None
        )
        # bidirectional spans (Gemma3/PaliGemma): per-seq [lo, hi)
        bidir_lo_arr = bidir_hi_arr = None
        if any(req.bidir_spans for req, _, _ in prefill):
            bidir_lo_arr = np.zeros(s_max, np.int32)
            bidir_hi_arr = np.zeros(s_max, np.int32)
        t = 0
        i = 0
        greedy = True
        for req in decode_reqs:
            rid = req.request_id
            pos = self._base_len[rid] + self._dispatched[rid]
            pos = min(pos, self.config.max_model_len - 1)
            from_device[t] = True
            token_slot[t] = req.slot
            # positions feed ROPE only (kv_dest carries the write slot),
            # so the per-request rope delta applies here directly
            positions[t] = pos + (req.mrope_delta or 0)
            if rope_pos is not None:
                rope_pos[:, t] = pos + (req.mrope_delta or 0)
            if row_slot is not None:
                row_slot[t] = req.slot
            kv_dest[t] = self._dest_for(req, pos)
            kv_lens[i] = pos + 1
            blocks = req.blocks[:pages_per_seq]
            page_indices[i, : len(blocks)] = blocks
            cu_q_lens[i + 1] = cu_q_lens[i] + 1
            seq_slots[i] = req.slot
            advance_mask[i] = True
            bundle.seq_map[rid] = (self._epoch[rid], i)
            self._dispatched[rid] += 1
            if req.sampling_params.temperature != 0:
                greedy = False
            t += 1
            i += 1
        for req, chunk, is_final in prefill:
            rid = req.request_id
            c0 = req.num_computed_tokens
            n = len(chunk)
            token_ids[t : t + n] = chunk
            positions[t : t + n] = np.arange(c0, c0 + n)
            if row_slot is not None:
                row_slot[t : t + n] = req.slot
            rp1 = req.rope_positions
            if rp1 is not None:  # SpecPrefill: original-position rope
                hi = min(c0 + n, len(rp1))
                if c0 < hi:
                    positions[t : t + (hi - c0)] = rp1[c0:hi]
                if hi < c0 + n:
                    d = req.mrope_delta or 0
                    positions[t + (hi - c0) : t + n] = (
                        np.arange(max(c0, hi), c0 + n) + d
                    )
            if rope_pos is not None:
                mp = getattr(req, "mrope_positions", None)
                if mp is not None:
                    hi = min(c0 + n, mp.shape[1])
                    if c0 < hi:
                        rope_pos[:, t : t + (hi - c0)] = mp[:, c0:hi]
                    if hi < c0 + n:  # beyond prompt: token index + delta
                        d = getattr(req, "mrope_delta", 0) or 0
                        rope_pos[:, t + (hi - c0) : t + n] = (
                            np.arange(max(c0, hi), c0 + n) + d
                        )
                else:
                    rope_pos[:, t : t + n] = np.arange(c0, c0 + n)
            if token_embeds is not None and req.prompt_embeds is not None:
                pe = req.prompt_embeds
                pm = req.embeds_mask
                hi = min(c0 + n, len(pe))
                if c0 < hi:
                    k = hi - c0
                    token_embeds[t : t + k] = pe[c0:hi]
                    embeds_mask[t : t + k] = (
                        pm[c0:hi] if pm is not None else True
                    )
                    if ds_embeds is not None and (
                        req.deepstack_embeds is not None
                    ):
                        ds_embeds[:, t : t + k] = (
                            req.deepstack_embeds[:, c0:hi]
                        )
            if bidir_lo_arr is not None and req.bidir_spans:
                # at most one span overlaps this chunk (clamp invariant)
                for lo, hi in req.bidir_spans:
                    if hi <= c0:
                        continue
                    if lo >= c0 + n:
                        break
                    bidir_lo_arr[i] = lo
                    bidir_hi_arr[i] = hi
                    break
            for j in range(n):
                kv_dest[t + j] = self._dest_for(req, c0 + j)
            kv_lens[i] = c0 + n
            blocks = req.blocks[:pages_per_seq]
            page_indices[i, : len(blocks)] = blocks
            cu_q_lens[i + 1] = cu_q_lens[i] + n
            seq_slots[i] = req.slot
            advance_mask[i] = is_final
            if is_final:
                bundle.seq_map[rid] = (self._epoch[rid], i)
                if req.sampling_params.temperature != 0:
                    greedy = False
                del self._pending_prompt[rid]
            else:
                self._pending_prompt[rid] = self._pending_prompt[rid][n:]
            req.num_computed_tokens += n
            self.stats.num_prompt_tokens += n
            snap = getattr(req, "_ssm_snap_at", None)
            if snap is not None and req.num_computed_tokens == snap:
                self._ssm_snap_pending.append(
                    (req, self._epoch[rid], snap, req._ssm_snap_hash)
                )
                req._ssm_snap_at = None
            t += n
            i += 1
        cu_q_lens[i + 1 :] = cu_q_lens[i]
        # mid-prefill cache saves (reference scheduler.py:1470-1538):
        # publish fully-computed PROMPT blocks now, so concurrent
        # same-prefix requests share KV before this one finishes
        if self.prefix_cache is not None:
            for req, _, _ in prefill:
                self._publish_prompt_blocks(req)

        # FSM-constrained rows: per-seq packed allow-masks for every
        # enforced request that samples this step
        allow_rows_l: List[int] = []
        allow_words_l: List[np.ndarray] = []
        idx_of = {}
        for rid, (ep, i_seq) in bundle.seq_map.items():
            idx_of[rid] = i_seq
        for req in self.running:
            if req.enforcer is None:
                continue
            i_seq = idx_of.get(req.request_id)
            if i_seq is None or not advance_mask[i_seq]:
                continue
            if req.think_phase == "think":
                # unconstrained reasoning phase — except stop tokens:
                # EOS during thinking would end the request with no
                # constrained answer at all (reference
                # thinking_processor.py:60-283)
                mask = np.ones(self.runner.cfg.vocab_size, dtype=bool)
                for t in self._stop_token_set(req):
                    if t < mask.shape[0]:
                        mask[t] = False
            elif req.think_phase == "force":
                # budget exhausted: force the </think> sequence one
                # token per step via a single-token allow-mask
                mask = np.zeros(
                    self.runner.cfg.vocab_size, dtype=bool
                )
                mask[req.think_end_ids[req.think_force_idx]] = True
            else:
                mask = req.enforcer.allowed_mask(req.fsm_state)
            words = np.packbits(
                mask, bitorder="little"
            ).view(np.uint8)
            w32 = -(-mask.shape[0] // 32)
            padded = np.zeros(w32 * 4, np.uint8)
            padded[: words.shape[0]] = words
            allow_rows_l.append(i_seq)
            allow_words_l.append(padded.view(np.uint32))
        inp = StepInput(
            token_ids=token_ids,
            from_device=from_device,
            token_slot=token_slot,
            positions=positions,
            kv_dest=kv_dest,
            kv_lens=kv_lens,
            page_indices=page_indices,
            cu_q_lens=cu_q_lens,
            num_seqs=n_seqs,
            seq_slots=seq_slots,
            advance_mask=advance_mask,
            total_tokens=total_t,
            token_embeds=token_embeds,
            embeds_mask=embeds_mask,
            deepstack_embeds=ds_embeds,
            allow_rows=(
                np.asarray(allow_rows_l, np.int32) if allow_rows_l else None
            ),
            allow_words=(
                np.stack(allow_words_l) if allow_words_l else None
            ),
            rope_pos=rope_pos,
            row_slot=row_slot,
            bidir_lo=bidir_lo_arr,
            bidir_hi=bidir_hi_arr,
        )
        presence = any(
            r.sampling_params.presence_penalty != 0
            for r in self.running
            if r.status == RequestStatus.RUNNING
        )
        sampled, logprobs = self.runner.run_step(
            inp, greedy_only=greedy, use_presence=presence
        )
        try:
            sampled.copy_to_host_async()
            logprobs.copy_to_host_async()
        except Exception:
            pass
        bundle.step_results.append((sampled, logprobs))
        return bundle

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

    def _preempt(self, req: Request, is_self: bool = False) -> None:
        # Livelock guard (round-1 review): a request whose
        # prompt+generation PROVABLY outgrows the whole pool would
        # self-preempt and recompute forever (each retry needs MORE
        # blocks than the last). Fail it. Contention-driven
        # self-preemptions (fits alone, pool busy) still re-queue: they
        # make progress once earlier requests finish.
        total_needed = -(-(req.num_prompt_tokens
                           + len(req.output_token_ids) + 1)
                         // self.page_size)
        if self.config.max_kv_size:
            # rotating window: concurrent footprint is bounded by the
            # window (+ slack for the not-yet-retired boundary block)
            total_needed = min(
                total_needed, self.config.max_kv_size // self.page_size + 2
            )
        doomed = total_needed > self.block_mgr.num_blocks - 1
        if is_self and doomed:
            logger.error(
                "request %s needs %d blocks but the pool only has %d; "
                "failing it (generation exceeds KV cache capacity)",
                req.request_id,
                total_needed,
                self.block_mgr.num_blocks - 1,
            )
            self._release(req)
            req.set_finished(RequestStatus.FINISHED_ERROR, "error")
            self._immediate_outputs.append(self._make_output(req, [], ""))
            return
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
            freed = req.slot
            if req in self.running:
                self.running.remove(req)
            n_after = len(self.running)
            last = n_after  # index of the previously-last occupied slot
            if freed != last:
                # swap-compact: move the last occupied slot into the gap
                moved = self.slots[last]
                self.slots[freed] = moved
                if moved is not None:
                    moved.slot = freed
                self.runner.move_slot(freed, last, n_after)
            else:
                self.runner.set_n_active(n_after)
            self.slots[last] = None
            req.slot = None
        elif req in self.running:
            self.running.remove(req)
        if req.blocks:
            live = req.blocks[req.num_retired_blocks :]
            cache = False
            if (
                self.prefix_cache is not None
                and req.is_finished()
                and req.num_retired_blocks == 0  # rotated chains are partial
                and req.rope_positions is None  # pruned KV is positional
                and (req.prompt_embeds is None or req.media_spans is not None)
            ):
                cache = self.prefix_cache.store(
                    self.block_mgr,
                    _all_tokens(req),
                    req.blocks,
                    media_spans=req.media_spans,
                    # abort/error mid-prefill: only computed rows have
                    # KV; blocks past them must not be published. While
                    # a (re)prefill is pending, num_computed_tokens
                    # already counts every KV-written row of the
                    # prompt+output stream.
                    valid_tokens=(
                        req.num_computed_tokens
                        if req.request_id in self._pending_prompt
                        else req.num_computed_tokens
                        + max(0, len(req.output_token_ids) - 1)
                    ),
                )
            self.block_mgr.free(live, cache=cache)
            req.blocks = []
            req.num_retired_blocks = 0
            req.published_blocks = 0
            req.publish_parent = None
        rid = req.request_id
        self._pending_prompt.pop(rid, None)
        self._dispatched.pop(rid, None)
        self._base_len.pop(rid, None)
        if req in self.running:
            self.running.remove(req)
        if req.is_finished():
            # drop the registry entry (it would otherwise grow without
            # bound on a long-running server); in-flight bundles for this
            # id skip via requests.get() returning None
            self.requests.pop(rid, None)
            self._epoch.pop(rid, None)

    def request_status(self) -> List[Dict]:
        """Per-request live status (reference /v1/status per-request
        phase/TTFT/tps, reference scheduler.py:2637-2703)."""
        now = time.time()
        out: List[Dict] = []
        for req in list(self.requests.values()):
            if req.is_finished():
                continue
            if req.status == RequestStatus.WAITING:
                phase = "waiting"
            elif req.request_id in self._pending_prompt:
                phase = "prefill"
            else:
                phase = "decode"
            ttft = (
                round(req.first_token_time - req.arrival_time, 3)
                if req.first_token_time
                else None
            )
            ntok = len(req.output_token_ids)
            tps = None
            if req.first_token_time and ntok > 1:
                dt = now - req.first_token_time
                if dt > 0:
                    tps = round((ntok - 1) / dt, 1)
            entry = {
                "request_id": req.request_id,
                "phase": phase,
                "prompt_tokens": req.num_prompt_tokens,
                "generated_tokens": ntok,
                "cached_tokens": req.cached_tokens,
                "age_s": round(now - req.arrival_time, 2),
                "ttft_s": ttft,
                "decode_tps": tps,
            }
            if req.mtp_drafts:
                entry["spec_drafts"] = req.mtp_drafts
                entry["spec_accepted"] = req.mtp_accepted
            out.append(entry)
        return out

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
        if req.enforcer is not None:
            if req.think_phase == "think":
                end = req.think_end_ids
                n = len(end)
                if req.output_token_ids[-n:] == end:
                    req.think_phase = None  # FSM engages from here
                elif len(req.output_token_ids) >= req.think_budget:
                    # force the close sequence starting next step; if
                    # this token already opened it, skip the matched
                    # prefix
                    req.think_phase = "force"
                    req.think_force_idx = 0
            elif req.think_phase == "force":
                req.think_force_idx += 1
                if req.think_force_idx >= len(req.think_end_ids):
                    req.think_phase = None
            else:
                req.fsm_state = req.enforcer.advance(req.fsm_state, token)
        if req.first_token_time is None:
            req.first_token_time = time.time()
        self.stats.num_generated_tokens += 1
        sp = req.sampling_params

        if token in self._stop_token_set(req):
            req.output_token_ids.pop()
            req.output_logprobs.pop()
            req.set_finished(RequestStatus.FINISHED_STOPPED)
            # release held-back stop-string-prefix text: generation ended
            # via a stop token, so the holdback can no longer complete a
            # stop string and must not be dropped.
            tail = getattr(req, "_stop_held", "")
            req._stop_held = ""  # type: ignore[attr-defined]
            if self.detok is not None and req.detok_state is not None:
                tail += self.detok.flush(req.detok_state)
            if tail:
                req.output_text += tail
                return [], tail
            return [], ""

        new_text = ""
        if self.detok is not None and req.detok_state is not None:
            new_text = self.detok.step(req.detok_state, token)

        # Stop strings: trim at first occurrence; hold back any tail that
        # could still become a stop string so streamed deltas never leak
        # part of one (reference/vLLM stop-string buffering semantics).
        if sp.stop:
            pending = getattr(req, "_stop_held", "") + new_text
            for s_str in sp.stop:
                idx = pending.find(s_str)
                if idx != -1:
                    req.set_finished(RequestStatus.FINISHED_STOPPED)
                    emit = pending[:idx]
                    req.output_text += emit
                    req._stop_held = ""  # type: ignore[attr-defined]
                    return [token], emit
            hold = 0
            for s_str in sp.stop:
                for k in range(min(len(s_str) - 1, len(pending)), 0, -1):
                    if pending.endswith(s_str[:k]):
                        hold = max(hold, k)
                        break
            emit = pending[: len(pending) - hold] if hold else pending
            req._stop_held = pending[len(pending) - hold:] if hold else ""  # type: ignore[attr-defined]
            new_text = emit

        req.output_text += new_text

        if (
            req.num_output_tokens >= sp.max_tokens
            or req.num_tokens >= self.config.max_model_len
        ):
            req.set_finished(RequestStatus.FINISHED_LENGTH_CAPPED)
            tail = ""
            if self.detok is not None and req.detok_state is not None:
                tail = self.detok.flush(req.detok_state)
            # release any held-back stop-prefix text at end of generation
            tail = getattr(req, "_stop_held", "") + tail
            req._stop_held = ""  # type: ignore[attr-defined]
            if tail:
                req.output_text += tail
                new_text += tail
        return [token], new_text

    def _make_output(
        self, req: Request, new_tokens: List[int], new_text: str
    ) -> RequestOutput:
        n = len(new_tokens)
        new_lps = req.output_logprobs[-n:] if n else []
        return RequestOutput(
            request_id=req.request_id,
            new_token_ids=new_tokens,
            new_logprobs=list(new_lps),
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
        if bundle.spec:
            return self._process_spec_bundle(bundle)
        if bundle.packed is not None:
            from .model_runner import unpack_multi

            arrays = unpack_multi(np.asarray(bundle.packed))
        elif bundle.step_results:
            arrays = [
                (
                    np.asarray(s),
                    np.asarray(lp) if lp is not None else None,
                )
                for s, lp in bundle.step_results
            ]
        else:
            return outs
        for rid, (epoch, idx) in bundle.seq_map.items():
            req = self.requests.get(rid)
            if (
                req is None
                or req.status != RequestStatus.RUNNING
                or self._epoch.get(rid) != epoch
            ):
                continue
            gained: List[int] = []
            text = ""
            for sampled, logprobs in arrays:
                if req.is_finished():
                    break
                g, t = self._process_one_token(
                    req,
                    int(sampled[idx]),
                    float(logprobs[idx]) if logprobs is not None else 0.0,
                )
                gained += g
                text += t
            if gained or text or req.is_finished():
                outs.append(self._make_output(req, gained, text))
            if req.is_finished():
                self.stats.num_finished += 1
                self._release(req)
        return outs

    def _process_spec_bundle(
        self, bundle: _StepBundle
    ) -> List[RequestOutput]:
        outs: List[RequestOutput] = []
        k1 = bundle.steps  # k + 1
        arr = np.ascontiguousarray(
            np.asarray(bundle.packed)
        ).view(np.int32)  # [k+1, S]
        for rid, (epoch, idx) in bundle.seq_map.items():
            req = self.requests.get(rid)
            if (
                req is None
                or req.status != RequestStatus.RUNNING
                or self._epoch.get(rid) != epoch
            ):
                continue
            gained: List[int] = []
            text = ""
            emitted = 0
            for j in range(k1):
                tok = int(arr[j, idx])
                if tok < 0:
                    break
                emitted += 1
                if req.is_finished():
                    continue  # count device-side emissions past a stop
                g, t = self._process_one_token(req, tok, 0.0)
                gained += g
                text += t
            # settle worst-case growth accounting to reality
            self._dispatched[rid] -= k1 - emitted
            req.mtp_drafts += k1 - 1
            req.mtp_accepted += max(0, emitted - 1)
            self.stats.num_generated_tokens += 0  # counted per token
            if gained or text or req.is_finished():
                outs.append(self._make_output(req, gained, text))
            if req.is_finished():
                self.stats.num_finished += 1
                self._release(req)
        return outs
