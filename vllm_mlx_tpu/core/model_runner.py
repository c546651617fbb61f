# SPDX-License-Identifier: Apache-2.0
"""Compiled model execution: fixed-slot decode + bucketed chunked prefill.

TPU-native replacement for mlx-lm's mutable BatchGenerator batch
(reference scheduler.py:21,1341; mllm_batch_generator.py:260-393): all
per-sequence state lives in fixed-shape device arrays sized
``max_num_seqs``, so the decode step traces and compiles exactly once.
Admission/eviction are tiny scatter updates, never reshapes.

Layout of a step:
  * ``decode_step``  — embed 1 token/slot, write KV into the paged pool,
    paged attention, sample with per-slot params. One fused jit, donated
    state, [S] outputs.
  * ``prefill_chunk`` — one sequence's prompt chunk, padded to a bucket
    size (padding K/V is routed to the reserved scratch block by the
    zero-initialized block-table entries and never read). The final
    chunk samples the first output token in the same jit.

Prefill-length bucketing bounds recompiles (SURVEY.md section 7 "hard
parts" #1); a persistent compilation cache makes warm restarts cheap.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, replace
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CacheConfig, ModelConfig, SchedulerConfig
from ..models import decoder
from ..ops import attention as att
from ..ops.sampling import (
    SamplingState,
    advance_repetition_state,
    sample_tokens,
)

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


def enable_persistent_compilation_cache(path: Optional[str] = None) -> None:
    path = path or os.path.expanduser("~/.cache/vllm_mlx_tpu/jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # pragma: no cover
        logger.warning("compilation cache disabled: %s", e)


@jax.tree_util.register_dataclass
@dataclass
class DecodeState:
    """All device-resident per-slot state. Leading dim S = max_num_seqs."""

    kv_pool: jax.Array  # [L, 2, num_blocks, bs, kvh, hd]
    block_tables: jax.Array  # [S, max_blocks_per_seq] i32
    positions: jax.Array  # [S] i32 — seq length so far == next write position
    current_tokens: jax.Array  # [S] i32 — token to feed at ``positions``
    active: jax.Array  # [S] bool
    sampling: SamplingState
    step_count: jax.Array  # scalar i32, folds into the RNG key


class ModelRunner:
    def __init__(
        self,
        cfg: ModelConfig,
        params: Params,
        cache_cfg: CacheConfig,
        sched_cfg: SchedulerConfig,
        rng_seed: int = 0,
        kv_dtype=None,
        mesh=None,
    ) -> None:
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import shard_params

            params = shard_params(mesh, params)
        self.params = params
        self.cache_cfg = cache_cfg
        self.sched_cfg = sched_cfg
        self.max_num_seqs = sched_cfg.max_num_seqs
        self.block_size = cache_cfg.block_size
        self.max_blocks_per_seq = max(
            1, -(-sched_cfg.max_model_len // cache_cfg.block_size)
        )
        self.chunk_buckets = sorted(set(sched_cfg.prefill_chunk_sizes))
        self._rng_base = jax.random.PRNGKey(rng_seed)
        if kv_dtype is None:
            kv_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
                cache_cfg.kv_dtype
            ]
        self.kv_dtype = kv_dtype
        self.state = self._init_state()
        if mesh is not None:
            from ..parallel.mesh import shard_decode_state

            self.state = shard_decode_state(mesh, self.state)
        self._decode_jit = jax.jit(
            self._decode_step, static_argnames=("greedy_only",), donate_argnums=(1,)
        )
        self._prefill_jit = jax.jit(self._prefill_step, donate_argnums=(1,))

    # ------------------------------------------------------------------ state
    def _init_state(self) -> DecodeState:
        c, s = self.cfg, self.max_num_seqs
        kv_pool = att.make_kv_pool(
            c.num_hidden_layers,
            self.cache_cfg.num_blocks,
            self.block_size,
            c.num_key_value_heads,
            c.head_dim,
            dtype=self.kv_dtype,
        )
        return DecodeState(
            kv_pool=kv_pool,
            block_tables=jnp.zeros((s, self.max_blocks_per_seq), jnp.int32),
            positions=jnp.zeros((s,), jnp.int32),
            current_tokens=jnp.zeros((s,), jnp.int32),
            active=jnp.zeros((s,), bool),
            sampling=SamplingState.init(s),
            step_count=jnp.zeros((), jnp.int32),
        )

    def reset(self) -> None:
        self.state = self._init_state()

    # ----------------------------------------------------------------- decode
    def _decode_step(
        self, params: Params, state: DecodeState, greedy_only: bool
    ) -> Tuple[DecodeState, jax.Array, jax.Array]:
        logits, kv_pool = decoder.decode(
            params,
            self.cfg,
            state.current_tokens,
            state.positions,
            state.kv_pool,
            state.block_tables,
            self.sched_cfg.moe_top_k,
        )
        key = jax.random.fold_in(self._rng_base, state.step_count)
        tokens, logprobs = sample_tokens(
            logits, state.sampling, key, greedy_only=greedy_only
        )
        sampling = advance_repetition_state(state.sampling, tokens, state.active)
        new_state = replace(
            state,
            kv_pool=kv_pool,
            positions=jnp.where(state.active, state.positions + 1, state.positions),
            current_tokens=jnp.where(state.active, tokens, state.current_tokens),
            sampling=sampling,
            step_count=state.step_count + 1,
        )
        return new_state, tokens, logprobs

    def decode(self, greedy_only: bool = False) -> Tuple[jax.Array, jax.Array]:
        """Run one decode step for all slots; returns (tokens [S], logprobs [S])
        as device arrays (fetch lazily for pipelining)."""
        self.state, tokens, logprobs = self._decode_jit(
            self.params, self.state, greedy_only=greedy_only
        )
        return tokens, logprobs

    # ---------------------------------------------------------------- prefill
    def _prefill_step(
        self,
        params: Params,
        state: DecodeState,
        tokens: jax.Array,  # [C] padded chunk
        pos0: jax.Array,  # scalar i32: absolute position of tokens[0]
        last_idx: jax.Array,  # scalar i32: index of last valid token in chunk
        slot: jax.Array,  # scalar i32
        is_last: jax.Array,  # scalar bool: final chunk of the prompt
    ) -> Tuple[DecodeState, jax.Array, jax.Array]:
        c = tokens.shape[0]
        positions = pos0 + jnp.arange(c, dtype=jnp.int32)
        table_row = state.block_tables[slot]
        hidden, kv_pool = decoder.prefill(
            params,
            self.cfg,
            tokens,
            positions,
            state.kv_pool,
            table_row,
            self.sched_cfg.moe_top_k,
        )
        last_hidden = jax.lax.dynamic_slice_in_dim(hidden, last_idx, 1, axis=0)
        logits = decoder._logits(params, self.cfg, last_hidden)  # [1, V]
        key = jax.random.fold_in(self._rng_base, state.step_count)
        slot_sampling = jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=0),
            state.sampling,
        )
        token, logprob = sample_tokens(logits, slot_sampling, key)
        tok = token[0]
        end_pos = pos0 + last_idx + 1

        def write_row(full, row):
            return jax.lax.dynamic_update_slice_in_dim(full, row, slot, axis=0)

        new_sampling = jax.tree.map(
            lambda full, row: jnp.where(is_last, write_row(full, row), full),
            state.sampling,
            advance_repetition_state(
                slot_sampling, token, jnp.ones((1,), bool)
            ),
        )
        new_state = replace(
            state,
            kv_pool=kv_pool,
            positions=jnp.where(
                is_last,
                state.positions.at[slot].set(end_pos),
                state.positions,
            ),
            current_tokens=jnp.where(
                is_last,
                state.current_tokens.at[slot].set(tok),
                state.current_tokens,
            ),
            active=jnp.where(
                is_last, state.active.at[slot].set(True), state.active
            ),
            sampling=new_sampling,
            step_count=state.step_count + 1,
        )
        return new_state, tok, logprob[0]

    def prefill_chunk(
        self,
        token_ids: Sequence[int],
        pos0: int,
        slot: int,
        is_last: bool,
    ) -> Tuple[jax.Array, jax.Array]:
        """Process one prompt chunk (host wrapper: pads to a bucket).

        Returns (first_token, logprob) device scalars — meaningful only
        when ``is_last``.
        """
        n = len(token_ids)
        bucket = next((b for b in self.chunk_buckets if b >= n), None)
        if bucket is None:
            raise ValueError(
                f"chunk of {n} tokens exceeds largest bucket "
                f"{self.chunk_buckets[-1]}"
            )
        padded = np.zeros((bucket,), np.int32)
        padded[:n] = token_ids
        self.state, tok, lp = self._prefill_jit(
            self.params,
            self.state,
            jnp.asarray(padded),
            jnp.int32(pos0),
            jnp.int32(n - 1),
            jnp.int32(slot),
            jnp.bool_(is_last),
        )
        return tok, lp

    # ------------------------------------------------------- host-side admin
    def set_block_table_row(self, slot: int, blocks: Sequence[int]) -> None:
        row = np.zeros((self.max_blocks_per_seq,), np.int32)
        row[: len(blocks)] = blocks
        self.state = replace(
            self.state,
            block_tables=self.state.block_tables.at[slot].set(jnp.asarray(row)),
        )

    def extend_block_table(self, slot: int, index: int, block: int) -> None:
        self.state = replace(
            self.state,
            block_tables=self.state.block_tables.at[slot, index].set(block),
        )

    def configure_slot_sampling(
        self,
        slot: int,
        *,
        temperature: float,
        top_k: int,
        top_p: float,
        min_p: float,
        repetition_penalty: float,
        prompt_tail: Optional[Sequence[int]] = None,
    ) -> None:
        tail = (
            jnp.asarray(np.asarray(prompt_tail, np.int32))
            if prompt_tail is not None and len(prompt_tail) > 0
            else None
        )
        self.state = replace(
            self.state,
            sampling=self.state.sampling.set_slot(
                slot,
                temperature=temperature,
                top_k=top_k,
                top_p=top_p,
                min_p=min_p,
                repetition_penalty=repetition_penalty,
                prompt_tail=tail,
            ),
        )

    def release_slot(self, slot: int) -> None:
        self.state = replace(
            self.state, active=self.state.active.at[slot].set(False)
        )

    def resume_slot(
        self, slot: int, position: int, current_token: int
    ) -> None:
        """Reactivate a slot whose KV is already in the pool (cache hits,
        preemption resume with intact blocks)."""
        st = self.state
        self.state = replace(
            st,
            positions=st.positions.at[slot].set(position),
            current_tokens=st.current_tokens.at[slot].set(current_token),
            active=st.active.at[slot].set(True),
        )
