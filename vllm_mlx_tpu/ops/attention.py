# SPDX-License-Identifier: Apache-2.0
"""Paged-KV attention ops.

TPU-native replacement for the reference's per-request ``KVCache``
objects that are merged/extracted each step (reference
mllm_batch_generator.py:1628-1641, scheduler.py:1984-2138). Here the KV
cache is one preallocated HBM pool per model:

    kv_pool: [num_layers, 2, num_blocks, block_size, num_kv_heads, head_dim]

Sequences own *block tables* (rows of block indices into the pool); admit
and evict are host-side integer bookkeeping, never tensor reshapes, so
the decode step compiles exactly once.

This module holds the XLA gather-based implementation which runs on any
backend (CPU tests, TPU fallback). The Pallas TPU kernel in
``ops.paged_attention_pallas`` implements the same contract without
materializing the gathered context.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def make_kv_pool(
    num_layers: int,
    num_blocks: int,
    block_size: int,
    num_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> jax.Array:
    return jnp.zeros(
        (num_layers, 2, num_blocks, block_size, num_kv_heads, head_dim), dtype=dtype
    )


def write_kv(
    kv_pool: jax.Array,
    layer: int,
    k: jax.Array,
    v: jax.Array,
    block_table: jax.Array,
    positions: jax.Array,
) -> jax.Array:
    """Scatter new K/V rows for one layer into the pool.

    k, v: [T, num_kv_heads, head_dim] — new keys/values.
    block_table: [max_blocks] block ids owned by this sequence.
    positions: [T] absolute token positions (define the slot in the table).

    Works for prefill chunks (T tokens of one sequence) — for batched
    decode use :func:`write_kv_batch`. Positions past the end of the
    block table (bucket padding on a nearly-full sequence) are routed to
    the reserved scratch block 0 instead of clamping onto a real block.
    """
    block_size = kv_pool.shape[3]
    slot_idx = positions // block_size
    in_range = slot_idx < block_table.shape[0]
    block_idx = jnp.where(
        in_range,
        jnp.take(block_table, jnp.clip(slot_idx, 0, block_table.shape[0] - 1)),
        0,
    )
    offset = positions % block_size
    kv_pool = kv_pool.at[layer, 0, block_idx, offset].set(k.astype(kv_pool.dtype))
    kv_pool = kv_pool.at[layer, 1, block_idx, offset].set(v.astype(kv_pool.dtype))
    return kv_pool


def write_kv_batch(
    kv_pool: jax.Array,
    layer: int,
    k: jax.Array,
    v: jax.Array,
    block_tables: jax.Array,
    positions: jax.Array,
) -> jax.Array:
    """Batched decode scatter: one new token per slot.

    k, v: [S, num_kv_heads, head_dim]; block_tables: [S, max_blocks];
    positions: [S] absolute positions of the new token per slot.
    Inactive slots should pass position pointing at a dedicated scratch
    block (block 0 is reserved by the engine for this).
    """
    block_size = kv_pool.shape[3]
    rows = jnp.arange(block_tables.shape[0])
    slot_idx = positions // block_size
    in_range = slot_idx < block_tables.shape[1]
    block_idx = jnp.where(
        in_range,
        block_tables[rows, jnp.clip(slot_idx, 0, block_tables.shape[1] - 1)],
        0,
    )
    offset = positions % block_size
    kv_pool = kv_pool.at[layer, 0, block_idx, offset].set(k.astype(kv_pool.dtype))
    kv_pool = kv_pool.at[layer, 1, block_idx, offset].set(v.astype(kv_pool.dtype))
    return kv_pool


def _grouped_attention(
    q: jax.Array,  # [T, num_heads, head_dim]
    k: jax.Array,  # [M, num_kv_heads, head_dim]
    v: jax.Array,  # [M, num_kv_heads, head_dim]
    mask: jax.Array,  # [T, M] bool, True = attend
    scale: float,
    softcap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,  # [num_heads] learned sink logits
) -> jax.Array:
    t, num_heads, head_dim = q.shape
    m, num_kv_heads, _ = k.shape
    group = num_heads // num_kv_heads
    qg = q.reshape(t, num_kv_heads, group, head_dim)
    scores = jnp.einsum(
        "tkgh,mkh->tkgm", qg, k, preferred_element_type=jnp.float32
    ) * scale
    if softcap is not None:
        scores = softcap * jnp.tanh(scores / softcap)
    scores = jnp.where(mask[:, None, None, :], scores, -jnp.inf)
    if sinks is not None:
        # GPT-OSS attention sinks: a learned per-head logit joins the
        # softmax denominator and its (value-less) probability is
        # dropped (HF modeling_gpt_oss.py eager_attention_forward)
        s = sinks.reshape(num_kv_heads, group).astype(jnp.float32)
        m_val = jnp.maximum(jnp.max(scores, axis=-1), s[None])  # [t,kh,g]
        e = jnp.exp(scores - m_val[..., None])
        e = jnp.where(mask[:, None, None, :], e, 0.0)
        denom = jnp.sum(e, axis=-1) + jnp.exp(s[None] - m_val)
        probs = e / denom[..., None]
    else:
        probs = jax.nn.softmax(scores, axis=-1)
        # Rows with no valid key (inactive slots) produce NaN from
        # softmax(-inf); zero them so they never propagate.
        probs = jnp.where(
            jnp.any(mask, axis=-1)[:, None, None, None], probs, 0.0
        )
    out = jnp.einsum(
        "tkgm,mkh->tkgh", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.reshape(t, num_heads, head_dim).astype(q.dtype)


def paged_attention_prefill(
    q: jax.Array,  # [T, num_heads, head_dim] (one sequence's chunk)
    kv_pool: jax.Array,
    layer: int,
    block_table: jax.Array,  # [max_blocks]
    positions: jax.Array,  # [T] absolute positions of the chunk tokens
    scale: float,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    chunk: Optional[int] = None,
) -> jax.Array:
    """Causal attention of a prefill chunk against the sequence's paged KV.

    The chunk's own K/V must already be written to the pool (write-then-
    attend), so past context and the current chunk are read uniformly.
    """
    block_size = kv_pool.shape[3]
    if chunk is not None and block_table.shape[0] * block_size <= chunk:
        # static bypass (mirrors ragged_attention): the pool's max
        # context fits inside one chunk, so the chunk mask is a no-op
        chunk = None
    k = jnp.take(kv_pool[layer, 0], block_table, axis=0)
    v = jnp.take(kv_pool[layer, 1], block_table, axis=0)
    m = k.shape[0] * block_size
    k = k.reshape(m, *k.shape[2:])
    v = v.reshape(m, *v.shape[2:])
    kv_pos = jnp.arange(m, dtype=positions.dtype)
    mask = kv_pos[None, :] <= positions[:, None]
    if window is not None:
        mask &= kv_pos[None, :] > positions[:, None] - window
    if chunk is not None:
        # Llama 4 chunked attention: same-aligned-chunk keys only
        mask &= kv_pos[None, :] >= (positions - positions % chunk)[:, None]
    return _grouped_attention(q, k, v, mask, scale, softcap)


def paged_attention_decode(
    q: jax.Array,  # [S, num_heads, head_dim] (one new token per slot)
    kv_pool: jax.Array,
    layer: int,
    block_tables: jax.Array,  # [S, max_blocks]
    positions: jax.Array,  # [S] absolute position of the new token per slot
    scale: float,
    window: Optional[int] = None,
    chunk: Optional[int] = None,
) -> jax.Array:
    """Batched decode attention over the paged pool.

    Dispatches to the Pallas flash-decode kernel on TPU (full attention
    layers); the gather-based XLA implementation below is the portable
    fallback (CPU tests, sliding-window layers until the kernel grows
    window support)."""
    if chunk is not None and block_tables.shape[1] * kv_pool.shape[3] <= chunk:
        # static bypass: max context can never cross a chunk boundary
        chunk = None
    if window is None and chunk is None and jax.default_backend() == "tpu":
        from .paged_attention_pallas import paged_attention_decode_tpu

        return paged_attention_decode_tpu(
            q, kv_pool, layer, block_tables, positions + 1, scale
        )
    return _paged_attention_decode_xla(
        q, kv_pool, layer, block_tables, positions, scale, window, chunk
    )


def _paged_attention_decode_xla(
    q: jax.Array,
    kv_pool: jax.Array,
    layer: int,
    block_tables: jax.Array,
    positions: jax.Array,
    scale: float,
    window: Optional[int] = None,
    chunk: Optional[int] = None,
) -> jax.Array:
    """Gather-based decode attention (portable reference path)."""
    k_pool = kv_pool[layer, 0]
    v_pool = kv_pool[layer, 1]
    block_size = kv_pool.shape[3]

    def one_slot(q_i, table_i, pos_i):
        k = jnp.take(k_pool, table_i, axis=0)
        v = jnp.take(v_pool, table_i, axis=0)
        m = k.shape[0] * block_size
        k = k.reshape(m, *k.shape[2:])
        v = v.reshape(m, *v.shape[2:])
        kv_pos = jnp.arange(m, dtype=pos_i.dtype)
        mask = kv_pos <= pos_i
        if window is not None:
            mask &= kv_pos > pos_i - window
        if chunk is not None:
            # Llama 4 chunked attention: same-aligned-chunk keys only
            mask &= kv_pos >= pos_i - pos_i % chunk
        return _grouped_attention(q_i[None], k, v, mask[None], scale)[0]

    return jax.vmap(one_slot)(q, block_tables, positions)


def dense_causal_attention(
    q: jax.Array,  # [T, num_heads, head_dim]
    k: jax.Array,  # [T, num_kv_heads, head_dim]
    v: jax.Array,
    scale: float,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,
    chunk: Optional[int] = None,
) -> jax.Array:
    """Plain causal self-attention (no cache) — used for parity tests and
    single-shot full-sequence forwards. ``chunk`` = Llama 4 chunked
    attention: keys before the query's aligned chunk start are masked."""
    t = q.shape[0]
    pos = jnp.arange(t)
    mask = pos[None, :] <= pos[:, None]
    if window is not None:
        mask &= pos[None, :] > pos[:, None] - window
    if chunk is not None:
        mask &= pos[None, :] >= (pos - pos % chunk)[:, None]
    return _grouped_attention(q, k, v, mask, scale, softcap, sinks=sinks)
